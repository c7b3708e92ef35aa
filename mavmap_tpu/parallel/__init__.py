"""Multi-chip parallelism: device meshes, distributed BA, sharded matching."""

from .dist_ba import partition_problem, dist_bundle_adjust  # noqa: F401
from .dist_match import dist_match_pairs  # noqa: F401

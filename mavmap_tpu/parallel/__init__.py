"""Multi-chip parallelism: device meshes, distributed BA, sharded matching."""

from .dist_ba import partition_problem, dist_bundle_adjust  # noqa: F401
from .dist_match import dist_match_pairs  # noqa: F401
from .multihost import (  # noqa: F401
    init_multihost,
    global_mesh,
    host_local_to_global,
    process_shard_bounds,
)

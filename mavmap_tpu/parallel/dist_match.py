"""Sharded brute-force matching: image pairs distributed over the mesh.

The per-frame critical path of sequential SfM cannot be parallelized away
(frame t needs t-1's map), but batch workloads — exhaustive pair matching
for loop detection, merge candidate search, offline re-matching — are
data-parallel over PAIRS. This module shards a (B, F, D) batch of
descriptor-pair matching jobs across the mesh; each device runs the fused
distance-matrix + 2-NN ratio/cross-check kernel on its slice.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.matching import match_brute_force


def dist_match_pairs(mesh, d1, d2, mask1, mask2, ratio=0.9, axis="obs"):
    """d1, d2: (B, F, D) descriptor batches; masks: (B, F).

    B must be divisible by the mesh size. Returns (matches (B, F) int32,
    valid (B, F) bool), replicated.
    """

    def shard_fn(d1s, d2s, m1s, m2s):
        def one(a, b, ma, mb):
            return match_brute_force(a, b, ma, mb, ratio=ratio)

        return jax.vmap(one)(d1s, d2s, m1s, m2s)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
    )
    return fn(d1, d2, mask1, mask2)

"""Pallas segment-accumulation kernels for bundle adjustment.

The BA normal equations are assembled by segment reductions keyed by image
(U, bc, Schur diagonal, reduced gradient, CG matvec scatter) and by 3-D
point (V, bp, CG matvec reduce, back-substitution). XLA lowers
segment_sum to scatter-adds that run ~200x off bandwidth-bound on TPU
(measured: 21.7 ms for an (200k, 36) image reduction that moves <100 MB).
These kernels replace them with MXU/VPU-native forms; the reference pays
Ceres' CPU sparse solver for the same reductions
(/root/reference/src/base3d/bundle_adjustment.cc:554-569).

Two shapes of reduction:

  seg_accum_full   — one-hot matmul: out[s] = sum_o [seg[o]==s] * contrib[o].
                     The (TILE, S) one-hot lives only in VMEM and feeds the
                     MXU; the (S, K) accumulator stays resident in VMEM
                     across the sequential grid. Ids may be UNSORTED (the
                     by-image reductions need no gather/sort at all).
                     Use when S (number of images) is small: S <= ~4k.

  seg_accum_sorted — banded kernel for large S (points): ids must be
                     SORTED and GAPLESS (every id in [0, max] occurs — the
                     BA problem builder densifies point ids), which bounds
                     any TILE-row window to a TILE-wide id band. Each grid
                     step reduces its tile into a (TILE, K) banded block via
                     a relative one-hot matmul and adds the carry row shared
                     with the previous tile (a segment straddling tiles is
                     complete only in its LAST tile). The caller gathers
                     each segment's total from its last owning tile — a
                     plain XLA gather, no scatter anywhere.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def _round_up(n, q):
    return max(((n + q - 1) // q) * q, q)


# ------------------------------------------------------------- full one-hot


# Widest (SEGT, K) accumulator + (TILE, SEGT) one-hot that fit VMEM
# comfortably; segment counts beyond SEGT tile the segment axis (one extra
# pass over the observations per SEGT segments).
SEGT = 2048


def _full_kernel(seg_ref, c_ref, out_ref):
    s = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:, 0]  # (TILE,)
    St = out_ref.shape[0]
    rel = seg - s * St
    # Rows whose segment lies outside this segment tile produce all-zero
    # one-hot rows and contribute nothing.
    oh = (
        rel[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (seg.shape[0], St), 1)
    ).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        oh,
        c_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def seg_accum_full(contrib, seg_ids, num_segments, *, interpret=False):
    """out[s, :] = sum over o with seg_ids[o]==s of contrib[o, :].

    contrib: (O, K) f32; seg_ids: (O,) int32 in [0, num_segments), ANY
    order. Segment counts beyond SEGT tile the segment axis (grid
    (ceil(S/SEGT), O/TILE)), so ANY number of segments stays on the
    MXU one-hot path — at the cost of one pass over the observations per
    SEGT segments.
    """
    contrib = contrib.astype(jnp.float32)
    seg_ids = seg_ids.astype(jnp.int32)
    O, K = contrib.shape
    Opad = _round_up(O, TILE)
    if Opad != O:
        # Zero contributions land on segment 0 — harmless.
        contrib = jnp.pad(contrib, ((0, Opad - O), (0, 0)))
        seg_ids = jnp.pad(seg_ids, (0, Opad - O))
    St = min(_round_up(num_segments, 8), SEGT)
    n_seg_tiles = -(-_round_up(num_segments, 8) // St)
    out = pl.pallas_call(
        _full_kernel,
        grid=(n_seg_tiles, Opad // TILE),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda s, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, K), lambda s, o: (o, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((St, K), lambda s, o: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg_tiles * St, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_seg_tiles * Opad * St * K,
            bytes_accessed=(n_seg_tiles * Opad * (K + 1)
                            + n_seg_tiles * St * K) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg_ids[:, None], contrib)
    return out[:num_segments]


# ------------------------------------------------------- banded sorted ids


def _sorted_kernel(base_ref, seg_ref, c_ref, out_ref, carry_ref, cseg_ref):
    # bases (num_tiles,) whole-array SMEM; seg (TILE,1), contrib (TILE,K)
    # VMEM; out block (1, TILE, K) VMEM at tile t; scratch: carry (1,K)
    # VMEM + carry's segment id (1,) SMEM.
    t = pl.program_id(0)
    base = base_ref[t]
    seg = seg_ref[:, 0]
    B = seg.shape[0]  # == TILE: gapless sorted ids span < TILE per tile
    rel = seg - base
    oh = (
        rel[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    ).astype(jnp.float32)
    local = jax.lax.dot_general(
        oh,
        c_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, K) banded sums relative to `base`
    # A segment straddling the tile boundary is completed here: fold in the
    # previous tile's partial sum for it (row 0 == id `base`).
    carry_in = jnp.where(
        (t > 0) & (cseg_ref[0] == base), carry_ref[0, :], 0.0
    )
    row0 = jax.lax.broadcasted_iota(jnp.int32, local.shape, 0) == 0
    out_ref[0] = local + jnp.where(row0, carry_in[None, :], 0.0)
    # Stash this tile's (possibly partial) last-segment row for the next.
    last_seg = seg_ref[B - 1, 0]
    carry_ref[0, :] = out_ref[0, pl.ds(last_seg - base, 1), :][0, :]
    cseg_ref[0] = last_seg


def gather_rows_for_sorted(seg_ids_np, num_segments):
    """Host-side: per-segment row into the kernel's flat (num_tiles*TILE)
    banded output; -1 for segments with no observations. Precompute once
    per problem so the per-call epilogue is a single gather (a device
    searchsorted inside a CG while_loop costs ~5 ms/iteration)."""
    import numpy as np

    O = len(seg_ids_np)
    Opad = _round_up(O, TILE)
    ids = np.concatenate(
        [seg_ids_np, np.full(Opad - O, seg_ids_np[-1] if O else 0,
                             seg_ids_np.dtype if O else np.int32)]
    )
    bases = ids[::TILE]
    s = np.arange(num_segments)
    tile_idx = np.clip(np.searchsorted(bases, s, side="right") - 1, 0,
                       len(bases) - 1)
    rel = s - bases[tile_idx]
    ok = (s <= (ids[-1] if O else -1)) & (rel >= 0) & (rel < TILE)
    rows = np.where(ok, tile_idx * TILE + rel, -1)
    return rows.astype(np.int32)


def seg_accum_sorted(contrib, seg_ids, num_segments, *, gather_rows=None,
                     interpret=False):
    """Segment sum for SORTED, GAPLESS ids (large num_segments).

    contrib: (O, K) f32; seg_ids: (O,) int32 sorted ascending with every id
    in [0, seg_ids[-1]] present (gapless — guarantees a TILE-row window
    spans < TILE distinct ids). Returns (num_segments, K) f32; ids beyond
    seg_ids[-1] are zero. Pass `gather_rows` (from gather_rows_for_sorted)
    to skip the per-call searchsorted epilogue.

    The kernel emits per-tile banded sums with a carry chain; segment s is
    complete in the LAST tile whose base is <= s, recovered by one gather.
    """
    contrib = contrib.astype(jnp.float32)
    seg_ids = seg_ids.astype(jnp.int32)
    O, K = contrib.shape
    Opad = _round_up(O, TILE)
    if Opad != O:
        # Repeat the LAST id so the tail stays sorted (zero contributions).
        contrib = jnp.pad(contrib, ((0, Opad - O), (0, 0)))
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.broadcast_to(seg_ids[-1], (Opad - O,))]
        )
    num_tiles = Opad // TILE
    bases = seg_ids[::TILE]

    local = pl.pallas_call(
        _sorted_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, K), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Opad * TILE * K,
            bytes_accessed=(Opad * (K + 1) + Opad * K) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bases, seg_ids[:, None], contrib)

    # Segment s's total lives in its last owning tile at row s - base.
    if gather_rows is None:
        s_ids = jnp.arange(num_segments, dtype=jnp.int32)
        tile_idx = (
            jnp.searchsorted(bases, s_ids, side="right").astype(jnp.int32) - 1
        )
        tile_idx = jnp.clip(tile_idx, 0, num_tiles - 1)
        rel = s_ids - bases[tile_idx]
        ok = (s_ids <= seg_ids[-1]) & (rel >= 0) & (rel < TILE)
        gather_rows = jnp.where(ok, tile_idx * TILE + rel, -1)
    ok = gather_rows >= 0
    rows = jnp.clip(gather_rows, 0, num_tiles * TILE - 1)
    flat = local.reshape(num_tiles * TILE, K)
    return jnp.where(ok[:, None], flat[rows], 0.0)

"""Pallas block-sparse-row (BSR) semiring SpMV — the flagship TPU kernel.

TPU-first re-design of the reference's blocked/chunked OpenCL schedule family
(`awrg-alcl-fdp-chunk-rsa-8`, `swrg-slcl-sdp-chunk-128` —
example/kernel6.json, example/kernel7.json). Instead of chunking ragged rows
inside a thread hierarchy, the matrix is tiled into dense (bm, bn) blocks at
nonzero block positions:

- tile values live densely in HBM and stream through VMEM one grid step per
  tile (Mosaic double-buffers the block DMA automatically);
- the per-tile *column* ids are scalar-prefetched
  (``pltpu.PrefetchScalarGridSpec``) and steer the BlockSpec index_map that
  selects which x-block is resident — so the gather that dominates sparse
  SpMV becomes a *prefetched block DMA*, never a per-element gather;
- consecutive tiles of the same block-row map to the same output block,
  which therefore stays resident in VMEM and accumulates with the semiring ⊕
  (zeroed at the first tile of each row via a prefetched start flag);
- every block-row is guaranteed ≥1 tile at build time so all output blocks
  are initialized.

**Slabbing.** Scalar-prefetch arrays live in SMEM, which caps tiles per
kernel launch (~a few thousand). Large matrices are therefore built as S
slabs of exactly (rows_per_slab block-rows, tiles_per_slab tiles) — padded
with ⊕-identity tiles — and executed by a single ``lax.scan`` whose body is
one pallas_call (compiled once, S sequential launches). This is the moral
equivalent of the reference's splitSize/chunkSize schedule axis applied at
the XLA level.

Boolean semirings are carried as int32 on-device (or ≡ max, and ≡ min on
{0,1}) because the VPU has no native bool vregs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats.sparse import COO, bsr_from_coo, fold_duplicates, round_up
from sparseharness_tpu.semiring import Semiring

# tiles per slab cap: 3 int32 scalar-prefetch arrays must fit comfortably in
# SMEM alongside loop state (observed hard failure at 128k tiles = 512KB/array)
DEFAULT_TILES_PER_SLAB = 1024


class BsrOperand(NamedTuple):
    """Slab layout invariant: slab s owns block rows [s·rps, (s+1)·rps) with
    rps = ceil(n_block_rows / S) — dp_bsr re-derives rps from shapes."""

    tiles: jax.Array       # (S, T, bm, bn) dense tiles, pads = carrier zero
    tile_rows: jax.Array   # int32 (S, T) block-row LOCAL to the slab
    tile_cols: jax.Array   # int32 (S, T) GLOBAL block-col of each tile
    row_start: jax.Array   # int32 (S, T) 1 at the first tile of a block-row


def _np_fold_for(sr: Semiring, as_int: bool):
    """NumPy ⊕ mirror for duplicate folding at build time (blocked layouts
    scatter into dense tiles; without folding, duplicates would overwrite
    instead of ⊕-combining like the streaming kernels do)."""
    if as_int:
        return np.maximum  # {0,1} carrier: or ≡ max
    name = getattr(sr.add, "__name__", "")
    return {"add": np.add, "minimum": np.minimum, "maximum": np.maximum}.get(
        name, np.add
    )


def _carrier(sr: Semiring):
    """(dtype, add, mul, reduce, zero, carried_as_int) with bools → int32."""
    if np.dtype(sr.dtype) == np.bool_:
        return jnp.int32, jnp.maximum, jnp.minimum, jnp.max, np.int32(0), True
    return (
        sr.dtype, sr.add, sr.mul, sr.add_reduce,
        np.asarray(sr.zero, np.dtype(sr.dtype)), False,
    )


def build_bsr(
    coo: COO,
    sr: Semiring,
    bm: int = 8,
    bn: int = 128,
    tiles_per_slab: int = DEFAULT_TILES_PER_SLAB,
) -> BsrOperand:
    dtype, _, _, _, zero, as_int = _carrier(sr)
    vals = coo.vals
    if as_int:
        vals = (vals != 0).astype(np.int32)
    folded = fold_duplicates(
        COO(coo.rows, coo.cols, np.asarray(vals), coo.shape),
        _np_fold_for(sr, as_int),
    )
    if folded.nnz:
        # refuse pathological scatter (≈1 nnz per dense tile) before any
        # large allocation; see pallas_bsr_ell._guard_tile_blowup
        c_blocks = max((folded.shape[1] + bn - 1) // bn, 1)
        ntiles = len(np.unique(
            (folded.rows // bm).astype(np.int64) * c_blocks
            + folded.cols // bn
        ))
        tile_bytes = ntiles * bm * bn * 4
        if tile_bytes > max(32 * folded.nnz * 8, 1 << 30):
            raise NotImplementedError(
                f"BSR tile blowup: {tile_bytes / 1e9:.1f} GB of tiles for "
                f"{folded.nnz} nonzeros; use ell/coo_seg or reorder ('rcm')"
            )
    bsr = bsr_from_coo(folded, bm, bn, zero=zero)
    n_block_rows = bsr.padded_shape[0] // bm

    tiles, rows, cols = bsr.tiles, bsr.tile_rows, bsr.tile_cols
    # guarantee ≥1 tile per block-row so every output block is written
    present = np.zeros(n_block_rows, dtype=bool)
    present[rows] = True
    missing = np.nonzero(~present)[0].astype(np.int32)
    if len(missing):
        pad_tiles = np.full((len(missing), bm, bn), zero, dtype=tiles.dtype)
        tiles = np.concatenate([tiles, pad_tiles])
        rows = np.concatenate([rows, missing])
        cols = np.concatenate([cols, np.zeros(len(missing), np.int32)])
        order = np.argsort(rows, kind="stable")
        tiles, rows, cols = tiles[order], rows[order], cols[order]

    # ---- slab partition: consecutive block rows, equal tile budget -----
    counts = np.bincount(rows, minlength=n_block_rows)
    t_slab = max(tiles_per_slab, int(counts.max()))
    # greedy pack rows into slabs of ≤ t_slab tiles, then use the max row
    # span as the uniform rows_per_slab (re-packed to uniform row ranges)
    rows_per_slab = n_block_rows
    cum = np.concatenate([[0], np.cumsum(counts)])
    if cum[-1] > t_slab:
        # largest row count r such that every window of r rows ≤ t_slab
        rows_per_slab = 1
        lo, hi = 1, n_block_rows
        while lo <= hi:
            mid = (lo + hi) // 2
            win = cum[mid:] - cum[:-mid]
            if win.max() <= t_slab:
                rows_per_slab = mid
                lo = mid + 1
            else:
                hi = mid - 1
    # re-balance to the fixpoint of rps = ceil(nbr/S), S = ceil(nbr/rps) so
    # dp_bsr can re-derive rps from the slab count alone (shrinking rps
    # keeps every slab within the tile budget)
    n_slabs = -(-n_block_rows // rows_per_slab)
    while True:
        rows_per_slab = -(-n_block_rows // n_slabs)
        s2 = -(-n_block_rows // rows_per_slab)
        if s2 == n_slabs:
            break
        n_slabs = s2
    # actual tile budget = max tiles in any slab (≤ t_slab), padded mult 8
    slab_tiles = max(
        int(
            max(
                cum[min((s + 1) * rows_per_slab, n_block_rows)]
                - cum[min(s * rows_per_slab, n_block_rows)]
                for s in range(n_slabs)
            )
        ),
        1,
    )
    slab_tiles = round_up(slab_tiles, 8)

    s_tiles = np.full((n_slabs, slab_tiles, bm, bn), zero, dtype=tiles.dtype)
    s_rows = np.zeros((n_slabs, slab_tiles), np.int32)
    s_cols = np.zeros((n_slabs, slab_tiles), np.int32)
    s_start = np.zeros((n_slabs, slab_tiles), np.int32)
    for s in range(n_slabs):
        r0 = s * rows_per_slab
        r1 = min(r0 + rows_per_slab, n_block_rows)
        a, b = cum[r0], cum[r1]
        k = b - a
        s_tiles[s, :k] = tiles[a:b]
        local = rows[a:b] - r0
        s_rows[s, :k] = local
        s_cols[s, :k] = cols[a:b]
        s_start[s, 0] = 1
        if k > 1:
            s_start[s, 1:k] = (local[1:] != local[:-1]).astype(np.int32)
        if k < slab_tiles:
            # padding tiles accumulate ⊕-identity into the last real row
            # (start=0 ⇒ no re-zeroing); empty slabs target local row 0
            last = local[-1] if k > 0 else 0
            s_rows[s, k:] = last
            if k == 0:
                s_start[s, 0] = 1  # still zero-init the block

    return BsrOperand(
        tiles=jnp.asarray(s_tiles, dtype=dtype),
        tile_rows=jnp.asarray(s_rows),
        tile_cols=jnp.asarray(s_cols),
        row_start=jnp.asarray(s_start),
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _zero_scalar(dtype, zero):
    return jnp.asarray(zero, dtype)


def dp_bsr(op: BsrOperand, x: jax.Array, sr: Semiring, *,
           n_rows: int) -> jax.Array:
    """Semiring dot-products through the slab-scanned Pallas tile sweep.

    Returns dp over the padded row space (n_slabs · rows_per_slab · bm ≥
    n_rows); callers slice. rows_per_slab is recovered from the static
    shapes: ceil(n_block_rows / n_slabs) rounded so S·rps covers n_rows."""
    S, T, bm, bn = op.tiles.shape
    n_block_rows = round_up(max(n_rows, 1), bm) // bm
    rows_per_slab = -(-n_block_rows // S)
    c = x.shape[0]
    c_pad = round_up(max(c, 1), bn)
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(x.astype(sr.dtype), (0, c_pad - c), constant_values=zero)

    dtype, add, mul, reduce_, czero, as_int = _carrier(sr)
    x3d = x_pad.reshape(-1, 1, bn)
    if as_int:
        x3d = x3d.astype(jnp.int32)

    def kernel(rows_ref, cols_ref, starts_ref, tile_ref, x_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(starts_ref[t] == 1)
        def _():
            out_ref[...] = jnp.full_like(out_ref, _zero_scalar(dtype, czero))

        contrib = reduce_(mul(x_ref[0], tile_ref[0]), axis=1)  # (bm,)
        out_ref[0, 0, :] = add(out_ref[0, 0, :], contrib)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda t, rows, cols, starts: (t, 0, 0)),
            pl.BlockSpec((1, 1, bn), lambda t, rows, cols, starts: (cols[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bm), lambda t, rows, cols, starts: (rows[t], 0, 0)
        ),
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_per_slab, 1, bm), x3d.dtype),
        interpret=_interpret(),
    )

    if S == 1:
        out = call(op.tile_rows[0], op.tile_cols[0], op.row_start[0],
                   op.tiles[0], x3d)
        dp = out.reshape(-1)
    else:
        def body(_, slab):
            rows, cols, starts, tiles = slab
            return None, call(rows, cols, starts, tiles, x3d)

        _, outs = jax.lax.scan(
            body, None,
            (op.tile_rows, op.tile_cols, op.row_start, op.tiles),
        )
        dp = outs.reshape(-1)
    if as_int:
        dp = dp > 0
    return dp

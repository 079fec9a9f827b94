"""Gen-2 Pallas BSR kernel: ELL-of-tiles, streaming, no scalar prefetch.

Lesson from the gen-1 kernel (pallas_bsr.py): one-tile-per-grid-step is
per-step-overhead bound (~µs/step ⇒ ~1 Gnnz/s at 131k tiles), and
scalar-prefetch index arrays cap out against SMEM. This kernel removes both
bottlenecks with a layout change — the same move the reference's kernel
corpus makes when it switches from per-row scheduling to fixed
splitSize/chunkSize schedules (example/kernel3.json, kernel6.json):

- **ELL-of-tiles**: each block-row is padded to K tiles (K = max tiles per
  block-row), giving a dense (R_blocks, K, bm, bn) operand. No row
  pointers, no start flags, no revisit accumulation — each grid step owns
  ``rg`` whole block-rows outright.
- **Pre-gathered x blocks**: ``x_tiles[r, k] = x2d[tile_cols[r, k]]`` is one
  XLA row-gather (major-dim gather with full 128-lane rows — the layout TPU
  gathers fast), done outside the kernel. The kernel then streams two dense
  arrays and writes one; Mosaic double-buffers the block DMAs.
- Per-step work is ``rg·K·bm·bn`` elements (auto-sized to ~512 KB of VMEM),
  amortizing grid-step overhead ~100×.

Trade-off: rows whose tile count ≪ K pay padding (the ELL occupancy story);
power-law matrices should use coo_seg or gen-1. Best for banded/blocked/
uniform-degree structure — which is exactly where tiles are dense.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from sparseharness_tpu.formats.sparse import COO, bsr_from_coo, fold_duplicates, round_up
from sparseharness_tpu.semiring import Semiring
from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret, _np_fold_for

# target VMEM footprint per grid step for the tiles block (before double
# buffering). r5 chip sweep on the 33.5M-nnz random-block workload:
# 512 KB → 88.6 Gnnz/s, 1 MB → 94.1, 2 MB → 94.7, 4 MB → 97.3 — bigger
# steps amortize per-step overhead, and (unlike bsr_fused) no VMEM is
# reserved for a resident x, so 4 MB double-buffered still fits. The
# 512-row cap in _rows_per_step bounds the row padding this costs tiny
# matrices.
_TARGET_STEP_BYTES = 4 * 1024 * 1024


class BsrEllOperand(NamedTuple):
    """Strip layout: block-row r is a dense (bm, K·bn) strip whose k-th
    bn-slice is the tile at block-col tile_cols[r, k]. 3D keeps Mosaic on
    single-minor-axis reductions (the 4D (rg,K,bm,bn) double-reduce form
    trips a Mosaic relayout bug)."""

    tiles: jax.Array      # (R_blocks, bm, K*bn); pads = carrier zero
    tile_cols: jax.Array  # int32 (R_blocks, K) global block-col; pads = 0


def _rows_per_step(k: int, bm: int, bn: int, itemsize: int = 4) -> int:
    rg = _TARGET_STEP_BYTES // max(k * bm * bn * itemsize, 1)
    return int(max(8, min(512, round_up(max(rg, 1), 8))))


#: padded-tile bytes may exceed the raw nnz bytes by at most this factor
#: (beyond it, the layout is pathological for the matrix — scattered
#: structure with huge K — and the build refuses so variant="auto" falls
#: through to an index-based layout instead of OOMing the host)
MAX_PAD_BLOWUP = 32
_MIN_GUARD_BYTES = 1 << 30  # never refuse operands under 1 GiB


def _guard_tile_blowup(folded: COO, bm: int, bn: int) -> None:
    """Estimate the padded ELL-of-tiles footprint from distinct (block-row,
    block-col) pairs BEFORE materializing any tile array."""
    if folded.nnz == 0:
        return
    c_blocks = max(round_up(folded.shape[1], bn) // bn, 1)
    keys = (folded.rows // bm).astype(np.int64) * c_blocks + folded.cols // bn
    keys = np.unique(keys)
    n_block_rows = round_up(folded.shape[0], bm) // bm
    counts = np.bincount((keys // c_blocks).astype(np.int64),
                         minlength=n_block_rows)
    k = int(counts.max())
    padded_bytes = n_block_rows * k * bm * bn * 4
    nnz_bytes = folded.nnz * 8  # value + index, the raw-COO floor
    if padded_bytes > max(MAX_PAD_BLOWUP * nnz_bytes, _MIN_GUARD_BYTES):
        raise NotImplementedError(
            f"ELL-of-tiles padding blowup: {padded_bytes / 1e9:.1f} GB of "
            f"tiles for {nnz_bytes / 1e9:.2f} GB of nonzeros (K={k}); "
            "structure too scattered for blocked layouts — use ell/coo_seg "
            "or reorder ('rcm') first"
        )


def build_bsr_ell(coo: COO, sr: Semiring, bm: int = 8, bn: int = 128,
                  value_dtype: str = "float32") -> BsrEllOperand:
    dtype, _, _, _, zero, as_int = _carrier(sr)
    vals = coo.vals
    if as_int:
        vals = (vals != 0).astype(np.int32)
    folded = fold_duplicates(
        COO(coo.rows, coo.cols, np.asarray(vals), coo.shape),
        _np_fold_for(sr, as_int),
    )
    _guard_tile_blowup(folded, bm, bn)
    bsr = bsr_from_coo(folded, bm, bn, zero=zero)
    n_block_rows = bsr.padded_shape[0] // bm
    counts = np.bincount(bsr.tile_rows, minlength=n_block_rows)
    k = max(int(counts.max()), 1)
    # clamp the step to the matrix: without this, the 4 MB step target
    # would pad a 143-block-row matrix to 512 rows of identity tiles
    rg = min(_rows_per_step(k, bm, bn), round_up(n_block_rows, 8))
    r_pad = round_up(n_block_rows, rg)

    tiles = np.full((r_pad, k, bm, bn), zero, dtype=bsr.tiles.dtype)
    cols = np.zeros((r_pad, k), np.int32)
    # scatter tiles into their (row, slot) position
    order = np.argsort(bsr.tile_rows, kind="stable")
    t_rows = bsr.tile_rows[order]
    t_cols = bsr.tile_cols[order]
    t_tiles = bsr.tiles[order]
    starts = np.zeros(n_block_rows + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(t_rows), dtype=np.int64) - starts[t_rows]
    tiles[t_rows, slot] = t_tiles
    cols[t_rows, slot] = t_cols
    # (R, K, bm, bn) → strip (R, bm, K·bn): slice k at [:, :, k*bn:(k+1)*bn]
    strips = np.ascontiguousarray(
        tiles.transpose(0, 2, 1, 3).reshape(r_pad, bm, k * bn)
    )
    store_dtype = dtype
    if value_dtype == "bfloat16" and not as_int and np.issubdtype(
        np.dtype(sr.dtype), np.floating
    ):
        store_dtype = jnp.bfloat16
    return BsrEllOperand(
        tiles=jnp.asarray(strips, dtype=store_dtype),
        tile_cols=jnp.asarray(cols),
    )


def dp_bsr_ell(op: BsrEllOperand, x: jax.Array, sr: Semiring, *,
               n_rows: int) -> jax.Array:
    """dp over the padded row space (R_blocks·bm ≥ n_rows); caller slices."""
    r_blocks, bm, kbn = op.tiles.shape
    k = op.tile_cols.shape[1]
    bn = kbn // k
    dtype, add, mul, reduce_, zero, as_int = _carrier(sr)
    c_pad = round_up(max(x.shape[0], 1), bn)
    x_pad = jnp.pad(
        x.astype(sr.dtype), (0, c_pad - x.shape[0]),
        constant_values=jnp.asarray(sr.zero, sr.dtype),
    )
    x2d = x_pad.reshape(-1, bn)
    if as_int:
        x2d = x2d.astype(jnp.int32)
    # one row-gather: rows of x2d are 128-lane aligned, the gather dimension
    # is major — the fast layout for XLA/TPU gather. Result: per-block-row
    # x strip (R_blocks, 1, K·bn) matching the tile strips.
    x_tiles = jnp.take(x2d, op.tile_cols.reshape(-1), axis=0).reshape(
        r_blocks, 1, kbn
    )

    rg = _rows_per_step(k, bm, bn, np.dtype(x2d.dtype).itemsize)
    rg = min(rg, r_blocks)
    while r_blocks % rg:
        rg //= 2  # r_blocks is rg-padded at build; guard for foreign shapes
    grid = (r_blocks // rg,)

    upcast = op.tiles.dtype == jnp.bfloat16

    def kernel(tiles_ref, xt_ref, out_ref):
        t = tiles_ref[...]
        if upcast:
            t = t.astype(jnp.float32)  # bf16 storage, f32 semiring compute
        prod = mul(xt_ref[...], t)               # (rg, bm, K·bn) broadcast
        out_ref[...] = reduce_(prod, axis=-1)    # (rg, bm)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rg, bm, kbn), lambda i: (i, 0, 0)),
            pl.BlockSpec((rg, 1, kbn), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rg, bm), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_blocks, bm), x2d.dtype),
        interpret=_interpret(),
    )(op.tiles if not as_int else op.tiles.astype(jnp.int32), x_tiles)
    dp = out.reshape(-1)
    if as_int:
        dp = dp > 0
    return dp

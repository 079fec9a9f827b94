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

Boolean semirings are carried as int32 on-device (or ≡ max, and ≡ min on
{0,1}) because the VPU has no native bool vregs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats.sparse import COO, bsr_from_coo, round_up
from sparseharness_tpu.semiring import Semiring


class BsrOperand(NamedTuple):
    tiles: jax.Array       # (T, bm, bn) dense tiles, pads = carrier zero
    tile_rows: jax.Array   # int32 (T,) block-row of each tile (sorted)
    tile_cols: jax.Array   # int32 (T,) block-col of each tile
    row_start: jax.Array   # int32 (T,) 1 at the first tile of a block-row


def _carrier(sr: Semiring):
    """(dtype, add, mul, reduce, zero) with bools carried as int32."""
    if np.dtype(sr.dtype) == np.bool_:
        return (
            jnp.int32,
            jnp.maximum,
            jnp.minimum,
            jnp.max,
            np.int32(0),
            True,
        )
    return sr.dtype, sr.add, sr.mul, sr.add_reduce, np.asarray(sr.zero, np.dtype(sr.dtype)), False


def build_bsr(coo: COO, sr: Semiring, bm: int = 8, bn: int = 128) -> BsrOperand:
    dtype, _, _, _, zero, as_int = _carrier(sr)
    vals = coo.vals
    if as_int:
        vals = (vals != 0).astype(np.int32)
    bsr = bsr_from_coo(
        COO(coo.rows, coo.cols, np.asarray(vals), coo.shape), bm, bn, zero=zero
    )
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

    starts = np.ones(len(rows), dtype=np.int32)
    starts[1:] = (rows[1:] != rows[:-1]).astype(np.int32)
    return BsrOperand(
        tiles=jnp.asarray(tiles, dtype=dtype),
        tile_rows=jnp.asarray(rows),
        tile_cols=jnp.asarray(cols),
        row_start=jnp.asarray(starts),
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def dp_bsr(op: BsrOperand, x: jax.Array, sr: Semiring, *,
           n_rows: int) -> jax.Array:
    """Semiring dot-products through the Pallas tile sweep: pad x to
    block-column multiples, run the kernel, return the padded-row dp."""
    _, bm, bn = op.tiles.shape[-3:]
    n_block_rows = round_up(max(n_rows, 1), bm) // bm
    c = x.shape[0]
    c_pad = round_up(max(c, 1), bn)
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(x, (0, c_pad - c), constant_values=zero)
    return bsr_spmv_padded(op, x_pad, n_block_rows=n_block_rows, sr=sr)


def _zero_scalar(dtype, zero):
    return jnp.asarray(zero, dtype)


def bsr_spmv_padded(op: BsrOperand, x_pad: jax.Array, *, n_block_rows: int,
                    sr: Semiring) -> jax.Array:
    """dp over the padded row space: (n_block_rows * bm,).

    x_pad: (C_pad,) with C_pad a multiple of bn, pads = carrier zero.
    """
    dtype, add, mul, reduce_, zero, as_int = _carrier(sr)
    T, bm, bn = op.tiles.shape
    # TPU block rules: the last two dims of every block must be (8k, 128m)
    # or equal to the array dims — so x and out ride as 3D with a unit axis.
    x3d = x_pad.reshape(-1, 1, bn)  # (C_blocks, 1, bn)
    if as_int:
        x3d = x3d.astype(jnp.int32)

    def kernel(rows_ref, cols_ref, starts_ref, tile_ref, x_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(starts_ref[t] == 1)
        def _():
            out_ref[...] = jnp.full_like(out_ref, _zero_scalar(dtype, zero))

        contrib = reduce_(mul(x_ref[0], tile_ref[0]), axis=1)  # (bm,)
        out_ref[0, 0, :] = add(out_ref[0, 0, :], contrib)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, bm, bn), lambda t, rows, cols, starts: (t, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, bn), lambda t, rows, cols, starts: (cols[t], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bm), lambda t, rows, cols, starts: (rows[t], 0, 0)
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows, 1, bm), x3d.dtype),
        interpret=_interpret(),
    )(op.tile_rows, op.tile_cols, op.row_start, op.tiles, x3d)
    dp = out.reshape(-1)
    if as_int:
        dp = dp > 0
    return dp

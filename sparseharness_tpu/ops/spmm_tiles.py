"""Tile-native semiring SpMM over the ELL-of-tiles layout: Y = A ⊗ X.

The reference is SpMV-only (one dense x per solve — inc/kernel_utils.h:36
generates a single x vector). SpMM is the TPU-natural extension: a block of
m right-hand sides amortizes the sparse-matrix stream across tm-wide column
tiles and turns each (bm, bn) tile's work into an MXU contraction. This is
what makes batched multi-source graph solves (sssp/bfs from many roots at
once) pay for themselves on this hardware.

Design (mirrors pallas_bsr_band.spmm_band, generalized to arbitrary
sparsity via scalar-prefetch-steered X block DMAs):

- A rides the gen-2 strip layout (pallas_bsr_ell.BsrEllOperand): block-row
  r is a dense (bm, K·bn) strip, slot k's tile sits at block-col
  tile_cols[r, k].
- X is presented transposed, XT (m_pad, c_pad), so the per-slot X block is
  a (tm, bn) tile with bn minor — lane-aligned DMAs, minor-axis semiring
  reductions (Mosaic trips on middle-axis reductions), and a
  transposed-RHS MXU dot, all from one layout.
- Per grid step (j, r, kc): the strip's Kc-slot slice and Kc
  prefetch-steered X blocks are resident; plus_times contracts them with
  ONE dot_general over the concatenated K·bn axis (lane concat is free);
  other semirings do Kc VPU mul+reduce passes. kc is the innermost grid
  dim so the (bm, tm) output block stays resident and ⊕-accumulates
  across K chunks.
- The scalar-prefetch cols array lives in SMEM, so block-rows are
  slab-scanned exactly like pallas_bsr_fused (≤ COLS_BUDGET indices per
  pallas_call, one compile, lax.scan over slabs).

Traffic model per column-tile j: A streams once (tm× fewer A passes than
mapping SpMV over columns) and each tile pulls its (tm, bn) X block —
total ≈ R·K·bn·4·m X bytes, identical to the per-column gather the SpMV
map pays, minus the m× re-stream of A. Net ≈ (1 + bm·bn/ (bn·tm))
vs (1 + bm) units: ~9× fewer HBM bytes at bm=8, tm≥128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats.sparse import round_up
from sparseharness_tpu.semiring import Semiring
from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret
from sparseharness_tpu.ops.pallas_bsr_ell import BsrEllOperand

COLS_BUDGET = 4096   # int32 scalar-prefetch indices per pallas_call (SMEM)
MAX_KC = 8           # K slots (X block DMAs) resident per grid step


def _plan(r_blocks: int, k: int):
    """(r_s, k_c, k_pad): slab rows, K chunk, padded K."""
    k_c = min(k, MAX_KC)
    k_pad = round_up(k, k_c)
    r_s = max(8, (COLS_BUDGET // k_pad) // 8 * 8)
    r_s = min(r_s, round_up(r_blocks, 8))
    return r_s, k_c, k_pad


def spmm_bsr_ell(
    op: BsrEllOperand,
    x_block: jax.Array,   # (n_cols, m)
    sr: Semiring,
    *,
    n_rows: int,
    tm: int = 256,
) -> jax.Array:
    """⊕-reduced row dot-products for every column: (n_rows, m), un-folded
    (callers apply the α/β fold — ops/jnp_ops.fold_dp broadcasts over 2D)."""
    r_blocks, bm, kbn = op.tiles.shape
    k = op.tile_cols.shape[1]
    bn = kbn // k
    dtype, add, mul, reduce_, czero, as_int = _carrier(sr)

    n_cols, m = x_block.shape
    m_pad = round_up(max(m, 1), 128)
    tm = min(tm, m_pad)
    while m_pad % tm:
        tm -= 128
    c_pad = round_up(max(n_cols, 1), bn)
    zero = jnp.asarray(sr.zero, sr.dtype)
    xt = jnp.pad(
        x_block.astype(sr.dtype).T,
        ((0, m_pad - m), (0, c_pad - n_cols)),
        constant_values=zero,
    )  # (m_pad, c_pad), bn-minor blocks
    if as_int:
        xt = xt.astype(jnp.int32)

    strips = op.tiles if not as_int else op.tiles.astype(jnp.int32)
    upcast = strips.dtype == jnp.bfloat16
    mxu = sr.name == "plus_times" and not as_int and jnp.issubdtype(
        xt.dtype, jnp.floating
    )
    out_dtype = jnp.float32 if mxu else xt.dtype

    r_s, k_c, k_pad = _plan(r_blocks, k)
    pad_fill = jnp.asarray(czero, strips.dtype)
    if k_pad != k:
        strips = jnp.pad(
            strips, ((0, 0), (0, 0), (0, (k_pad - k) * bn)),
            constant_values=pad_fill,
        )
    cols = op.tile_cols
    if k_pad != k:
        cols = jnp.pad(cols, ((0, 0), (0, k_pad - k)))
    r_pad = round_up(r_blocks, r_s)
    if r_pad != r_blocks:
        strips = jnp.pad(
            strips, ((0, r_pad - r_blocks), (0, 0), (0, 0)),
            constant_values=pad_fill,
        )
        cols = jnp.pad(cols, ((0, r_pad - r_blocks), (0, 0)))
    s = r_pad // r_s
    strips = strips.reshape(s, r_s, bm, k_pad * bn)
    cols = cols.reshape(s, r_s * k_pad)

    grid = (m_pad // tm, r_s, k_pad // k_c)
    prec = (
        jax.lax.Precision.DEFAULT if upcast
        else jax.lax.Precision.HIGHEST
    )

    def kernel(cols_ref, strip_ref, *refs):
        xw, out_ref = refs[:-1], refs[-1]
        kc = pl.program_id(2)
        st = strip_ref[0]  # (bm, Kc·bn)
        if upcast:
            st = st.astype(jnp.float32)
        if mxu:
            # one transposed-RHS MXU contraction over the concatenated
            # K·bn axis (Σ_kk tile_kk @ xblk_kk ≡ the concat dot)
            xcat = jnp.concatenate([w[...] for w in xw], axis=-1)
            acc = jax.lax.dot_general(
                st, xcat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (bm, tm)
        else:
            acc = None
            for kk in range(k_c):  # static slots; VPU mul + lane reduce
                w = xw[kk][...]  # (tm, bn)
                part = reduce_(
                    mul(w[None, :, :], st[:, kk * bn:(kk + 1) * bn][:, None, :]),
                    axis=-1,
                )  # (bm, tm)
                acc = part if acc is None else add(acc, part)

        @pl.when(kc == 0)
        def _():
            out_ref[...] = acc

        @pl.when(kc != 0)
        def _():
            out_ref[...] = (out_ref[...] + acc) if mxu else add(out_ref[...], acc)

    def _xmap(kk):
        # X block for slot kc·Kc+kk of block-row r: prefetched global
        # block-col steers the (tm, bn) DMA; index units are blocks
        return lambda j, r, kc, cols: (j, cols[r * k_pad + kc * k_c + kk])

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bm, k_c * bn), lambda j, r, kc, cols: (r, 0, kc))
            ]
            + [pl.BlockSpec((tm, bn), _xmap(kk)) for kk in range(k_c)],
            out_specs=pl.BlockSpec(
                (bm, tm), lambda j, r, kc, cols: (r, j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((r_s * bm, m_pad), out_dtype),
        interpret=_interpret(),
    )

    if s == 1:
        out = call(cols[0], strips[0], *([xt] * k_c))
    else:
        def body(_, slab):
            cs, st = slab
            return None, call(cs, st, *([xt] * k_c))

        _, outs = jax.lax.scan(body, None, (cols, strips))
        out = outs.reshape(s * r_s * bm, m_pad)
    dp = out[:n_rows, :m]
    if as_int:
        dp = dp > 0
    if mxu and dp.dtype != np.dtype(sr.dtype):
        dp = dp.astype(sr.dtype)
    return dp


def ell_operand_from_band(op) -> BsrEllOperand:
    """View a BsrBandOperand as strip tiles with materialized affine
    columns (tile_cols[r, k] = clamp(group(r) + c0) + k), so non-plus_times
    SpMM on banded operands rides the tile kernel instead of a per-column
    SpMV map. Slots clamped past the matrix edge hold ⊕-identity pads, so
    clipping their column into range is harmless."""
    r_rows, bm, kbn = op.strips.shape
    k = op.k_win
    bn = kbn // k
    gs = bn // bm
    c_blocks = round_up(max(op.n_cols, 1), bn) // bn
    base = np.clip(np.arange(r_rows) // gs + op.c0, 0, max(c_blocks - k, 0))
    cols = np.clip(base[:, None] + np.arange(k)[None, :], 0, c_blocks - 1)
    return BsrEllOperand(
        tiles=op.strips, tile_cols=jnp.asarray(cols.astype(np.int32))
    )


def ell_operand_from_fused(op) -> BsrEllOperand:
    """Unstack a BsrFusedOperand's slabs back to the flat strip layout so
    the SpMM kernel can consume operands built for the fused SpMV variant."""
    s, r_s, bm, kbn = op.strips.shape
    k = op.cols.shape[1] // r_s
    return BsrEllOperand(
        tiles=op.strips.reshape(s * r_s, bm, kbn),
        tile_cols=op.cols.reshape(s * r_s, k),
    )

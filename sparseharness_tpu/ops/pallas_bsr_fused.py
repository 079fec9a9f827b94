"""Gen-3 Pallas BSR kernel: fused in-kernel x gather.

Gen-2 (pallas_bsr_ell.py) pays an XLA row-gather plus a full
materialize+re-read of the gathered x strips (~25% extra HBM traffic at
K=2). This kernel fuses the gather: the entire (padded) x vector sits in
VMEM for the duration of the sweep, per-tile block columns are
scalar-prefetched, and each grid step copies its rg·K x-blocks
VMEM→VMEM scratch before one strip multiply-reduce — tiles are then the
*only* large HBM stream, the roofline floor for this format.

Constraints and handling:
- x must fit VMEM: requires padded_cols·4B ≤ ~6 MB (n ≤ ~1.5M f32). The
  registry variant falls back to gen-2 semantics for larger x at build
  time (`build_bsr_fused` raises NotImplementedError).
- scalar-prefetch cols live in SMEM ⇒ rows are slab-scanned with ≤
  SLAB_COLS_BUDGET indices per pallas_call (lax.scan, one compile).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats.sparse import COO, round_up
from sparseharness_tpu.semiring import Semiring
from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret
from sparseharness_tpu.ops import pallas_bsr_ell

SLAB_COLS_BUDGET = 4096     # int32 indices per pallas_call (16 KB SMEM)
MAX_X_VMEM_BYTES = 6 * 1024 * 1024
# strip bytes per grid step. r5 chip sweep on the 33.5M-nnz random-block
# workload: 1 MB → 126 Gnnz/s, 2 MB → 148 (0.724 HBM frac), 4 MB → 136
# (VMEM pressure: 2×4 MB double-buffered strips + x + xt crowd the 16 MB
# budget) — bigger steps amortize the per-step gather/issue overhead that
# the unrolled read loop leaves
_ROWS_PER_STEP_TARGET_BYTES = 2 * 1024 * 1024


class BsrFusedOperand(NamedTuple):
    strips: jax.Array     # (S, R_s, bm, K*bn)
    cols: jax.Array       # int32 (S, R_s*K) block-col per (row, slot)


def build_bsr_fused(coo: COO, sr: Semiring, bm: int = 8, bn: int = 128,
                    value_dtype: str = "float32") -> BsrFusedOperand:
    if round_up(max(coo.shape[1], 1), bn) * 4 > MAX_X_VMEM_BYTES:
        raise NotImplementedError(
            "bsr_fused requires x to fit in VMEM; use bsr_ell for wide matrices"
        )
    base = pallas_bsr_ell.build_bsr_ell(coo, sr, bm, bn, value_dtype)
    r_blocks, _, kbn = base.tiles.shape
    k = base.tile_cols.shape[1]
    bn_ = kbn // k
    strips = np.asarray(base.tiles)
    cols = np.asarray(base.tile_cols)

    r_s = max(8, (SLAB_COLS_BUDGET // k) // 8 * 8)
    r_s = min(r_s, round_up(r_blocks, 8))
    r_pad = round_up(r_blocks, r_s)
    if r_pad != r_blocks:
        pad = r_pad - r_blocks
        fill = np.asarray(_carrier(sr)[4], strips.dtype)
        strips = np.concatenate(
            [strips, np.full((pad,) + strips.shape[1:], fill)]
        )
        cols = np.concatenate([cols, np.zeros((pad, k), np.int32)])
    s = r_pad // r_s
    return BsrFusedOperand(
        strips=jnp.asarray(strips.reshape(s, r_s, bm, kbn)),
        cols=jnp.asarray(cols.reshape(s, r_s * k)),
    )


def dp_bsr_fused(op: BsrFusedOperand, x: jax.Array, sr: Semiring, *,
                 n_rows: int) -> jax.Array:
    s, r_s, bm, kbn = op.strips.shape
    k = op.cols.shape[1] // r_s
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
    strips = op.strips if not as_int else op.strips.astype(jnp.int32)
    upcast = strips.dtype == jnp.bfloat16

    # rg must divide r_s AND stay a multiple of 8 (the gather loop writes
    # 8-row aligned blocks); r_s is 8-aligned by build, so stepping down by
    # 8 always terminates at a valid divisor
    rg = max(8, min(r_s, _ROWS_PER_STEP_TARGET_BYTES // max(bm * kbn * 4, 1) // 8 * 8))
    while r_s % rg:
        rg -= 8
    grid = (r_s // rg,)

    def kernel(cols_ref, strip_ref, x_ref, out_ref, xt_ref):
        step = pl.program_id(0)
        base = step * rg * k

        for kk in range(k):  # static slots
            # r5: FULLY UNROLLED dynamic-row reads composed into ONE
            # aligned (rg, bn) store per slot. The r4 form looped
            # fori(rg//8) with 8-read composed stores; the gather is
            # issue-bound, and unrolling measured 424 → 330 µs/op on the
            # 33.5M-nnz random-block workload (+28%,
            # results/fused_v2_probe_tpu.json; crossbar staging and wide
            # take_along_axis were probed and lost/failed there — the
            # dynamic read is ~9 ns/row, cheaper than a per-way crossbar
            # except under ≤2-chunk locality).
            rows = [
                x_ref[pl.ds(cols_ref[base + r * k + kk], 1), :]
                for r in range(rg)
            ]
            xt_ref[:, kk * bn:(kk + 1) * bn] = jnp.concatenate(rows, axis=0)

        xt = xt_ref[...][:, None, :]                 # (rg, 1, K·bn)
        t = strip_ref[...]
        if upcast:
            t = t.astype(jnp.float32)  # bf16 storage, f32 semiring compute
        out_ref[...] = reduce_(mul(xt, t), axis=-1)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rg, bm, kbn), lambda i, c: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole x2d resident
            ],
            out_specs=pl.BlockSpec((rg, bm), lambda i, c: (i, 0)),
            scratch_shapes=[pltpu.VMEM((rg, kbn), x2d.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((r_s, bm), x2d.dtype),
        interpret=_interpret(),
    )

    if s == 1:
        out = call(op.cols[0], strips[0], x2d)
        dp = out.reshape(-1)
    else:
        def body(_, slab):
            cols, st = slab
            return None, call(cols, st, x2d)

        _, outs = jax.lax.scan(body, None, (op.cols, strips))
        dp = outs.reshape(-1)
    if as_int:
        dp = dp > 0
    return dp

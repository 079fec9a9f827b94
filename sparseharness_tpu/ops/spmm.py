"""Semiring SpMM: Y = A ⊗ X for a block of dense right-hand sides.

The north star names "Pallas SpMV/SpMM kernels" (BASELINE.json); the
reference itself is SpMV-only (inc/kernel_utils.h:36 builds a single x).
Dispatch, best kernel first:

- band operand + plus_times → pallas_bsr_band.spmm_band (pure-streaming
  affine-window MXU kernel; 3.8 TFLOP/s at m∈{128,256} on v5e —
  committed artifact results/spmm_tpu.json, r5);
- strip operands (bsr_ell / bsr_fused) → spmm_tiles.spmm_bsr_ell
  (prefetch-steered X block DMAs; MXU contraction for plus_times, VPU
  mul+reduce for every other semiring — powers batched multi-source
  graph solves);
- anything else → ``lax.map`` of the SpMV kernel over X's columns
  (correct for every variant; A re-streamed per column).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparseharness_tpu.ops import registry
from sparseharness_tpu.ops.jnp_ops import fold_dp
from sparseharness_tpu.semiring import Semiring


def spmm(
    operand,
    x_block: jax.Array,  # (n_cols, m)
    *,
    sr: Semiring,
    variant: str = "bsr_fused",
    n_rows: int,
    alpha=None,
    beta=None,
    y_block: jax.Array = None,  # optional (n_rows, m) for the β fold
) -> jax.Array:
    """Y[:, j] = (α ⊗ (⊕ A ⊗ X[:, j])) ⊕ (β ⊗ Y0[:, j]). Returns (n_rows, m)."""
    from sparseharness_tpu.ops.pallas_bsr_band import BsrBandOperand, spmm_band
    from sparseharness_tpu.ops.pallas_bsr_ell import BsrEllOperand
    from sparseharness_tpu.ops.pallas_bsr_fused import BsrFusedOperand
    from sparseharness_tpu.ops.spmm_tiles import (
        spmm_bsr_ell, ell_operand_from_band, ell_operand_from_fused,
    )

    if (
        isinstance(operand, BsrBandOperand)
        and sr.name == "plus_times"
        and alpha in (None, 1.0)
        and beta in (None, 0.0)
        and y_block is None
    ):
        return spmm_band(operand, x_block, n_rows=n_rows)

    tile_op = None
    if isinstance(operand, BsrEllOperand):
        tile_op = operand
    elif isinstance(operand, BsrFusedOperand):
        tile_op = ell_operand_from_fused(operand)
    elif isinstance(operand, BsrBandOperand):
        # non-plus_times (or folded) band SpMM: affine columns materialize
        # into the tile layout; A still streams once per column tile
        tile_op = ell_operand_from_band(operand)
    if tile_op is not None:
        dp = spmm_bsr_ell(tile_op, x_block, sr, n_rows=n_rows)
        return fold_dp(dp, y_block, sr, alpha, beta)

    def one(col_y):
        col, y = col_y
        return registry.spmv(
            operand, col, y, sr=sr, variant=variant, n_rows=n_rows,
            alpha=alpha, beta=beta,
        )

    cols = jnp.moveaxis(x_block, 1, 0)  # (m, n_cols)
    if y_block is None:
        out = jax.lax.map(lambda c: one((c, None)), cols)
    else:
        out = jax.lax.map(one, (cols, jnp.moveaxis(y_block, 1, 0)))
    return jnp.moveaxis(out, 0, 1)

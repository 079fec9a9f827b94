"""Semiring SpMM: Y = A ⊗ X for a block of dense right-hand sides.

The north star names "Pallas SpMV/SpMM kernels" (BASELINE.json). v1 maps
the SpMV kernel over X's columns with ``lax.map`` — correct for every
semiring/variant, with A re-streamed per column (the honest cost model:
sparse-A SpMM is A-traffic × m/tile_m unless A fits VMEM). A
tile-native SpMM kernel (X col-tiles resident in VMEM, MXU dots per strip)
is the planned round-2 upgrade; this module is the stable API for it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparseharness_tpu.ops import registry
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
) -> jax.Array:
    """Y[:, j] = (α ⊗ (⊕ A ⊗ X[:, j])) for each column j. Returns (n_rows, m).

    plus_times on a band operand takes the tile-native MXU kernel
    (pallas_bsr_band.spmm_band); everything else maps the SpMV kernel over
    columns."""
    from sparseharness_tpu.ops.pallas_bsr_band import BsrBandOperand, spmm_band

    if (
        isinstance(operand, BsrBandOperand)
        and sr.name == "plus_times"
        and alpha in (None, 1.0)
        and beta in (None, 0.0)
    ):
        return spmm_band(operand, x_block, n_rows=n_rows)

    def one(col):
        return registry.spmv(
            operand, col, None, sr=sr, variant=variant, n_rows=n_rows,
            alpha=alpha, beta=beta,
        )

    cols = jnp.moveaxis(x_block, 1, 0)  # (m, n_cols)
    out = jax.lax.map(one, cols)        # (m, n_rows)
    return jnp.moveaxis(out, 0, 1)

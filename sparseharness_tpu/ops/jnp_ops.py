"""XLA-lowered semiring SpMV variants (pure jnp).

These are the TPU re-design of the reference's Lift-generated OpenCL kernel
*families* (example/kernel*.json — see SURVEY §2 'Kernel corpus'):

- ``ell``      ↔ the dense-schedule family (`swrg-slcl-*`): padded rows, one
                gather of x + a lane-wise ⊕-reduction. XLA fuses
                gather→⊗→⊕ into a single bandwidth-bound loop over the
                (rows, width) operand — on TPU this runs on the VPU.
- ``coo_seg``  ↔ the ragged 'rsa' family (`glb-sdp-rsa`): segmented ⊕ over
                row-sorted COO triples, robust to power-law rows (no
                padding blow-up).
- ``dense``    ↔ densified operand on the MXU — only sensible for high
                density or tiny matrices, included for roofline comparison
                (plus_times rides jnp.dot; other semirings broadcast).

Every `apply` is functional and jit-stable: semiring + static shapes are
closed over, operands are NamedTuple pytrees of device arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sparseharness_tpu.formats.sparse import COO, fold_duplicates, round_up
from sparseharness_tpu.semiring import Semiring


class EllOperand(NamedTuple):
    cols: jax.Array  # int32 (R_pad, W_pad), pads point at col 0
    vals: jax.Array  # (R_pad, W_pad), pads = sr.zero


class CooOperand(NamedTuple):
    rows: jax.Array  # int32 (nnz_pad,), row-sorted; pads = R_pad-1
    cols: jax.Array  # int32 (nnz_pad,); pads = 0
    vals: jax.Array  # (nnz_pad,); pads = sr.zero


class DenseOperand(NamedTuple):
    mat: jax.Array  # (R_pad, C_pad) densified, absent = sr.zero


# ---------------------------------------------------------------- builders


def build_ell(coo: COO, sr: Semiring, width_multiple: int = 128,
              row_multiple: int = 8) -> EllOperand:
    ell = coo.to_ell(width_multiple=width_multiple, row_multiple=row_multiple)
    vals = ell.vals_filled(np.asarray(sr.zero, np.dtype(sr.dtype)))
    return EllOperand(
        cols=jnp.asarray(ell.cols),
        vals=jnp.asarray(vals, dtype=sr.dtype),
    )


def build_coo_seg(coo: COO, sr: Semiring, nnz_multiple: int = 1024) -> CooOperand:
    s = coo.sorted_by_row()
    nnz_pad = round_up(max(s.nnz, 1), nnz_multiple)
    pad = nnz_pad - s.nnz
    rows = np.concatenate([s.rows, np.full(pad, coo.shape[0] - 1, np.int32)])
    cols = np.concatenate([s.cols, np.zeros(pad, np.int32)])
    zero = np.asarray(sr.zero, np.dtype(sr.dtype))
    vals = np.concatenate(
        [s.vals.astype(np.dtype(sr.dtype)), np.full(pad, zero)]
    )
    return CooOperand(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals))


def build_dense(coo: COO, sr: Semiring, row_multiple: int = 8,
                col_multiple: int = 128) -> DenseOperand:
    from sparseharness_tpu.ops.pallas_bsr import _np_fold_for

    coo = fold_duplicates(coo, _np_fold_for(sr, False))
    zero = np.asarray(sr.zero, np.dtype(sr.dtype))
    r_pad = round_up(max(coo.shape[0], 1), row_multiple)
    c_pad = round_up(max(coo.shape[1], 1), col_multiple)
    mat = np.full((r_pad, c_pad), zero, dtype=np.dtype(sr.dtype))
    mat[coo.rows, coo.cols] = coo.vals.astype(np.dtype(sr.dtype))
    return DenseOperand(jnp.asarray(mat))


# ---------------------------------------------------------------- applies
#
# All applies compute dp[i] = ⊕_j A[i,j] ⊗ x[j] over the *padded* row space,
# then fold y_out = (α ⊗ dp) ⊕ (β ⊗ y). Callers slice padded → logical rows.


def dp_ell(op: EllOperand, x: jax.Array, sr: Semiring) -> jax.Array:
    contrib = sr.mul(x[op.cols], op.vals)  # (R_pad, W_pad) gather + ⊗
    return sr.add_reduce(contrib, axis=1)


_SEGMENT_REDUCERS = {
    "add": jax.ops.segment_sum,
    "minimum": jax.ops.segment_min,
    "maximum": jax.ops.segment_max,
}


def _segment_reduce_for(sr: Semiring):
    # map the semiring ⊕ onto an XLA segment reduction
    name = getattr(sr.add, "__name__", "")
    if name in _SEGMENT_REDUCERS:
        return _SEGMENT_REDUCERS[name], False
    if sr.add is jnp.logical_or or name == "logical_or":
        return jax.ops.segment_max, True  # bool via int max
    raise NotImplementedError(
        f"no segment reduction for semiring {sr.name!r}; use the ell variant"
    )


def dp_coo_seg(op: CooOperand, x: jax.Array, sr: Semiring, *,
               num_rows: int) -> jax.Array:
    reducer, via_int = _segment_reduce_for(sr)
    contrib = sr.mul(x[op.cols], op.vals)
    if via_int:
        contrib = contrib.astype(jnp.int32)
    dp = reducer(
        contrib, op.rows, num_segments=num_rows, indices_are_sorted=True
    )
    if via_int:
        dp = dp > 0
    # (empty segments come back as the dtype's ±inf/extreme identity; the
    # ⊕-identity clamp inside fold_dp maps them to sr.zero)
    return dp


def dp_dense(op: DenseOperand, x: jax.Array, sr: Semiring) -> jax.Array:
    c_pad = op.mat.shape[1]
    xp = jnp.pad(x, (0, c_pad - x.shape[0]),
                 constant_values=jnp.asarray(sr.zero, sr.dtype))
    if sr.name == "plus_times":
        return jnp.dot(op.mat, xp, preferred_element_type=jnp.float32)
    return sr.add_reduce(sr.mul(xp[None, :], op.mat), axis=1)


def fold_dp(dp, y, sr: Semiring, alpha, beta):
    # Saturate: a ⊕ zero = a, but float min_plus overflows FLT_MAX ⊗-pads to
    # +inf — folding the ⊕-identity back in clamps them to the semiring zero
    # (tropical saturation), making empty/padded rows come out as sr.zero.
    dp = sr.add(dp, jnp.full_like(dp, jnp.asarray(sr.zero, dp.dtype)))
    if alpha is None:
        alpha = sr.one
    if beta is None:
        beta = sr.zero
    if y is None:
        return sr.scale(alpha, dp)
    return sr.fold_axby(alpha, dp, beta, y)

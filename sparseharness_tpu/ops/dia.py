"""DIA (diagonal) semiring SpMV — gather-free by construction.

For matrices whose nonzeros concentrate on few diagonals (banded systems,
stencils, and the reference's own matrix3.mtx which is literally diagonal),
the DIA layout eliminates the gather that dominates sparse SpMV on TPU:

    dp[i] = ⊕_j  vals[j, i] ⊗ x[i + off_j]

Every term is an elementwise ⊗ against a *statically shifted slice* of x —
no indices on the device at all. XLA fuses the D-term reduction tree into
vector code; traffic approaches the vals array itself (the roofline floor).

The diagonal offsets are static (pytree aux data), so each sparsity
structure compiles its own specialized program — the same
structure-specialization the reference gets by generating a kernel per
schedule (example/kernel*.json), done here by the XLA trace instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparseharness_tpu.formats.sparse import COO, fold_duplicates
from sparseharness_tpu.semiring import Semiring

# beyond this many distinct diagonals the format degrades to dense-like
# traffic; builders refuse so sweeps fall back to other variants
MAX_DIAGONALS = 512


@jax.tree_util.register_pytree_node_class
class DiaOperand:
    """vals[j, :] holds diagonal off_j: vals[j, i] = A[i, i + off_j]."""

    def __init__(self, vals: jax.Array, offsets: Tuple[int, ...]):
        self.vals = vals
        self.offsets = tuple(int(o) for o in offsets)

    def tree_flatten(self):
        return (self.vals,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def build_dia(coo: COO, sr: Semiring) -> DiaOperand:
    if coo.shape[0] != coo.shape[1]:
        raise NotImplementedError("dia variant requires a square matrix")
    from sparseharness_tpu.ops.pallas_bsr import _np_fold_for

    coo = fold_duplicates(coo, _np_fold_for(sr, False))
    n = coo.shape[0]
    offs_all = coo.cols.astype(np.int64) - coo.rows.astype(np.int64)
    offsets = np.unique(offs_all)
    if len(offsets) > MAX_DIAGONALS:
        raise NotImplementedError(
            f"{len(offsets)} diagonals exceeds DIA limit {MAX_DIAGONALS}"
        )
    dtype = np.dtype(sr.dtype)
    zero = np.asarray(sr.zero, dtype)
    vals = np.full((max(len(offsets), 1), n), zero, dtype=dtype)
    pos = np.searchsorted(offsets, offs_all)
    vals[pos, coo.rows] = coo.vals.astype(dtype)
    return DiaOperand(jnp.asarray(vals), tuple(offsets.tolist()))


def dp_dia(op: DiaOperand, x: jax.Array, sr: Semiring, *,
           n_rows: int) -> jax.Array:
    n = n_rows
    offs = op.offsets
    span_lo = max(0, -min(offs)) if offs else 0
    span_hi = max(0, max(offs) + 0) if offs else 0
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(
        x.astype(sr.dtype), (span_lo, max(span_hi, 0)), constant_values=zero
    )
    terms = [
        sr.mul(x_pad[span_lo + o: span_lo + o + n], op.vals[j, :n])
        for j, o in enumerate(offs)
    ]
    if not terms:
        return jnp.full((n,), zero)
    # balanced ⊕ tree keeps the fused reduction shallow
    while len(terms) > 1:
        nxt = [
            sr.add(terms[i], terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
        terms = nxt
    return terms[0]

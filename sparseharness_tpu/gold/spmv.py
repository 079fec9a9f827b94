"""NumPy gold semiring SpMV.

Replaces inc/spmv_gold.h. The reference gold has documented quirks (SURVEY
§7): it adds the β·y term once per nonzero, indexes y by the matrix *value*,
and integer-truncates values through the ellpack path
(inc/spmv_gold.h:22-23, src/sparse_matrix.cpp:104-110). This module
implements the *intended* semantics from the reference README (README.md:27-56)::

    y_out[i] = (alpha ⊗ (⊕_j A[i,j] ⊗ x[j])) ⊕ (beta ⊗ y[i])

and additionally provides the quirky variant for documentation/parity tests.
"""

from __future__ import annotations

import numpy as np

from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.semiring import Semiring

# numpy mirrors of each registered semiring's ops, keyed by name
_NP_OPS = {
    "plus_times": (np.add, np.multiply),
    "min_plus": (np.minimum, np.add),
    "or_and": (np.logical_or, np.logical_and),
    "max_min": (np.maximum, np.minimum),
    "max_times": (np.maximum, np.multiply),
}


def _np_ops(sr: Semiring):
    if sr.name == "max_right":
        int_min = np.iinfo(np.int32).min

        def mul(l, r):
            return np.where(r == int_min, r, l)

        return np.maximum, mul
    if sr.name == "min_right":
        int_max = np.iinfo(np.int32).max

        def mul(l, r):
            return np.where(r == int_max, r, l)

        return np.minimum, mul
    return _NP_OPS[sr.name]


def spmv_gold(
    coo: COO,
    x: np.ndarray,
    y: np.ndarray,
    sr: Semiring,
    alpha=None,
    beta=None,
) -> np.ndarray:
    """Dense-free scalar-loop-free gold: ⊕-scatter per nonzero.

    O(nnz) like the reference gold (inc/spmv_gold.h:17-26) but with the
    intended α/β fold applied once per *row*.
    """
    add, mul = _np_ops(sr)
    if alpha is None:
        alpha = sr.one
    if beta is None:
        beta = sr.zero
    dtype = np.dtype(sr.dtype)
    zero = np.asarray(sr.zero, dtype)
    x = np.asarray(x, dtype)
    y = np.asarray(y, dtype)

    dp = np.full(coo.shape[0], zero, dtype=dtype)
    contrib = mul(x[coo.cols], coo.vals.astype(dtype))
    # fold contributions row-by-row with the semiring ⊕ (np.ufunc.at handles
    # duplicates sequentially, unlike fancy assignment)
    if add is np.add:
        np.add.at(dp, coo.rows, contrib)
    elif add is np.minimum:
        np.minimum.at(dp, coo.rows, contrib)
    elif add is np.maximum:
        np.maximum.at(dp, coo.rows, contrib)
    elif add is np.logical_or:
        np.logical_or.at(dp, coo.rows, contrib)
    else:  # generic fallback
        for r, c in zip(coo.rows, contrib):
            dp[r] = add(dp[r], c)

    left = dp if _eq(alpha, sr.one) else mul(np.asarray(alpha, dtype), dp)
    if _eq(beta, sr.zero):
        out = left
    else:
        out = add(left, mul(np.asarray(beta, dtype), y))
    return np.asarray(out, dtype)


def _eq(a, b) -> bool:
    return bool(np.asarray(a) == np.asarray(b))


def spmv_abs_bound(coo: COO, x: np.ndarray) -> np.ndarray:
    """Per-row Σ_j |A[i,j]·x[j]| — the backward-error scale for float
    SpMV. Reassociation of an f32 sum can perturb the result by
    O(eps·Σ|contrib|); rows with heavy cancellation (e.g. admittance
    matrices × a constant vector, where row sums are ≈0) are only
    comparable against this scale, not against |result|."""
    bound = np.zeros(coo.shape[0], dtype=np.float64)
    np.add.at(
        bound, coo.rows,
        np.abs(coo.vals.astype(np.float64) * np.asarray(x, np.float64)[coo.cols]),
    )
    return bound


def spmv_gold_reference_quirk(
    coo: COO, x: np.ndarray, y: np.ndarray, alpha: float, beta: float, zero: float
) -> np.ndarray:
    """Bit-for-bit model of the reference's quirky Gold<T>::spmv
    (inc/spmv_gold.h:9-28): per-nonzero ``acc += alpha*(x[col]*val) +
    beta*y[val]``, values integer-truncated by the ellpack path, and the
    matrix effectively transposed (rows keyed on the file's second
    coordinate). Kept for parity documentation/tests only."""
    ell_rows = coo.cols  # reference rows = second stored coordinate
    ell_cols = coo.rows
    vals = coo.vals.astype(np.int32).astype(np.float64)  # int truncation quirk
    out = np.full(coo.shape[1], 0.0, dtype=np.float64)
    n = len(y)
    for r, c, v in zip(ell_rows, ell_cols, vals):
        y_idx = int(v) % n if n else 0
        out[r] += alpha * (float(x[c]) * v) + beta * float(y[y_idx])
    # every row's accumulator is seeded with `zero` (inc/spmv_gold.h:19)
    out = out + zero
    return out.astype(np.float32)

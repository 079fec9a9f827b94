"""ops/spmm: multi-RHS semiring SpMM (column map + MXU band kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparseharness_tpu.formats import banded_coo, random_coo
from sparseharness_tpu.gold import spmv_gold
from sparseharness_tpu.ops import build_operand
from sparseharness_tpu.ops.spmm import spmm
from sparseharness_tpu.semiring import PLUS_TIMES, MIN_PLUS


def _gold_spmm(coo, X, sr):
    cols = [
        spmv_gold(coo, X[:, j], np.full(coo.shape[0], sr.zero, np.float32), sr)
        for j in range(X.shape[1])
    ]
    return np.stack(cols, axis=1)


def test_spmm_band_mxu_matches_gold():
    coo = banded_coo(1024, 7, seed=1)
    rng = np.random.default_rng(0)
    X = rng.uniform(0.1, 1.0, (coo.shape[1], 40)).astype(np.float32)
    gold = _gold_spmm(coo, X, PLUS_TIMES)
    op = build_operand(coo, PLUS_TIMES, "bsr_band")
    out = np.asarray(
        spmm(op, jnp.asarray(X), sr=PLUS_TIMES, variant="bsr_band",
             n_rows=coo.shape[0])
    )
    assert out.shape == gold.shape
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)


def test_spmm_column_map_general():
    coo = random_coo(200, 160, 1200, seed=2)
    rng = np.random.default_rng(1)
    X = rng.uniform(0.1, 1.0, (coo.shape[1], 5)).astype(np.float32)
    for sr, variant in ((PLUS_TIMES, "bsr_fused"), (MIN_PLUS, "ell")):
        gold = _gold_spmm(coo, X, sr)
        op = build_operand(coo, sr, variant)
        out = np.asarray(
            spmm(op, jnp.asarray(X), sr=sr, variant=variant,
                 n_rows=coo.shape[0])
        )
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)


def test_spmm_band_wide_rhs_tiles():
    """m > tm exercises the column-tile grid axis."""
    coo = banded_coo(600, 4, seed=3)
    rng = np.random.default_rng(2)
    X = rng.uniform(0.1, 1.0, (coo.shape[1], 200)).astype(np.float32)
    gold = _gold_spmm(coo, X, PLUS_TIMES)
    op = build_operand(coo, PLUS_TIMES, "bsr_band")
    out = np.asarray(
        spmm(op, jnp.asarray(X), sr=PLUS_TIMES, variant="bsr_band",
             n_rows=coo.shape[0])
    )
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)

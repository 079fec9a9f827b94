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


# ------------------------------------------------- tile-native SpMM kernel


def test_spmm_tile_kernel_all_semirings():
    """spmm_tiles.spmm_bsr_ell (MXU for plus_times, VPU otherwise) matches
    the per-column gold for every semiring on both strip operands."""
    from sparseharness_tpu.semiring import OR_AND, MAX_RIGHT, MAX_MIN

    coo = random_coo(300, 257, 2500, seed=3)
    rng = np.random.default_rng(4)
    for sr in (PLUS_TIMES, MIN_PLUS, MAX_MIN, MAX_RIGHT, OR_AND):
        if np.dtype(sr.dtype) == np.bool_:
            X = rng.uniform(0, 1, (coo.shape[1], 5)) > 0.5
        elif np.issubdtype(np.dtype(sr.dtype), np.integer):
            X = rng.integers(0, 100, (coo.shape[1], 5)).astype(sr.dtype)
        else:
            X = rng.uniform(0.1, 1.0, (coo.shape[1], 5)).astype(sr.dtype)
        y = np.full(coo.shape[0], sr.zero, sr.dtype)
        gold = np.stack(
            [np.asarray(spmv_gold(coo, X[:, j], y, sr)) for j in range(5)],
            axis=1,
        )
        for variant in ("bsr_ell", "bsr_fused"):
            op = build_operand(coo, sr, variant)
            out = np.asarray(
                spmm(op, jnp.asarray(X), sr=sr, variant=variant,
                     n_rows=coo.shape[0])
            )
            if np.dtype(sr.dtype) == np.bool_:
                np.testing.assert_array_equal(out, gold)
            else:
                np.testing.assert_allclose(
                    out.astype(np.float64), gold.astype(np.float64),
                    rtol=1e-4, atol=1e-4,
                )


def test_spmm_tile_kernel_chunked_k():
    """K > MAX_KC exercises the kc grid axis + out-block ⊕ accumulation."""
    coo = random_coo(64, 4096, 6000, seed=5)
    op = build_operand(coo, MIN_PLUS, "bsr_ell")
    assert op.tile_cols.shape[1] > 8  # the point of the test
    rng = np.random.default_rng(6)
    X = rng.uniform(0.1, 1.0, (coo.shape[1], 3)).astype(np.float32)
    out = np.asarray(
        spmm(op, jnp.asarray(X), sr=MIN_PLUS, variant="bsr_ell", n_rows=64)
    )
    gold = _gold_spmm_sr(coo, X, MIN_PLUS)
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)


def test_spmm_tile_kernel_alpha_beta_fold():
    coo = random_coo(100, 100, 700, seed=7)
    rng = np.random.default_rng(8)
    X = rng.uniform(0.1, 1.0, (100, 4)).astype(np.float32)
    Y0 = rng.uniform(0.1, 1.0, (100, 4)).astype(np.float32)
    op = build_operand(coo, PLUS_TIMES, "bsr_ell")
    out = np.asarray(
        spmm(op, jnp.asarray(X), sr=PLUS_TIMES, variant="bsr_ell",
             n_rows=100, alpha=2.0, beta=0.5, y_block=jnp.asarray(Y0))
    )
    base = _gold_spmm_sr(coo, X, PLUS_TIMES)
    np.testing.assert_allclose(out, 2.0 * base + 0.5 * Y0, rtol=1e-4,
                               atol=1e-4)


def _gold_spmm_sr(coo, X, sr):
    y = np.full(coo.shape[0], sr.zero, sr.dtype)
    return np.stack(
        [np.asarray(spmv_gold(coo, X[:, j], y, sr)) for j in range(X.shape[1])],
        axis=1,
    )


# --------------------------------------------------- multi-source solvers


def test_multi_sssp_matches_single_source():
    from sparseharness_tpu.algorithms import multi_sssp, sssp
    from sparseharness_tpu.formats import random_graph_coo

    coo = random_graph_coo(120, 4.0, seed=9)
    roots = [0, 7, 33]
    res = multi_sssp(coo, roots)
    assert res.x.shape == (coo.shape[0], 3)
    for j, r in enumerate(roots):
        single = sssp(coo, r)
        np.testing.assert_allclose(
            np.asarray(res.x[:, j]), np.asarray(single.x), rtol=1e-5
        )


def test_multi_bfs_matches_single_source():
    from sparseharness_tpu.algorithms import multi_bfs, bfs
    from sparseharness_tpu.formats import random_graph_coo

    coo = random_graph_coo(120, 3.0, seed=10)
    roots = [1, 50]
    res = multi_bfs(coo, roots)
    for j, r in enumerate(roots):
        single = bfs(coo, r)
        np.testing.assert_array_equal(
            np.asarray(res.x[:, j]), np.asarray(single.x)
        )
        np.testing.assert_array_equal(
            np.asarray(res.aux[:, j]), np.asarray(single.aux)
        )


def test_multi_sssp_validates_roots():
    coo = random_coo(10, 10, 30, seed=11)
    from sparseharness_tpu.algorithms import multi_sssp

    with pytest.raises(ValueError):
        multi_sssp(coo, [0, 99])
    with pytest.raises(ValueError):
        multi_sssp(coo, [])


@pytest.mark.parametrize("srname", ["min_plus", "or_and", "max_min"])
def test_spmm_band_operand_non_plus_times(srname):
    """Band operands route through the tile SpMM (affine tile_cols) for
    non-plus_times semirings instead of a per-column SpMV map."""
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.gold import spmv_gold
    from sparseharness_tpu.ops import build_operand
    from sparseharness_tpu.semiring import get_semiring

    sr = get_semiring(srname)
    coo = banded_coo(300, 5, seed=51)
    if np.dtype(sr.dtype) == np.bool_:
        coo = coo.with_values((coo.vals != 0).astype(np.bool_))
    else:
        coo = coo.with_values(np.abs(coo.vals).astype(np.float32) + 0.1)
    rng = np.random.default_rng(52)
    m = 9
    if np.dtype(sr.dtype) == np.bool_:
        X = rng.random((coo.shape[1], m)) < 0.3
    else:
        X = rng.uniform(0.1, 1.0, (coo.shape[1], m)).astype(np.float32)
    op = build_operand(coo, sr, "bsr_band")
    out = np.asarray(
        spmm(op, jnp.asarray(X), sr=sr, variant="bsr_band",
             n_rows=coo.shape[0])
    )
    gold = np.stack(
        [spmv_gold(coo, X[:, j], np.full(coo.shape[0], sr.zero, sr.dtype), sr)
         for j in range(m)], axis=1)
    from sparseharness_tpu.gold import check_result, Correctness
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


def test_spmm_band_edge_window_wider_than_matrix():
    """k_win > c_blocks: clipped tile columns must stay in range and pads
    must vanish under the reduction."""
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.gold import spmv_gold, check_result, Correctness
    from sparseharness_tpu.ops import build_operand
    from sparseharness_tpu.semiring import get_semiring

    sr = get_semiring("min_plus")
    coo = banded_coo(96, 40, seed=53)  # one x block, wide-ish window
    coo = coo.with_values(np.abs(coo.vals).astype(np.float32) + 0.1)
    rng = np.random.default_rng(54)
    X = rng.uniform(0.1, 1.0, (coo.shape[1], 3)).astype(np.float32)
    op = build_operand(coo, sr, "bsr_band")
    out = np.asarray(
        spmm(op, jnp.asarray(X), sr=sr, variant="bsr_band",
             n_rows=coo.shape[0])
    )
    gold = np.stack(
        [spmv_gold(coo, X[:, j], np.full(coo.shape[0], sr.zero, np.float32),
                   sr) for j in range(3)], axis=1)
    assert check_result(out, gold, delta=1e-5) is Correctness.CORRECT

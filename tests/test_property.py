"""Property-based tests (hypothesis): format roundtrips and kernel/gold
agreement on arbitrary sparsity patterns."""

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sparseharness_tpu.formats import coo_from_arrays  # noqa: E402
from sparseharness_tpu.gold import spmv_gold, check_result, Correctness  # noqa: E402
from sparseharness_tpu.ops import build_operand, spmv  # noqa: E402
from sparseharness_tpu.semiring import get_semiring  # noqa: E402


@st.composite
def coo_matrices(draw, max_n=64, max_nnz=200):
    n_rows = draw(st.integers(1, max_n))
    n_cols = draw(st.integers(1, max_n))
    nnz = draw(st.integers(0, max_nnz))
    rows = draw(
        st.lists(st.integers(0, n_rows - 1), min_size=nnz, max_size=nnz)
    )
    cols = draw(
        st.lists(st.integers(0, n_cols - 1), min_size=nnz, max_size=nnz)
    )
    vals = draw(
        st.lists(
            st.floats(np.float32(0.01).item(), np.float32(100.0).item(), width=32), min_size=nnz, max_size=nnz
        )
    )
    # dedup (duplicate fold order is ⊕-dependent; builders assume unique)
    seen = {}
    for r, c, v in zip(rows, cols, vals):
        seen[(r, c)] = v
    if seen:
        r, c = zip(*seen.keys())
        v = list(seen.values())
    else:
        r = c = v = []
    return coo_from_arrays(r, c, np.asarray(v, np.float32), (n_rows, n_cols))


@settings(max_examples=25, deadline=None)
@given(coo=coo_matrices(), srname=st.sampled_from(
    ["plus_times", "min_plus", "max_min", "max_times"]))
def test_ell_matches_gold_on_arbitrary_patterns(coo, srname):
    sr = get_semiring(srname)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 1.0, coo.shape[1]).astype(np.float32)
    gold = spmv_gold(coo, x, np.full(coo.shape[0], sr.zero, np.float32), sr)
    op = build_operand(coo, sr, "ell")
    out = np.asarray(
        spmv(op, jnp.asarray(x), None, sr=sr, variant="ell",
             n_rows=coo.shape[0])
    )
    assert check_result(out, gold, delta=1e-3) is Correctness.CORRECT


@settings(max_examples=15, deadline=None)
@given(coo=coo_matrices(max_n=48, max_nnz=120))
def test_bsr_fused_matches_ell(coo):
    """Two independent kernel paths must agree on any pattern."""
    sr = get_semiring("plus_times")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.1, 1.0, coo.shape[1]).astype(np.float32))
    a = np.asarray(
        spmv(build_operand(coo, sr, "ell"), x, None, sr=sr, variant="ell",
             n_rows=coo.shape[0])
    )
    b = np.asarray(
        spmv(build_operand(coo, sr, "bsr_fused"), x, None, sr=sr,
             variant="bsr_fused", n_rows=coo.shape[0])
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@settings(max_examples=20, deadline=None)
@given(coo=coo_matrices(max_n=40, max_nnz=100))
def test_mtx_roundtrip_property(coo, tmp_path_factory):
    from sparseharness_tpu.formats import read_mtx, write_mtx

    p = tmp_path_factory.mktemp("rt") / "m.mtx"
    write_mtx(str(p), coo)
    back = read_mtx(str(p))
    assert back.shape == coo.shape
    np.testing.assert_allclose(
        back.to_dense(), coo.to_dense(), rtol=1e-6, atol=1e-7
    )

"""ops/: every kernel variant × semiring × matrix vs the NumPy gold.

The analogue of the reference's all-kernel sweep test
(scripts/experiments/all_kernel_test.sh: every kernel JSON × oclgrind,
tallying failures) — here it is an actual unit-test matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseharness_tpu.formats import random_coo, power_law_coo, banded_coo
from sparseharness_tpu.gold import spmv_gold, check_result, Correctness
from sparseharness_tpu.ops import build_operand, spmv, Geometry, VARIANTS
from sparseharness_tpu.semiring import REGISTRY, get_semiring

ALL_VARIANTS = sorted(VARIANTS)
ALL_SEMIRINGS = sorted(REGISTRY)


def _xy(sr, coo, seed=0):
    rng = np.random.default_rng(seed)
    dt = np.dtype(sr.dtype)
    if dt == np.bool_:
        x = rng.random(coo.shape[1]) < 0.3
        y = rng.random(coo.shape[0]) < 0.3
    elif np.issubdtype(dt, np.integer):
        x = rng.integers(0, 50, coo.shape[1]).astype(dt)
        y = rng.integers(0, 50, coo.shape[0]).astype(dt)
    else:
        x = rng.uniform(0.1, 1.0, coo.shape[1]).astype(dt)
        y = rng.uniform(0.1, 1.0, coo.shape[0]).astype(dt)
    return x, y


def _matrix_for(sr, seed=0):
    coo = random_coo(173, 211, 900, seed=seed)
    if np.dtype(sr.dtype) == np.bool_:
        return coo.with_values((coo.vals != 0).astype(np.bool_))
    if np.issubdtype(np.dtype(sr.dtype), np.integer):
        return coo.with_values((coo.vals * 50).astype(np.int32))
    return coo


def _supported(variant, sr):
    if variant == "coo_seg" and sr.name not in (
        "plus_times", "min_plus", "or_and", "max_min", "max_times", "max_right"
    ):
        return False
    return True


@pytest.mark.parametrize("variant", ALL_VARIANTS)
@pytest.mark.parametrize("srname", ALL_SEMIRINGS)
def test_variant_matches_gold(variant, srname):
    sr = get_semiring(srname)
    if not _supported(variant, sr):
        pytest.skip(f"{variant} does not support {srname}")
    coo = _matrix_for(sr)
    x, y = _xy(sr, coo)
    gold = spmv_gold(coo, x, y, sr)
    try:
        op = build_operand(coo, sr, variant)
    except NotImplementedError as e:
        pytest.skip(str(e))
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant=variant,
             n_rows=coo.shape[0])
    )
    assert check_result(out, gold, delta=1e-4) in (
        Correctness.CORRECT,
    ), f"max|Δ|={_maxdiff(out, gold)}"


@pytest.mark.parametrize("variant", ALL_VARIANTS)
def test_alpha_beta_fold(variant):
    sr = get_semiring("plus_times")
    coo = _matrix_for(sr, seed=3)
    x, y = _xy(sr, coo, seed=3)
    gold = spmv_gold(coo, x, y, sr, alpha=2.0, beta=3.0)
    try:
        op = build_operand(coo, sr, variant)
    except NotImplementedError as e:
        pytest.skip(str(e))
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant=variant,
             n_rows=coo.shape[0], alpha=2.0, beta=3.0)
    )
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


@pytest.mark.parametrize("variant", ["ell", "coo_seg", "bsr_pallas"])
def test_power_law_matrix(variant):
    sr = get_semiring("plus_times")
    coo = power_law_coo(300, 3000, seed=1)
    x, y = _xy(sr, coo, seed=1)
    gold = spmv_gold(coo, x, y, sr)
    op = build_operand(coo, sr, variant)
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant=variant,
             n_rows=coo.shape[0])
    )
    assert check_result(out, gold, delta=1e-3) is Correctness.CORRECT


@pytest.mark.parametrize("variant", ["ell", "bsr_pallas"])
@pytest.mark.parametrize("geometry", [Geometry(8, 128), Geometry(16, 256)])
def test_geometry_sweep(variant, geometry):
    """The runfile-sweep analogue: results must be identical across launch
    geometries (the reference records correctness per Run — inc/run.h:9)."""
    sr = get_semiring("plus_times")
    coo = banded_coo(200, 3, seed=2)
    x, y = _xy(sr, coo, seed=2)
    gold = spmv_gold(coo, x, y, sr)
    op = build_operand(coo, sr, variant, geometry)
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant=variant,
             n_rows=coo.shape[0])
    )
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


def test_empty_rows_produce_semiring_zero():
    sr = get_semiring("min_plus")
    coo = random_coo(64, 64, 40, seed=4)  # plenty of empty rows
    x, _ = _xy(sr, coo, seed=4)
    gold = spmv_gold(coo, x, np.full(64, sr.zero, np.float32), sr)
    for variant in ("ell", "coo_seg", "bsr_pallas"):
        op = build_operand(coo, sr, variant)
        out = np.asarray(
            spmv(op, jnp.asarray(x), None, sr=sr, variant=variant, n_rows=64)
        )
        empty = np.setdiff1d(np.arange(64), coo.rows)
        assert np.all(out[empty] == np.float32(sr.zero)), variant
        assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT, variant


def test_jit_stability_no_retrace():
    sr = get_semiring("plus_times")
    coo = _matrix_for(sr)
    op = build_operand(coo, sr, "ell")
    calls = {"n": 0}

    @jax.jit
    def f(op, x):
        calls["n"] += 1
        return spmv(op, x, None, sr=sr, variant="ell", n_rows=coo.shape[0])

    x1 = jnp.asarray(np.random.default_rng(0).uniform(size=coo.shape[1]).astype(np.float32))
    x2 = x1 + 1.0
    f(op, x1)
    f(op, x2)
    assert calls["n"] == 1  # one trace, two executions


def _maxdiff(a, b):
    return np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()


@pytest.mark.parametrize("variant", ["bsr_ell", "bsr_fused"])
def test_bfloat16_value_storage(variant):
    """bf16 halves bytes/nnz; semiring compute upcasts to f32."""
    from sparseharness_tpu.formats import banded_coo

    sr = get_semiring("plus_times")
    coo = banded_coo(600, 4, seed=6)
    x, y = _xy(sr, coo, seed=6)
    gold = spmv_gold(coo, x, y, sr)
    op = build_operand(coo, sr, variant, Geometry(8, 128, "bfloat16"))
    import jax.numpy as jnp_

    leaves = jax.tree_util.tree_leaves(op)
    assert any(a.dtype == jnp_.bfloat16 for a in leaves)
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant=variant,
             n_rows=coo.shape[0])
    )
    rel = np.abs(out - gold) / np.maximum(1e-3, np.abs(gold))
    assert rel.max() < 0.02


def test_bsr_fused_awkward_block_row_count():
    """Regression: 1138_bus-shaped matrices (143 block rows → r_s=144) used
    to drive the fused kernel's rows-per-step below 8, breaking the
    8-aligned gather loop."""
    from sparseharness_tpu.formats import read_mtx
    from tests.conftest import reference_matrix_path

    p = reference_matrix_path("matrix.mtx")
    if p is None:
        coo = random_coo(1138, 1138, 4054, seed=0)
    else:
        coo = read_mtx(p)
    sr = get_semiring("plus_times")
    x, y = _xy(sr, coo, seed=0)
    gold = spmv_gold(coo, x, y, sr)
    op = build_operand(coo, sr, "bsr_fused")
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant="bsr_fused",
             n_rows=coo.shape[0])
    )
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


def test_auto_variant_selection():
    from sparseharness_tpu.ops import build_operand_auto
    from sparseharness_tpu.ops.pallas_bsr_band import BsrBandOperand
    from sparseharness_tpu.ops.pallas_bsr_fused import BsrFusedOperand
    from sparseharness_tpu.formats import banded_coo, power_law_coo

    sr = get_semiring("plus_times")
    name, op = build_operand_auto(banded_coo(500, 4, seed=1), sr)
    assert name == "bsr_band" and isinstance(op, BsrBandOperand)
    name, op = build_operand_auto(power_law_coo(2000, 9000, seed=2), sr)
    assert name in ("bsr_band", "bsr_fused")  # small matrices may fit a window

    # 'auto' through the problem builder runs end-to-end
    from sparseharness_tpu.algorithms import make_spmv_problem, spmv_once
    coo = banded_coo(300, 3, seed=3)
    prob = make_spmv_problem(coo, variant="auto", seed=1)
    assert prob.variant == "bsr_band"
    gold = spmv_gold(coo, np.asarray(prob.x0), np.asarray(prob.y), sr)
    out = np.asarray(spmv_once(prob))
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


@pytest.mark.parametrize("srname", ["plus_times", "min_plus", "or_and"])
@pytest.mark.parametrize("make", [
    lambda: banded_coo(500, 4, seed=11),          # k_win = 1
    lambda: banded_coo(1200, 130, seed=12),       # k_win > 1, edge clamping
    lambda: random_coo(96, 700, 400, seed=13),    # wide: window ≪ c_blocks
])
def test_bsr_band_windowed_matches_resident_and_gold(srname, make):
    """The streamed-x path (no VMEM cap) must agree bit-for-bit with the
    resident path and the gold; both paths share the build/operand."""
    from sparseharness_tpu.ops import jnp_ops
    from sparseharness_tpu.ops.pallas_bsr_band import (
        build_bsr_band, dp_bsr_band,
    )

    sr = get_semiring(srname)
    coo = make()
    if np.dtype(sr.dtype) == np.bool_:
        coo = coo.with_values((coo.vals != 0).astype(np.bool_))
    x, y = _xy(sr, coo, seed=14)
    gold = spmv_gold(coo, x, y, sr)
    try:
        op = build_bsr_band(coo, sr)
    except NotImplementedError as e:
        pytest.skip(str(e))
    outs = {}
    for windowed in (False, True):
        dp = dp_bsr_band(
            op, jnp.asarray(x), sr, n_rows=coo.shape[0], windowed=windowed
        )[: coo.shape[0]]
        outs[windowed] = np.asarray(
            jnp_ops.fold_dp(dp, jnp.asarray(y), sr, None, None)
        )
        assert check_result(outs[windowed], gold, delta=1e-4) is (
            Correctness.CORRECT
        ), (srname, windowed)
    np.testing.assert_array_equal(outs[False], outs[True])


@pytest.mark.parametrize("srname", ["plus_times", "min_plus", "or_and"])
def test_bsr_band_windowed_kchunk_accumulation(srname, monkeypatch):
    """Wide windows k-chunk across a second grid axis with out-block
    accumulation (the path a sharded-band max_window override takes when
    one group's full-window strip block would blow scoped VMEM). Forcing
    a tiny per-group byte cap makes n_chunks > 1 on a small matrix."""
    from sparseharness_tpu.ops import jnp_ops, pallas_bsr_band as bb

    monkeypatch.setattr(bb, "_MAX_GROUP_BYTES", 64 * 1024)
    sr = get_semiring(srname)
    coo = banded_coo(1200, 130, seed=12)  # k_win = 5 -> kc = 1, 5 chunks
    if np.dtype(sr.dtype) == np.bool_:
        coo = coo.with_values((coo.vals != 0).astype(np.bool_))
    x, y = _xy(sr, coo, seed=15)
    gold = spmv_gold(coo, x, y, sr)
    op = bb.build_bsr_band(coo, sr)
    dp = bb.dp_bsr_band(
        op, jnp.asarray(x), sr, n_rows=coo.shape[0], windowed=True
    )[: coo.shape[0]]
    out = np.asarray(jnp_ops.fold_dp(dp, jnp.asarray(y), sr, None, None))
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


def test_duplicate_entries_fold_consistently():
    """MatrixMarket allows duplicate coordinates; every variant must
    ⊕-fold them like the gold (blocked builders used to overwrite)."""
    from sparseharness_tpu.formats import coo_from_arrays

    rows = [0, 0, 3, 3, 3, 7]
    cols = [1, 1, 2, 2, 2, 7]
    vals = np.asarray([1.5, 2.5, 1.0, 2.0, 3.0, 4.0], np.float32)
    coo = coo_from_arrays(rows, cols, vals, (9, 9))
    for srname in ("plus_times", "min_plus"):
        sr = get_semiring(srname)
        x, y = _xy(sr, coo, seed=8)
        gold = spmv_gold(coo, x, y, sr)
        for variant in ("ell", "bsr_fused", "bsr_band", "dense"):
            op = build_operand(coo, sr, variant)
            out = np.asarray(
                spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr,
                     variant=variant, n_rows=coo.shape[0])
            )
            assert check_result(out, gold, delta=1e-5) is Correctness.CORRECT, (
                srname, variant)


def test_blocked_builders_refuse_pathological_scatter():
    """A shuffled band (~1 nnz per dense tile) must make the blocked
    builders raise instead of allocating hundreds of GB of padded tiles;
    variant='auto' then lands on the crossbar ragged kernel (sell2), whose
    packed-stream layout has no dense-tile blowup."""
    from sparseharness_tpu.formats import banded_coo, permute_coo
    from sparseharness_tpu.ops import build_operand_auto

    n = 1 << 16
    band = banded_coo(n, 63, seed=31)
    scramble = np.random.default_rng(32).permutation(n).astype(np.int32)
    shuffled = permute_coo(band, scramble)
    sr = get_semiring("plus_times")
    for variant in ("bsr_ell", "bsr_fused", "bsr_pallas"):
        with pytest.raises(NotImplementedError):
            build_operand(shuffled, sr, variant)
    name, _ = build_operand_auto(shuffled, sr)
    assert name == "sell2"


def test_bsr_fused_bfloat16_storage_matches_gold():
    # bf16 value storage on the blocked kernel (half the strip bytes —
    # 204.5 Gnnz/s on chip, r5); compare with a bf16-rounding-scale
    # tolerance against the f32 gold
    import jax.numpy as jnp

    from sparseharness_tpu.formats import block_random_coo
    from sparseharness_tpu.gold import spmv_abs_bound, spmv_gold
    from sparseharness_tpu.ops import Geometry, build_operand, spmv
    from sparseharness_tpu.semiring import PLUS_TIMES

    coo = block_random_coo(1024, blocks_per_row=2, bm=8, bn=128, seed=7)
    geom = Geometry(8, 128, "bfloat16")
    op = build_operand(coo, PLUS_TIMES, "bsr_fused", geom)
    assert op.strips.dtype == jnp.bfloat16
    rng = np.random.default_rng(1)
    x = rng.uniform(0.2, 1.0, coo.shape[1]).astype(np.float32)
    out = np.asarray(spmv(op, jnp.asarray(x), sr=PLUS_TIMES,
                          variant="bsr_fused", n_rows=coo.shape[0]))
    gold = spmv_gold(coo, x, np.zeros(coo.shape[0], np.float32),
                     PLUS_TIMES)
    scale = np.maximum(spmv_abs_bound(coo, x), 1.0)
    assert np.max(np.abs(out - gold) / scale) < 1e-2

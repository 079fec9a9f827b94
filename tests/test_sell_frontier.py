"""Gen-5 ragged kernel (ops/pallas_sell) + frontier exchange (parallel/frontier).

sell: the rsa-family redesign (VERDICT r1 missing #4) — power-law rows with
no padding blow-up, dp in canonical row order, all semirings.
frontier: compressed all_to_all exchange (VERDICT r1 missing #3) — gold
correctness, measured byte saving, budget-overflow fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseharness_tpu.formats import (
    banded_coo, power_law_coo, random_coo, random_graph_coo,
)
from sparseharness_tpu.gold import bfs_reach_gold, spmv_gold, sssp_gold
from sparseharness_tpu.ops import build_operand, spmv
from sparseharness_tpu.ops.pallas_sell import build_sell, dp_sell
from sparseharness_tpu.semiring import REGISTRY, PLUS_TIMES, get_semiring

N_DEV = len(jax.devices())


def _vals_for(sr, coo):
    vals = coo.vals
    if np.dtype(sr.dtype) == np.bool_:
        return coo.with_values(vals != 0)
    if np.issubdtype(np.dtype(sr.dtype), np.integer):
        return coo.with_values(
            (np.abs(vals * 100).astype(np.int32) % 50 + 1).astype(sr.dtype)
        )
    return coo.with_values(np.abs(vals).astype(np.dtype(sr.dtype)) + 0.1)


def _x_for(sr, n, seed=1):
    rng = np.random.default_rng(seed)
    if np.dtype(sr.dtype) == np.bool_:
        return rng.random(n) < 0.3
    if np.issubdtype(np.dtype(sr.dtype), np.integer):
        return rng.integers(0, 100, n).astype(np.dtype(sr.dtype))
    return rng.uniform(0.1, 1.0, n).astype(np.dtype(sr.dtype))


@pytest.mark.parametrize("srname", sorted(REGISTRY))
def test_sell_all_semirings_power_law(srname):
    sr = get_semiring(srname)
    coo = _vals_for(sr, power_law_coo(1500, 9000, seed=4))
    x = _x_for(sr, coo.shape[1])
    op = build_operand(coo, sr, "sell")
    out = np.asarray(
        spmv(op, jnp.asarray(x, sr.dtype), None, sr=sr, variant="sell",
             n_rows=coo.shape[0])
    )
    gold = spmv_gold(
        coo, x, np.full(coo.shape[0], sr.zero, np.dtype(sr.dtype)), sr
    )
    if np.dtype(sr.dtype) == np.bool_ or np.issubdtype(
        np.dtype(sr.dtype), np.integer
    ):
        assert np.array_equal(out, gold)
    else:
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-5)


def test_sell_hub_rows_multilevel():
    """A hub row longer than W_MAX chains through >1 gather-reduce level."""
    rng = np.random.default_rng(0)
    n = 600
    # one row with 400 entries + background
    hub_cols = rng.choice(n, 400, replace=False)
    bg = random_coo(n, n, 2000, seed=2)
    rows = np.concatenate([np.zeros(400, np.int64), bg.rows])
    cols = np.concatenate([hub_cols, bg.cols])
    vals = rng.uniform(0.1, 1.0, len(rows)).astype(np.float32)
    from sparseharness_tpu.formats.sparse import COO

    coo = COO(rows.astype(np.int32), cols.astype(np.int32), vals, (n, n))
    op = build_sell(coo, PLUS_TIMES)
    assert any(len(lay.levels) >= 3 for lay in op.layouts)  # level0+1+final
    x = _x_for(PLUS_TIMES, n)
    dp = np.asarray(dp_sell(op, jnp.asarray(x), PLUS_TIMES, n_rows=n))[:n]
    gold = spmv_gold(coo, x, np.zeros(n, np.float32), PLUS_TIMES)
    np.testing.assert_allclose(dp, gold, rtol=1e-4, atol=1e-5)


def test_sell_multislab():
    """Matrices above the slab capacity split into row slabs."""
    import sparseharness_tpu.ops.pallas_sell as ps

    coo = power_law_coo(2000, 30000, seed=5)
    op = ps.build_sell(coo, PLUS_TIMES, slab_nnz=8000)
    assert len(op.slabs) >= 2
    x = _x_for(PLUS_TIMES, coo.shape[1])
    dp = np.asarray(
        dp_sell(op, jnp.asarray(x), PLUS_TIMES, n_rows=coo.shape[0])
    )[: coo.shape[0]]
    gold = spmv_gold(coo, x, np.zeros(coo.shape[0], np.float32), PLUS_TIMES)
    np.testing.assert_allclose(dp, gold, rtol=1e-4, atol=1e-5)


def test_sell_empty_rows_and_dups():
    from sparseharness_tpu.formats.sparse import COO

    rows = np.array([0, 0, 0, 5, 5], np.int32)   # dup (0,3); rows 1-4 empty
    cols = np.array([3, 3, 7, 1, 200], np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    coo = COO(rows, cols, vals, (300, 300))
    op = build_sell(coo, PLUS_TIMES)
    x = np.arange(300, dtype=np.float32) / 300 + 0.5
    dp = np.asarray(dp_sell(op, jnp.asarray(x), PLUS_TIMES, n_rows=300))[:300]
    gold = spmv_gold(coo, x, np.zeros(300, np.float32), PLUS_TIMES)
    np.testing.assert_allclose(dp, gold, rtol=1e-5)


def test_sell_in_auto_chain_for_power_law():
    from sparseharness_tpu.ops import build_operand_auto
    from sparseharness_tpu.ops.pallas_sell import SellOperand

    # scattered power-law: band/fused refuse (blowup), sell applies
    coo = power_law_coo(4000, 12000, seed=6)
    name, op = build_operand_auto(coo, PLUS_TIMES)
    assert name in ("sell", "bsr_fused")  # structure-dependent; sell eligible
    op2 = build_operand(coo, PLUS_TIMES, "sell")
    assert isinstance(op2, SellOperand)


# ------------------------------------------------------------- frontier


mesh_mark = pytest.mark.skipif(
    N_DEV < 2, reason="needs multi-device backend (see conftest)"
)


@pytest.fixture(scope="module")
def mesh():
    from sparseharness_tpu.parallel import make_mesh

    return make_mesh()


@mesh_mark
def test_frontier_bfs_gold_and_byte_saving(mesh):
    """Large-diameter graph: gold-correct and exchanged bytes ≪ all-gather
    bytes (the north star's frontier exchange, VERDICT r1 missing #3)."""
    from sparseharness_tpu.parallel import frontier_bfs

    g = banded_coo(4096, 2, seed=3)
    res = frontier_bfs(g, root=0, mesh=mesh, budget=512)
    assert np.array_equal(np.asarray(res.x), bfs_reach_gold(g, 0))
    assert res.dense_fallbacks == 0
    assert res.exchanged_bytes() * 100 < res.allgather_bytes(g.shape[0], 4)


@mesh_mark
def test_frontier_bfs_levels_match_single_device(mesh):
    from sparseharness_tpu.algorithms import bfs
    from sparseharness_tpu.parallel import frontier_bfs

    g = random_graph_coo(900, 2.5, seed=9)
    res = frontier_bfs(g, root=3, mesh=mesh, budget=256)
    single = bfs(g, 3)
    assert np.array_equal(np.asarray(res.x), np.asarray(single.x))
    assert np.array_equal(np.asarray(res.aux), np.asarray(single.aux))


@mesh_mark
def test_frontier_sssp_gold(mesh):
    from sparseharness_tpu.parallel import frontier_sssp

    g = random_graph_coo(800, 3.0, seed=11)
    res = frontier_sssp(g, root=0, mesh=mesh, budget=256)
    np.testing.assert_allclose(
        np.asarray(res.x), sssp_gold(g, 0), rtol=1e-5
    )


@mesh_mark
def test_frontier_budget_overflow_falls_back_dense(mesh):
    """A budget far below the frontier forces dense all-gather iterations;
    the result stays correct and the fallback count is reported."""
    from sparseharness_tpu.parallel import frontier_bfs

    g = random_graph_coo(1000, 3.0, seed=12)
    res = frontier_bfs(g, root=0, mesh=mesh, budget=4)
    assert np.array_equal(np.asarray(res.x), bfs_reach_gold(g, 0))
    assert res.dense_fallbacks > 0


@mesh_mark
def test_frontier_dense_phase_switch(mesh):
    """Early oversized frontiers ride the deliberate dense phase (counted
    as dense_phase_iters, not fallbacks); the sticky switch lands sparse
    exchange once every shard's frontier fits the budget and the result
    still matches gold (VERDICT r3 next #4)."""
    from sparseharness_tpu.formats import chained_power_law_coo
    from sparseharness_tpu.parallel import frontier_sssp

    g = chained_power_law_coo(4096, clusters=16, seed=17)
    res = frontier_sssp(g, root=0, mesh=mesh, budget=96)
    assert np.allclose(np.asarray(res.x), sssp_gold(g, 0), rtol=1e-5)
    assert res.dense_phase_iters >= 1
    assert res.iterations > res.dense_phase_iters  # sparse phase reached
    assert res.sent_entries > 0


@mesh_mark
def test_frontier_local_compute_is_sell(mesh):
    """VERDICT r2 weak #2: the frontier path's local compute must be the
    Pallas sell2 kernel (not the scalar-gather ELL dp) whenever the
    structure packs — and both locals must agree with the gold."""
    from sparseharness_tpu.parallel import frontier_bfs, frontier_sssp

    g = power_law_coo(3000, 9000, seed=13)
    res = frontier_bfs(g, root=0, mesh=mesh, budget=512)
    assert res.local == "sell"
    assert np.array_equal(np.asarray(res.x), bfs_reach_gold(g, 0))

    res_ell = frontier_bfs(g, root=0, mesh=mesh, budget=512, local="ell")
    assert res_ell.local == "ell"
    assert np.array_equal(np.asarray(res_ell.x), np.asarray(res.x))

    w = random_graph_coo(1200, 4.0, seed=14)
    res_s = frontier_sssp(w, root=0, mesh=mesh, budget=256, local="sell")
    assert res_s.local == "sell"
    np.testing.assert_allclose(np.asarray(res_s.x), sssp_gold(w, 0),
                               rtol=1e-5)

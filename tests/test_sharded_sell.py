"""parallel/sharded_sell: the sell2-backed sharded mode on the 8-device
CPU mesh — power-law/scattered graphs whose structure the band mode
refuses, solved with Pallas local compute instead of the ELL gather."""

import numpy as np
import jax.numpy as jnp
import pytest

from sparseharness_tpu.formats import power_law_coo, random_graph_coo
from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.gold import spmv_gold
from sparseharness_tpu.gold.algorithms import (
    bfs_levels_gold, bfs_reach_gold, sssp_gold,
)
from sparseharness_tpu.parallel import make_mesh
from sparseharness_tpu.parallel.sharded import sharded_bfs, sharded_sssp
from sparseharness_tpu.parallel.sharded_sell import (
    build_sharded_sell, sharded_spmv_sell,
)
from sparseharness_tpu.semiring import MIN_PLUS, PLUS_TIMES


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_sharded_spmv_sell_matches_gold(mesh):
    coo = power_law_coo(3000, 25_000, alpha=1.5, seed=31)
    rng = np.random.default_rng(32)
    x = rng.uniform(0.1, 1.0, coo.shape[1]).astype(np.float32)
    op, _ = build_sharded_sell(coo, PLUS_TIMES, mesh.devices.size)
    got = np.asarray(
        sharded_spmv_sell(mesh, op, jnp.asarray(x), PLUS_TIMES,
                          n_rows=coo.shape[0])
    )
    want = spmv_gold(coo, x, None, PLUS_TIMES)
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


def test_sharded_sssp_sell_mode(mesh):
    g = random_graph_coo(600, 4.0, seed=33)
    g = g.with_values(np.abs(g.vals) + 0.1)
    res = sharded_sssp(g, root=3, mesh=mesh, mode="sell")
    np.testing.assert_allclose(
        np.asarray(res.x), sssp_gold(g, 3), rtol=1e-5
    )


def test_sharded_bfs_sell_levels(mesh):
    g = random_graph_coo(500, 3.0, seed=34)
    res = sharded_bfs(g, root=0, mesh=mesh, mode="sell")
    np.testing.assert_array_equal(np.asarray(res.x), bfs_reach_gold(g, 0))
    np.testing.assert_array_equal(np.asarray(res.aux), bfs_levels_gold(g, 0))


def test_sell_mode_heavy_row(mesh):
    # a hub row (> SPLIT_T entries) exercises the piece path under SPMD:
    # piece counts differ per shard, padded uniformly
    rng = np.random.default_rng(35)
    n = 2100
    hub_cols = rng.choice(n, 400, replace=False)
    bg = random_graph_coo(n, 2.0, seed=36)
    rows = np.r_[np.full(400, 9), bg.rows].astype(np.int32)
    cols = np.r_[hub_cols, bg.cols].astype(np.int32)
    vals = np.r_[
        rng.uniform(0.1, 1.0, 400).astype(np.float32),
        np.abs(bg.vals) + 0.1,
    ]
    g = COO(rows, cols, vals.astype(np.float32), (n, n))
    res = sharded_sssp(g, root=9, mesh=mesh, mode="sell")
    np.testing.assert_allclose(
        np.asarray(res.x), sssp_gold(g, 9), rtol=1e-5
    )


def test_sell_solver_cached(mesh):
    # repeated calls with the same static config must not retrace
    from sparseharness_tpu.parallel import fixcore

    coo = power_law_coo(1500, 9_000, alpha=1.5, seed=37)
    op, _ = build_sharded_sell(coo, PLUS_TIMES, mesh.devices.size)
    x = np.linspace(0.1, 1.0, coo.shape[1]).astype(np.float32)
    before = len(fixcore._SOLVER_CACHE)
    a = np.asarray(sharded_spmv_sell(mesh, op, jnp.asarray(x), PLUS_TIMES,
                                     n_rows=coo.shape[0]))
    mid = len(fixcore._SOLVER_CACHE)
    b = np.asarray(sharded_spmv_sell(mesh, op, jnp.asarray(x), PLUS_TIMES,
                                     n_rows=coo.shape[0]))
    after = len(fixcore._SOLVER_CACHE)
    assert mid == before + 1 and after == mid
    np.testing.assert_array_equal(a, b)


def test_sharded_sell_virtual_chunks(mesh):
    # wide scattered structure with sub-panel chunk segments per shard:
    # the per-shard builders virtualize light chunks and the union stacks
    # their gather tables (padded shards reference block 0, never read)
    from sparseharness_tpu.ops.pallas_sell2 import CHUNK_COLS

    rng = np.random.default_rng(41)
    n = 60 * CHUNK_COLS          # square: the sharded path shards x by rows
    ch = np.repeat(np.arange(60), 64)
    bk = np.repeat(np.tile(np.arange(4), 60), 16)
    coo = COO(
        rng.integers(0, n, ch.size).astype(np.int32),
        (ch * CHUNK_COLS + bk * 128
         + rng.integers(0, 128, ch.size)).astype(np.int32),
        rng.uniform(0.1, 1.0, ch.size).astype(np.float32),
        (n, n),
    )
    op, _ = build_sharded_sell(coo, PLUS_TIMES, mesh.devices.size)
    assert op.virt_blocks is not None, "virtualization should trigger"
    x = rng.uniform(0.1, 1.0, coo.shape[1]).astype(np.float32)
    got = np.asarray(
        sharded_spmv_sell(mesh, op, jnp.asarray(x), PLUS_TIMES,
                          n_rows=coo.shape[0])
    )
    want = spmv_gold(coo, x, None, PLUS_TIMES)
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)

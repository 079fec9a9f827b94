"""parallel/: SPMD execution on the virtual 8-device CPU mesh.

Multi-host logic is tested the way SURVEY §4 prescribes: CPU backend with
xla_force_host_platform_device_count=8 (set in conftest) — the oclgrind-
style simulated-device story for sharding.
"""

import jax
import numpy as np
import pytest

from sparseharness_tpu.formats import random_graph_coo, random_coo
from sparseharness_tpu.gold import (
    spmv_gold, sssp_gold, bfs_reach_gold, pagerank_gold, eigenvector_gold,
)
from sparseharness_tpu.parallel import (
    make_mesh, build_sharded_ell, sharded_spmv, sharded_sssp, sharded_bfs,
    sharded_pagerank, sharded_eigenvector, auto_sharded_spmv,
)
from sparseharness_tpu.semiring import PLUS_TIMES, MIN_PLUS

N_DEV = len(jax.devices())
pytestmark = pytest.mark.skipif(
    N_DEV < 2, reason="needs multi-device backend (see conftest)"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def graph():
    return random_graph_coo(300, 3.0, seed=11)


def test_mesh_has_8_virtual_devices(mesh):
    assert mesh.devices.size == N_DEV == 8


def test_sharded_ell_partition(graph, mesh):
    op, chunk = build_sharded_ell(graph, PLUS_TIMES, mesh.devices.size)
    d = mesh.devices.size
    assert op.cols.shape[0] == d
    assert op.cols.shape[1] == chunk
    assert d * chunk >= graph.shape[0]
    # total nnz preserved
    assert int((np.asarray(op.vals) != 0).sum()) == int((graph.vals != 0).sum())


def test_sharded_spmv_matches_gold(graph, mesh):
    rng = np.random.default_rng(0)
    x = rng.uniform(0.2, 1.0, graph.shape[1]).astype(np.float32)
    gold = spmv_gold(graph, x, np.zeros(graph.shape[0], np.float32), PLUS_TIMES)
    op, _ = build_sharded_ell(graph, PLUS_TIMES, mesh.devices.size)
    out = np.asarray(
        sharded_spmv(mesh, op, jax.numpy.asarray(x), PLUS_TIMES,
                     n_rows=graph.shape[0])
    )
    np.testing.assert_allclose(out, gold, rtol=1e-5)


def test_sharded_spmv_min_plus(graph, mesh):
    rng = np.random.default_rng(1)
    x = rng.uniform(0.0, 2.0, graph.shape[1]).astype(np.float32)
    gold = spmv_gold(
        graph, x, np.full(graph.shape[0], MIN_PLUS.zero, np.float32), MIN_PLUS
    )
    op, _ = build_sharded_ell(graph, MIN_PLUS, mesh.devices.size)
    out = np.asarray(
        sharded_spmv(mesh, op, jax.numpy.asarray(x), MIN_PLUS,
                     n_rows=graph.shape[0])
    )
    np.testing.assert_allclose(out, gold, rtol=1e-5)


def test_sharded_sssp(graph, mesh):
    res = sharded_sssp(graph, root=0, mesh=mesh)
    gold = sssp_gold(graph, 0)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5)


def test_sharded_bfs(graph, mesh):
    res = sharded_bfs(graph, root=0, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(res.x), bfs_reach_gold(graph, 0)
    )


def test_sharded_pagerank(graph, mesh):
    res = sharded_pagerank(graph, mesh=mesh)
    gold = pagerank_gold(graph)
    assert res.converged
    assert np.abs(np.asarray(res.x) - gold).max() < 1e-4


def test_sharded_eigenvector(mesh):
    coo = random_coo(120, 120, 900, seed=3)
    res = sharded_eigenvector(coo, mesh=mesh)
    gold = eigenvector_gold(coo)
    v = np.asarray(res.x)
    sign = 1.0 if float(np.dot(v, gold)) >= 0 else -1.0
    assert np.abs(sign * v - gold).max() < 1e-3


def test_auto_sharded_spmv(graph, mesh):
    rng = np.random.default_rng(2)
    x = rng.uniform(0.2, 1.0, graph.shape[1]).astype(np.float32)
    gold = spmv_gold(graph, x, np.zeros(graph.shape[0], np.float32), PLUS_TIMES)
    out = np.asarray(auto_sharded_spmv(mesh, graph, PLUS_TIMES, x))
    np.testing.assert_allclose(out, gold, rtol=1e-5)


def test_subset_mesh(graph):
    mesh2 = make_mesh(2)
    res = sharded_sssp(graph, root=0, mesh=mesh2)
    np.testing.assert_allclose(np.asarray(res.x), sssp_gold(graph, 0), rtol=1e-5)


def test_weak_scaling_mechanics():
    """Efficiency numbers are meaningless on a shared-host virtual mesh;
    this validates the machinery (build, shard, chained timing, report)."""
    from sparseharness_tpu.harness.scaling import weak_scaling_spmv, report

    pts = weak_scaling_spmv(base_rows=512, device_counts=[1, 2], inner_iters=1)
    assert len(pts) == 2
    assert pts[0].efficiency == 1.0
    assert pts[1].rows == 2 * pts[0].rows
    assert "efficiency" in report(pts)


def test_halo_fixpoint_sssp_banded(mesh):
    """SSSP over a banded (path-like) graph with halo exchange only."""
    import jax.numpy as jnp
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.parallel import (
        build_sharded_ell_halo, sharded_fixpoint_halo,
    )
    from sparseharness_tpu.semiring import MIN_PLUS

    coo = banded_coo(256, 4, seed=6)
    op, chunk = build_sharded_ell_halo(coo, MIN_PLUS, mesh.devices.size)
    x0 = np.full(256, np.finfo(np.float32).max, np.float32)
    x0[0] = 0.0
    res = sharded_fixpoint_halo(
        mesh, op, x0, MIN_PLUS, n_rows=256,
        combine=lambda x, dp: jnp.minimum(x, dp), exact=True, max_iter=300,
    )
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), sssp_gold(coo, 0), rtol=1e-5)


def test_sharded_mode_auto_picks_halo_for_banded(mesh):
    """mode='auto' must route banded structure onto the O(halo)-ICI
    operand and still match the gold."""
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.parallel.sharded import _build_sharded_auto
    from sparseharness_tpu.parallel.sharded import (
        HaloEll, ShardedEll, sharded_fixpoint, sharded_fixpoint_halo,
    )
    from sparseharness_tpu.semiring import MIN_PLUS as MP

    from sparseharness_tpu.parallel.sharded_band import (
        ShardedBandOperand, sharded_fixpoint_band,
    )

    band = banded_coo(320, 2, seed=21)
    band = band.with_values(np.abs(band.vals) + 0.1)
    # auto prefers the Pallas band operand (roofline local compute)
    op, solver = _build_sharded_auto(band, MP, mesh.devices.size, "auto")
    assert isinstance(op, ShardedBandOperand)
    assert solver is sharded_fixpoint_band
    # forced halo mode still yields the O(halo) ELL pair
    op_h, solver_h = _build_sharded_auto(band, MP, mesh.devices.size, "halo")
    assert isinstance(op_h, HaloEll) and solver_h is sharded_fixpoint_halo
    # scattered graph routes onto the sell2 crossbar operand (Pallas local
    # compute + all-gathered x), not the ELL per-element gather
    from sparseharness_tpu.parallel.sharded_sell import (
        ShardedSellOperand, sharded_fixpoint_sell,
    )

    g = random_graph_coo(300, 3.0, seed=22)
    op2, solver2 = _build_sharded_auto(g, MP, mesh.devices.size, "auto")
    assert isinstance(op2, ShardedSellOperand)
    assert solver2 is sharded_fixpoint_sell
    # forced gather mode still yields the ELL all-gather pair
    op3, solver3 = _build_sharded_auto(g, MP, mesh.devices.size, "gather")
    assert isinstance(op3, ShardedEll) and solver3 is sharded_fixpoint

    res = sharded_sssp(band, root=5, mesh=mesh, mode="halo")
    np.testing.assert_allclose(
        np.asarray(res.x), sssp_gold(band, 5), rtol=1e-5
    )


def test_sharded_reorder_rcm_enables_halo(mesh):
    """A shuffled band is halo-ineligible until RCM recovers the band;
    distances must come back in original numbering either way."""
    from sparseharness_tpu.formats import banded_coo, permute_coo
    from sparseharness_tpu.parallel.sharded import _build_sharded_auto
    from sparseharness_tpu.semiring import MIN_PLUS as MP

    band = banded_coo(320, 2, seed=23)
    band = band.with_values(np.abs(band.vals) + 0.1)
    scramble = np.random.default_rng(24).permutation(320).astype(np.int32)
    shuffled = permute_coo(band, scramble)
    with pytest.raises(ValueError):
        _build_sharded_auto(shuffled, MP, mesh.devices.size, "halo")

    gold = sssp_gold(shuffled, 7)
    for kwargs in ({"reorder": "rcm", "mode": "halo"}, {"reorder": None}):
        res = sharded_sssp(shuffled, root=7, mesh=mesh, **kwargs)
        np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5)


def test_sharded_eigenvector_halo_norm(mesh):
    """Global-psum L2 normalization on the halo path (banded operand)."""
    from sparseharness_tpu.formats import banded_coo

    band = banded_coo(256, 2, seed=25)
    band = band.with_values(np.abs(band.vals) + 0.5)
    res = sharded_eigenvector(band, mesh=mesh, mode="halo", max_iter=300)
    v = np.asarray(res.x)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)
    # Rayleigh residual: ||A v − λ v|| ≪ λ proves v is (near) the dominant
    # eigenvector without requiring the slow banded spectrum to fully settle
    dense = band.to_dense()
    av = dense @ v
    lam = float(v @ av)
    assert lam > 0
    assert np.linalg.norm(av - lam * v) / lam < 5e-3


def test_sharded_fixpoint_checkpointed_resumes(mesh, tmp_path):
    """Chunked sharded solve writes durable progress and resumes from it;
    final distances match the uninterrupted solve."""
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.parallel.sharded import (
        build_sharded_ell, sharded_fixpoint, sharded_fixpoint_checkpointed,
    )
    from sparseharness_tpu.semiring import MIN_PLUS as MP
    import jax.numpy as jnp
    import numpy as np_

    band = banded_coo(160, 2, seed=41)
    band = band.with_values(np.abs(band.vals) + 0.1)
    op, _ = build_sharded_ell(band, MP, mesh.devices.size)
    n = band.shape[0]
    x0 = np_.full(n, np.finfo(np.float32).max, np.float32)
    x0[3] = 0.0
    combine = lambda x, dp: jnp.minimum(x, dp)
    ckpt = str(tmp_path / "solve")

    # run a few chunks, "crash", then resume from the checkpoint
    partial = sharded_fixpoint_checkpointed(
        sharded_fixpoint, mesh, op, x0, MP, n_rows=n, combine=combine,
        ckpt_path=ckpt, every=3, max_iter=6)
    assert not partial.converged and partial.iterations == 6
    resumed = sharded_fixpoint_checkpointed(
        sharded_fixpoint, mesh, op, x0, MP, n_rows=n, combine=combine,
        ckpt_path=ckpt, every=50, max_iter=10_000)
    assert resumed.converged and resumed.iterations > 6

    direct = sharded_fixpoint(
        mesh, op, x0, MP, n_rows=n, combine=combine, exact=True,
        max_iter=10_000)
    np_.testing.assert_array_equal(np_.asarray(resumed.x),
                                   np_.asarray(direct.x))


# ------------------------------------------------- batched multi-source


def test_sharded_multi_sssp_matches_per_root(graph, mesh):
    """Sharded (n, m) SpMM fixpoint == column-stacked single-source golds
    (VERDICT r1 'next #7': --roots × --mesh)."""
    from sparseharness_tpu.parallel import sharded_multi_sssp

    roots = [0, 7, 42]
    res = sharded_multi_sssp(graph, roots, mesh=mesh)
    assert res.x.shape == (graph.shape[0], len(roots))
    gold = np.stack([sssp_gold(graph, r) for r in roots], axis=1)
    np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5)


def test_sharded_multi_bfs_levels_match_single_device(graph, mesh):
    from sparseharness_tpu.algorithms import multi_bfs
    from sparseharness_tpu.parallel import sharded_multi_bfs

    roots = [3, 11]
    res = sharded_multi_bfs(graph, roots, mesh=mesh)
    single = multi_bfs(graph, roots)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(single.x))
    np.testing.assert_array_equal(np.asarray(res.aux), np.asarray(single.aux))
    for j, r in enumerate(roots):
        np.testing.assert_array_equal(
            np.asarray(res.x)[:, j], bfs_reach_gold(graph, r)
        )


def test_sharded_multi_sssp_reorder_rcm(graph, mesh):
    from sparseharness_tpu.parallel import sharded_multi_sssp

    roots = [0, 9]
    res = sharded_multi_sssp(graph, roots, mesh=mesh, reorder="rcm")
    gold = np.stack([sssp_gold(graph, r) for r in roots], axis=1)
    np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5)


def test_sharded_multi_rejects_band_mode(graph, mesh):
    from sparseharness_tpu.parallel import sharded_multi_sssp

    with pytest.raises(NotImplementedError):
        sharded_multi_sssp(graph, [0], mesh=mesh, mode="band")


def test_sharded_multi_tiles_mode_explicit(graph, mesh):
    """mode='tiles' forces the Pallas tile-SpMM local compute (VERDICT r4
    weak #4: batched --roots --mesh previously always ran the XLA
    row-gather ELL); 'gather' forces the ELL path — both match gold."""
    from sparseharness_tpu.parallel import sharded_multi_sssp

    roots = [0, 7, 42]
    gold = np.stack([sssp_gold(graph, r) for r in roots], axis=1)
    for mode in ("tiles", "gather"):
        res = sharded_multi_sssp(graph, roots, mesh=mesh, mode=mode)
        np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5,
                                   err_msg=mode)


def test_sharded_multi_bfs_tiles_levels(graph, mesh):
    from sparseharness_tpu.algorithms import multi_bfs
    from sparseharness_tpu.parallel import sharded_multi_bfs

    roots = [3, 11]
    res = sharded_multi_bfs(graph, roots, mesh=mesh, mode="tiles")
    single = multi_bfs(graph, roots)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(single.x))
    np.testing.assert_array_equal(np.asarray(res.aux),
                                  np.asarray(single.aux))


def test_sharded_multi_rejects_sell_mode(graph, mesh):
    from sparseharness_tpu.parallel import sharded_multi_sssp

    with pytest.raises(NotImplementedError):
        sharded_multi_sssp(graph, [0], mesh=mesh, mode="sell")


def test_auto_spmm_falls_back_on_scattered(mesh):
    """A zipf pattern blows up the tile layout; auto must degrade to the
    ELL paths and still match gold."""
    from sparseharness_tpu.formats import power_law_coo
    from sparseharness_tpu.parallel import sharded_multi_sssp
    from sparseharness_tpu.parallel.sharded_spmm import (
        build_sharded_spmm_tiles,
    )
    from sparseharness_tpu.semiring import MIN_PLUS

    zipf = power_law_coo(50000, 100000, alpha=1.1, seed=4)
    with pytest.raises(NotImplementedError):
        build_sharded_spmm_tiles(zipf, MIN_PLUS, 8)
    roots = [0, 5]
    res = sharded_multi_sssp(zipf, roots, mesh=mesh)  # auto → fallback
    gold = np.stack([sssp_gold(zipf, r) for r in roots], axis=1)
    np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5)

"""algorithms/: graph algorithms vs classical golds, all kernel variants."""

import numpy as np
import pytest

from sparseharness_tpu.algorithms import (
    sssp, bfs, pagerank, eigenvector, make_spmv_problem, spmv_once,
)
from sparseharness_tpu.algorithms.apps import scc as scc_fn
from sparseharness_tpu.formats import read_mtx, random_graph_coo
from sparseharness_tpu.gold import (
    spmv_gold, sssp_gold, bfs_levels_gold, bfs_reach_gold, pagerank_gold,
    eigenvector_gold, check_result, Correctness,
)
from sparseharness_tpu.gold.algorithms import scc_gold
from tests.conftest import reference_matrix_path

VARIANTS = ["ell", "coo_seg", "bsr_pallas"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_sssp_matches_bellman_ford(small_graph, variant):
    res = sssp(small_graph, root=0, variant=variant)
    gold = sssp_gold(small_graph, 0)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), gold, rtol=1e-5)


def test_sssp_unreachable_stays_inf():
    # two disconnected cliques: vertices ≥100 unreachable from 0
    coo = random_graph_coo(100, 2.0, seed=3)
    import numpy as np_
    from sparseharness_tpu.formats.sparse import COO
    off = COO(coo.rows + 100, coo.cols + 100, coo.vals, (200, 200))
    both = COO(
        np_.concatenate([coo.rows, off.rows]),
        np_.concatenate([coo.cols, off.cols]),
        np_.concatenate([coo.vals, off.vals]),
        (200, 200),
    )
    res = sssp(both, root=0)
    x = np.asarray(res.x)
    flt_max = np.float32(np.finfo(np.float32).max)
    assert np.all(x[100:] == flt_max)
    assert x[0] == 0.0


@pytest.mark.parametrize("variant", VARIANTS)
def test_bfs_levels(small_graph, variant):
    res = bfs(small_graph, root=0, variant=variant)
    np.testing.assert_array_equal(np.asarray(res.x), bfs_reach_gold(small_graph, 0))
    np.testing.assert_array_equal(np.asarray(res.aux), bfs_levels_gold(small_graph, 0))


@pytest.mark.parametrize("variant", VARIANTS)
def test_pagerank(small_graph, variant):
    res = pagerank(small_graph, variant=variant)
    gold = pagerank_gold(small_graph)
    assert bool(res.converged)
    assert np.abs(np.asarray(res.x) - gold).max() < 1e-4
    np.testing.assert_allclose(np.asarray(res.x).sum(), 1.0, rtol=1e-3)


@pytest.mark.parametrize("variant", ["ell", "coo_seg"])
def test_scc_partition(small_graph, variant):
    comp, fwd, bwd = scc_fn(small_graph, variant=variant)
    gold = scc_gold(small_graph)

    def canon(labels):
        _, inv = np.unique(labels, return_inverse=True)
        return inv

    np.testing.assert_array_equal(canon(comp), canon(gold))
    assert bool(fwd.converged) and bool(bwd.converged)


def test_eigenvector_on_reference_matrix():
    p = reference_matrix_path("matrix5.mtx")
    if p is None:
        pytest.skip("reference examples not mounted")
    coo = read_mtx(p)
    res, eigval = eigenvector(coo)
    gold = eigenvector_gold(coo)
    v = np.asarray(res.x)
    sign = 1.0 if float(np.dot(v, gold)) >= 0 else -1.0
    assert np.abs(sign * v - gold).max() < 1e-3
    # Rayleigh quotient must satisfy A v ≈ λ v
    assert float(eigval) != 0.0


def test_spmv_once_vs_reference_workload(matrix_mtx):
    prob = make_spmv_problem(matrix_mtx, seed=11)
    out = np.asarray(spmv_once(prob))
    gold = spmv_gold(
        matrix_mtx, np.asarray(prob.x0), np.asarray(prob.y), prob.sr
    )
    assert check_result(out, gold, delta=1e-4) is Correctness.CORRECT


def test_fixpoint_iteration_cap():
    g = random_graph_coo(50, 2.0, seed=5)
    res = sssp(g, root=0, max_iter=1)
    assert int(res.iterations) == 1
    assert not bool(res.converged)


def test_non_square_rejected():
    from sparseharness_tpu.formats import random_coo

    with pytest.raises(ValueError):
        sssp(random_coo(10, 20, 30), root=0)


def test_connected_components_and_widest_path(small_graph):
    import numpy as np_
    from sparseharness_tpu.algorithms import connected_components, widest_path
    from sparseharness_tpu.gold import (
        connected_components_gold, widest_path_gold,
    )

    res = connected_components(small_graph)
    np_.testing.assert_array_equal(
        np_.asarray(res.x), connected_components_gold(small_graph)
    )
    res = widest_path(small_graph, root=0)
    np_.testing.assert_allclose(
        np_.asarray(res.x), widest_path_gold(small_graph, 0), rtol=1e-5
    )


def test_checkpointed_fixpoint_resumes(tmp_path, small_graph):
    """Kill-and-resume: a solve interrupted mid-way continues from the
    checkpoint and reaches the same fixpoint."""
    import numpy as np_
    from sparseharness_tpu.algorithms.apps import fixpoint_components
    from sparseharness_tpu.algorithms.fixpoint import run_fixpoint_checkpointed

    comp = fixpoint_components("sssp", small_graph, root=0)
    ckpt = str(tmp_path / "sssp.npz")
    # phase 1: only 3 iterations allowed → not converged, checkpoint exists
    partial = run_fixpoint_checkpointed(
        comp.step, comp.x0, convergence=comp.convergence, max_iter=3,
        ckpt_path=ckpt, every=3,
    )
    assert not bool(partial.converged)
    import os
    assert os.path.exists(ckpt)
    # phase 2: resume to completion
    full = run_fixpoint_checkpointed(
        comp.step, comp.x0, convergence=comp.convergence,
        max_iter=comp.limit, ckpt_path=ckpt, every=4,
    )
    assert bool(full.converged)
    np_.testing.assert_allclose(
        np_.asarray(full.x), sssp_gold(small_graph, 0), rtol=1e-5
    )
    assert int(full.iterations) > 3  # resumed beyond phase 1

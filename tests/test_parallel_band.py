"""parallel/sharded_band: Pallas band kernels as the sharded local compute.

Validates VERDICT r1's top item: the distributed path's local dp is the
bsr_band pallas kernel (not a per-element XLA gather), the halo exchange is
split into boundary/interior so the two ppermutes can overlap the interior
pallas_call, results are identical to the single-device solvers, and the
solver cache eliminates per-call retracing. Runs on the virtual 8-device
CPU mesh (conftest), pallas in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparseharness_tpu.formats import banded_coo, random_graph_coo
from sparseharness_tpu.gold import (
    spmv_gold, sssp_gold, bfs_reach_gold, pagerank_gold,
)
from sparseharness_tpu.parallel import (
    make_mesh, build_sharded_band, sharded_spmv_band, sharded_fixpoint_band,
    sharded_sssp, sharded_bfs, sharded_pagerank, sharded_scc,
)
from sparseharness_tpu.parallel.sharded_band import _spmv_solver
from sparseharness_tpu.semiring import REGISTRY, PLUS_TIMES, MIN_PLUS

N_DEV = len(jax.devices())
pytestmark = pytest.mark.skipif(
    N_DEV < 2, reason="needs multi-device backend (see conftest)"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def band8k():
    # 8*1024 rows, band 5 → chunk 1024, halo 128: interior range exists,
    # exercising the overlap split (head + interior + tail pallas calls)
    return banded_coo(8 * 1024, 5, seed=0)


def _x_for(sr, n, seed=1):
    rng = np.random.default_rng(seed)
    if np.dtype(sr.dtype) == np.bool_:
        return rng.random(n) < 0.3
    if np.issubdtype(np.dtype(sr.dtype), np.integer):
        return rng.integers(0, 100, n).astype(np.dtype(sr.dtype))
    return rng.uniform(0.1, 1.0, n).astype(np.dtype(sr.dtype))


def test_build_has_interior_split(band8k):
    op, chunk = build_sharded_band(band8k, PLUS_TIMES, 8)
    ng = op.chunk // op.bn
    assert 0 < op.g_lo < op.g_hi < ng  # head + interior + tail all present
    assert op.halo % op.bn == 0 and op.chunk % op.bn == 0


@pytest.mark.parametrize("sr_name", sorted(REGISTRY))
def test_spmv_band_all_semirings_vs_gold(mesh, band8k, sr_name):
    sr = REGISTRY[sr_name]
    coo = band8k
    vals = coo.vals
    if np.issubdtype(np.dtype(sr.dtype), np.integer):
        vals = np.abs(coo.vals * 100).astype(np.int32) % 50 + 1
    elif sr_name == "max_times":
        vals = np.abs(coo.vals) + 0.1
    coo = coo.with_values(vals.astype(np.dtype(sr.dtype))
                          if np.dtype(sr.dtype) != np.bool_ else vals != 0)
    op, _ = build_sharded_band(coo, sr, 8)
    x = _x_for(sr, coo.shape[1])
    y = np.asarray(
        sharded_spmv_band(mesh, op, jnp.asarray(x, sr.dtype), sr,
                          coo.shape[0])
    )
    gold = spmv_gold(
        coo, x, np.full(coo.shape[0], sr.zero, np.dtype(sr.dtype)), sr
    )
    if np.dtype(sr.dtype) == np.bool_:
        assert np.array_equal(y, gold)
    elif np.issubdtype(np.dtype(sr.dtype), np.integer):
        assert np.array_equal(y, gold)
    else:
        np.testing.assert_allclose(y, gold, rtol=1e-5, atol=1e-5)


def test_band_matches_halo_ell_result(mesh, band8k):
    """The overlap-split band dp must agree exactly with the plain halo-ELL
    gather dp (same exchange semantics, different kernels)."""
    from sparseharness_tpu.parallel.sharded import (
        build_sharded_ell_halo, sharded_spmv_halo,
    )

    x = _x_for(PLUS_TIMES, band8k.shape[1])
    op_b, _ = build_sharded_band(band8k, PLUS_TIMES, 8)
    op_h, _ = build_sharded_ell_halo(band8k, PLUS_TIMES, 8)
    y_b = np.asarray(
        sharded_spmv_band(mesh, op_b, jnp.asarray(x), PLUS_TIMES,
                          band8k.shape[0])
    )
    y_h = np.asarray(
        sharded_spmv_halo(mesh, op_h, jnp.asarray(x), PLUS_TIMES,
                          band8k.shape[0])
    )
    np.testing.assert_allclose(y_b, y_h, rtol=1e-6)


def test_solver_cache_no_retrace(mesh, band8k):
    op, _ = build_sharded_band(band8k, PLUS_TIMES, 8)
    s1 = _spmv_solver(mesh, op, PLUS_TIMES)
    s2 = _spmv_solver(mesh, op, PLUS_TIMES)
    assert s1 is s2  # cached closure → jax.jit reuses one trace
    # and repeated end-to-end calls execute without retracing
    x = jnp.asarray(_x_for(PLUS_TIMES, band8k.shape[1]))
    y1 = sharded_spmv_band(mesh, op, x, PLUS_TIMES, band8k.shape[0])
    n_compiles = s1._cache_size()
    y2 = sharded_spmv_band(mesh, op, x + 1.0, PLUS_TIMES, band8k.shape[0])
    assert s1._cache_size() == n_compiles
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))


def test_sharded_sssp_band_mode(mesh):
    g = banded_coo(8 * 512, 3, seed=2)
    res = sharded_sssp(g, root=0, mesh=mesh, mode="band")
    np.testing.assert_allclose(np.asarray(res.x), sssp_gold(g, 0), rtol=1e-5)
    assert res.converged


def test_sharded_bfs_band_levels(mesh):
    """Sharded BFS returns levels aux structurally identical to the
    single-device bfs (VERDICT r1 weak #5)."""
    from sparseharness_tpu.algorithms import bfs

    g = banded_coo(8 * 512, 2, seed=3)
    res = sharded_bfs(g, root=7, mesh=mesh, mode="band")
    gold_reach = bfs_reach_gold(g, 7)
    assert np.array_equal(np.asarray(res.x), gold_reach)
    single = bfs(g, 7)
    assert res.aux is not None
    assert np.array_equal(np.asarray(res.aux), np.asarray(single.aux))


def test_sharded_pagerank_band(mesh):
    g = banded_coo(8 * 256, 4, seed=4)
    res = sharded_pagerank(g, mesh=mesh, mode="band")
    np.testing.assert_allclose(
        np.asarray(res.x), pagerank_gold(g), rtol=1e-4, atol=1e-7
    )


def test_sharded_scc_full_matches_single_device(mesh):
    """Full fwd∧bwd SCC on the mesh == apps.scc canonical component ids
    (VERDICT r1 weak #6: the completed SCC is now reachable sharded)."""
    from sparseharness_tpu.algorithms import scc

    g = random_graph_coo(300, 3.0, seed=5)
    labels_sharded, _, _ = sharded_scc(g, mesh=mesh, mode="gather")
    labels_single, _, _ = scc(g)
    assert np.array_equal(labels_sharded, labels_single)


def test_fixpoint_band_direct(mesh, band8k):
    """Direct solver API: min-plus closure fixpoint on the band operand."""
    from sparseharness_tpu.parallel.sharded import combine_min

    coo = banded_coo(8 * 256, 2, seed=6)
    sr = MIN_PLUS
    op, _ = build_sharded_band(coo, sr, 8)
    n = coo.shape[0]
    x0 = np.full(n, float(np.finfo(np.float32).max), np.float32)
    x0[0] = 0.0
    res = sharded_fixpoint_band(
        mesh, op, x0, sr, n_rows=n, combine=combine_min, exact=True,
        max_iter=n + 1,
    )
    np.testing.assert_allclose(np.asarray(res.x), sssp_gold(coo, 0), rtol=1e-5)


def test_checkpoint_fingerprint_mismatch_refused(tmp_path, mesh):
    """Resuming a checkpoint written for a different problem raises instead
    of silently truncating (ADVICE r1 #1); the checkpoint is removed on
    convergence."""
    import os

    from sparseharness_tpu.parallel.sharded import (
        build_sharded_ell, combine_min, sharded_fixpoint,
        sharded_fixpoint_checkpointed,
    )

    g = random_graph_coo(160, 3.0, seed=7)
    sr = MIN_PLUS
    op, _ = build_sharded_ell(g, sr, 8)
    n = g.shape[0]
    x0 = np.full(n, float(np.finfo(np.float32).max), np.float32)
    x0[0] = 0.0
    ckpt = str(tmp_path / "solve.npz")
    res = sharded_fixpoint_checkpointed(
        sharded_fixpoint, mesh, op, x0, sr, n_rows=n, combine=combine_min,
        ckpt_path=ckpt, every=2, max_iter=n + 1,
    )
    assert res.converged
    assert not os.path.exists(ckpt)  # removed once converged

    # interrupted solve leaves a resumable checkpoint...
    sharded_fixpoint_checkpointed(
        sharded_fixpoint, mesh, op, x0, sr, n_rows=n, combine=combine_min,
        ckpt_path=ckpt, every=1, max_iter=1,
    )
    assert os.path.exists(ckpt)
    # ...which a different root refuses to resume
    x0_other = x0.copy()
    x0_other[0], x0_other[5] = sr.zero, 0.0
    with pytest.raises(ValueError, match="different problem"):
        sharded_fixpoint_checkpointed(
            sharded_fixpoint, mesh, op, x0_other, sr, n_rows=n,
            combine=combine_min, ckpt_path=ckpt, every=1, max_iter=2,
        )


def test_without_overlap_split_matches(mesh, band8k):
    """The A/B foil (single full-window call per iteration) must compute
    exactly the same fixpoint as the overlap-split operand."""
    from sparseharness_tpu.parallel.sharded_band import without_overlap_split
    from sparseharness_tpu.parallel.sharded import combine_min

    op, _ = build_sharded_band(band8k, MIN_PLUS, 8)
    op_b = without_overlap_split(op)
    assert op_b.g_lo == op_b.g_hi == 0
    assert op_b.strips_head.shape[1] == op_b.strips_int.shape[1] == 0
    n = band8k.shape[0]
    x0 = np.full(n, np.finfo(np.float32).max, np.float32)
    x0[0] = 0.0
    ra = sharded_fixpoint_band(mesh, op, x0, MIN_PLUS, n_rows=n,
                               combine=combine_min, max_iter=12)
    rb = sharded_fixpoint_band(mesh, op_b, x0, MIN_PLUS, n_rows=n,
                               combine=combine_min, max_iter=12)
    assert np.array_equal(np.asarray(ra.x), np.asarray(rb.x))
    assert ra.iterations == rb.iterations

"""formats/reorder.py: RCM bandwidth reduction + reordered solves.

New capability beyond the reference (SURVEY has no reordering): a symmetric
permutation must (a) reduce bandwidth enough to route shuffled banded
structure back onto the bsr_band fast kernel, and (b) leave every
algorithm's answer unchanged in the original vertex numbering.
"""

import numpy as np
import pytest

from sparseharness_tpu.formats import (
    banded_coo, bandwidth, coo_from_arrays, inverse_permutation,
    permute_coo, random_coo, rcm_permutation, reorder_rcm,
)
from sparseharness_tpu.gold import spmv_gold
from sparseharness_tpu.semiring import PLUS_TIMES


def _shuffled_banded(n, band, seed=0):
    """A banded matrix hidden behind a random relabeling."""
    coo = banded_coo(n, band, seed=seed)
    rng = np.random.default_rng(seed + 1)
    scramble = rng.permutation(n).astype(np.int32)
    return permute_coo(coo, scramble), coo


def test_rcm_is_a_permutation_and_reduces_bandwidth():
    shuffled, original = _shuffled_banded(400, 3, seed=0)
    assert bandwidth(shuffled) > 10 * bandwidth(original)
    perm = rcm_permutation(shuffled)
    assert sorted(perm.tolist()) == list(range(400))
    reordered = permute_coo(shuffled, perm)
    # RCM should recover near-original bandwidth on a hidden band
    assert bandwidth(reordered) <= 4 * bandwidth(original)


def test_permute_coo_spmv_equivalence():
    coo = random_coo(120, 120, 600, seed=1)
    perm = rcm_permutation(coo)
    inv = inverse_permutation(perm)
    pcoo = permute_coo(coo, perm)
    rng = np.random.default_rng(2)
    x = rng.uniform(0.1, 1.0, 120).astype(np.float32)
    y_direct = spmv_gold(coo, x, np.zeros(120, np.float32), PLUS_TIMES)
    y_perm = spmv_gold(pcoo, x[perm], np.zeros(120, np.float32), PLUS_TIMES)
    np.testing.assert_allclose(y_perm[inv], y_direct, rtol=1e-6)


def test_rcm_handles_isolated_nodes_and_duplicates():
    rows = [0, 0, 5, 6]
    cols = [5, 5, 0, 6]  # dup edge + self loop; nodes 1-4,7 isolated
    coo = coo_from_arrays(rows, cols, np.ones(4, np.float32), (8, 8))
    perm = rcm_permutation(coo)
    assert sorted(perm.tolist()) == list(range(8))


def test_reordered_solves_match_direct():
    import jax.numpy as jnp  # noqa: F401
    from sparseharness_tpu.algorithms import (
        bfs, connected_components, multi_sssp, pagerank, sssp, widest_path,
    )
    from sparseharness_tpu.algorithms.apps import scc as scc_fn

    shuffled, _ = _shuffled_banded(150, 2, seed=3)
    # give it weights usable by every algorithm
    shuffled = shuffled.with_values(
        np.abs(shuffled.vals).astype(np.float32) + 0.1
    )
    root = 17

    d0 = np.asarray(sssp(shuffled, root).x)
    d1 = np.asarray(sssp(shuffled, root, reorder="rcm").x)
    np.testing.assert_allclose(d1, d0, rtol=1e-5)

    b0 = bfs(shuffled, root)
    b1 = bfs(shuffled, root, reorder="rcm")
    np.testing.assert_array_equal(np.asarray(b1.x), np.asarray(b0.x))
    np.testing.assert_array_equal(np.asarray(b1.aux), np.asarray(b0.aux))

    p0 = np.asarray(pagerank(shuffled).x)
    p1 = np.asarray(pagerank(shuffled, reorder="rcm").x)
    np.testing.assert_allclose(p1, p0, rtol=1e-4, atol=1e-7)

    c0 = np.asarray(connected_components(shuffled).x)
    c1 = np.asarray(connected_components(shuffled, reorder="rcm").x)
    np.testing.assert_array_equal(c1, c0)

    w0 = np.asarray(widest_path(shuffled, root).x)
    w1 = np.asarray(widest_path(shuffled, root, reorder="rcm").x)
    np.testing.assert_allclose(w1, w0, rtol=1e-6)

    comp0, _, _ = scc_fn(shuffled)
    comp1, _, _ = scc_fn(shuffled, reorder="rcm")
    np.testing.assert_array_equal(comp1, comp0)

    m0 = np.asarray(multi_sssp(shuffled, [3, root]).x)
    m1 = np.asarray(multi_sssp(shuffled, [3, root], reorder="rcm").x)
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def test_rcm_routes_shuffled_band_onto_bsr_band():
    from sparseharness_tpu.ops import build_operand_auto

    shuffled, _ = _shuffled_banded(600, 3, seed=5)
    reordered, _ = reorder_rcm(shuffled)
    name, _ = build_operand_auto(reordered, PLUS_TIMES)
    assert name == "bsr_band"


def test_cli_reorder_flag(tmp_path):
    from sparseharness_tpu.cli.main import sssp_main
    from sparseharness_tpu.formats import write_mtx

    shuffled, _ = _shuffled_banded(80, 2, seed=7)
    shuffled = shuffled.with_values(np.abs(shuffled.vals) + 0.1)
    p = tmp_path / "m.mtx"
    write_mtx(str(p), shuffled)
    rc = sssp_main(["-m", str(p), "--root", "0", "-k", "auto", "-n", "1",
                    "--reorder", "rcm"])
    assert rc == 0


def test_fixpoint_components_reorder_contract():
    """Components built with reorder solve in permuted space and expose an
    unpermute hook that restores original numbering; scc refuses."""
    import jax
    import pytest as pt
    from sparseharness_tpu.algorithms import sssp
    from sparseharness_tpu.algorithms.apps import fixpoint_components
    from sparseharness_tpu.algorithms.fixpoint import run_fixpoint

    shuffled, _ = _shuffled_banded(120, 2, seed=61)
    shuffled = shuffled.with_values(np.abs(shuffled.vals) + 0.1)
    comp = fixpoint_components("sssp", shuffled, root=11, reorder="rcm")
    res = jax.jit(
        lambda x0: run_fixpoint(
            comp.step, x0, convergence=comp.convergence, max_iter=comp.limit
        )
    )(comp.x0)
    direct = np.asarray(sssp(shuffled, 11).x)
    np.testing.assert_allclose(comp.unpermute(res.x), direct, rtol=1e-5)

    with pt.raises(ValueError):
        fixpoint_components("scc", shuffled, reorder="rcm")

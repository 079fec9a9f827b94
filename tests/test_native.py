"""native/: C++ fast parser + CSR encoder vs the NumPy reference path."""

import numpy as np
import pytest

from sparseharness_tpu.formats import random_coo, write_mtx, read_mtx
from sparseharness_tpu.formats import native_io
from sparseharness_tpu.formats.mtx import read_mtx_header, _parse_entries_numpy

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable"
)


def _roundtrip(tmp_path, coo, field="real"):
    p = str(tmp_path / "m.mtx")
    write_mtx(p, coo, field=field)
    return p


def test_parse_parity_real(tmp_path):
    coo = random_coo(500, 400, 3000, seed=1)
    p = _roundtrip(tmp_path, coo)
    h = read_mtx_header(p)
    r1, c1, v1 = native_io.parse_entries(p, h)
    r2, c2, v2 = _parse_entries_numpy(p, h)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(v1, v2, rtol=1e-12)


def test_parse_parity_pattern(tmp_path):
    coo = random_coo(100, 100, 400, seed=2)
    p = _roundtrip(tmp_path, coo, field="pattern")
    h = read_mtx_header(p)
    r1, c1, v1 = native_io.parse_entries(p, h)
    assert np.all(v1 == 1.0)
    r2, c2, v2 = _parse_entries_numpy(p, h)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)


def test_parse_scientific_notation(tmp_path):
    p = tmp_path / "sci.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 4\n"
        "1 1 1.5e-3\n"
        "2 2 -2.25E+2\n"
        "3 3 7e10\n"
        "1 3 .5\n"
    )
    h = read_mtx_header(str(p))
    r, c, v = native_io.parse_entries(str(p), h)
    np.testing.assert_allclose(v, [1.5e-3, -225.0, 7e10, 0.5])
    assert r.tolist() == [0, 1, 2, 0] and c.tolist() == [0, 1, 2, 2]


def test_read_mtx_uses_native_and_matches(tmp_path):
    coo = random_coo(300, 300, 2000, seed=3)
    p = _roundtrip(tmp_path, coo)
    via_native = read_mtx(p, use_native=True)
    via_numpy = read_mtx(p, use_native=False)
    np.testing.assert_array_equal(via_native.rows, via_numpy.rows)
    np.testing.assert_array_equal(via_native.cols, via_numpy.cols)
    np.testing.assert_allclose(via_native.vals, via_numpy.vals, rtol=1e-6)


def test_csr_encode_parity():
    coo = random_coo(200, 150, 1000, seed=4)
    indptr, cols, vals = native_io.csr_encode(
        coo.rows, coo.cols, coo.vals, coo.shape[0]
    )
    csr = coo.sorted_by_row().to_csr()
    np.testing.assert_array_equal(indptr, csr.indptr)
    # native keeps file order within a row (stable); compare per-row sets
    for r in range(coo.shape[0]):
        a, b = indptr[r], indptr[r + 1]
        np.testing.assert_array_equal(
            np.sort(cols[a:b]), np.sort(csr.indices[a:b])
        )


def test_truncated_file_rejected(tmp_path):
    p = tmp_path / "short.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 3 5\n1 1 1.0\n"
    )
    h = read_mtx_header(str(p))
    with pytest.raises(ValueError):
        native_io.parse_entries(str(p), h)


def test_native_rcm_matches_numpy_exactly():
    """fastmtx_rcm mirrors the NumPy CM ordering bit-for-bit: same seeds
    (stable degree order), same pseudo-peripheral refinement, same
    (parent-rank, degree, id) level ordering."""
    from sparseharness_tpu.formats import (
        banded_coo, permute_coo, power_law_coo, random_coo,
    )
    from sparseharness_tpu.formats.reorder import (
        _sym_pattern_csr, rcm_permutation,
    )
    from sparseharness_tpu.formats import native_io

    rng = np.random.default_rng(0)
    cases = [
        random_coo(173, 173, 900, seed=1),
        power_law_coo(500, 4000, seed=2),
        banded_coo(400, 3, seed=3),
        permute_coo(banded_coo(256, 2, seed=4),
                    rng.permutation(256).astype(np.int32)),
    ]
    for i, coo in enumerate(cases):
        np_perm = rcm_permutation(coo, use_native=False)
        indptr, indices, _ = _sym_pattern_csr(coo)
        nat_perm = native_io.rcm(indptr, indices)
        np.testing.assert_array_equal(nat_perm, np_perm), i


def test_native_sym_pattern_matches_numpy():
    from sparseharness_tpu.formats import coo_from_arrays, random_coo
    from sparseharness_tpu.formats.reorder import _sym_pattern_csr

    cases = [
        random_coo(200, 200, 1500, seed=5),
        # dup edges + self loops + isolated nodes
        coo_from_arrays([0, 0, 5, 6, 3], [5, 5, 0, 6, 3],
                        np.ones(5, np.float32), (9, 9)),
    ]
    for coo in cases:
        indptr, indices, _ = _sym_pattern_csr(coo)
        nat_indptr, nat_indices = native_io.sym_pattern(
            coo.shape[0], coo.rows, coo.cols)
        np.testing.assert_array_equal(nat_indptr, indptr)
        np.testing.assert_array_equal(nat_indices, indices)


def _build_sell2_both(coo, sr, monkeypatch):
    import jax
    from sparseharness_tpu.ops import build_operand

    monkeypatch.setenv("SPARSEHARNESS_TPU_NATIVE", "0")
    a = build_operand(coo, sr, "sell2")
    monkeypatch.setenv("SPARSEHARNESS_TPU_NATIVE", "1")
    b = build_operand(coo, sr, "sell2")
    return a, b


def _assert_sell2_identical(a, b):
    assert a.layouts == b.layouts
    assert (a.piece_owner is None) == (b.piece_owner is None)
    if a.piece_owner is not None:
        np.testing.assert_array_equal(np.asarray(a.piece_owner),
                                      np.asarray(b.piece_owner))
    assert (a.virt_blocks is None) == (b.virt_blocks is None)
    if a.virt_blocks is not None:
        np.testing.assert_array_equal(np.asarray(a.virt_blocks),
                                      np.asarray(b.virt_blocks))
    assert len(a.slabs) == len(b.slabs)
    for sa, sb in zip(a.slabs, b.slabs):
        assert (sa is None) == (sb is None)
        if sa is None:
            continue
        for k in ("chunk", "wordA", "wordB", "vals"):
            np.testing.assert_array_equal(np.asarray(sa[k]),
                                          np.asarray(sb[k]))


def test_native_sell2_encode_bit_identical(monkeypatch):
    # the r5 native encode core (sell2_sort_fold + sell2_heavy_split +
    # sell2_encode_slab) must reproduce the NumPy build EXACTLY — layouts,
    # packed words, values, virtual-chunk tables, piece owners
    from sparseharness_tpu.formats import (
        banded_coo, power_law_coo, random_coo,
    )
    from sparseharness_tpu.formats.generate import chained_power_law_coo
    from sparseharness_tpu.semiring import MIN_PLUS, OR_AND, PLUS_TIMES

    if not native_io.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    cases = [
        (random_coo(300, 300, 2000, seed=1), PLUS_TIMES),
        (power_law_coo(4000, 16000, alpha=1.5, seed=13), MIN_PLUS),
        (power_law_coo(2000, 40000, alpha=1.1, seed=3), PLUS_TIMES),
        (banded_coo(3000, 20, seed=2), PLUS_TIMES),
        (chained_power_law_coo(16, 2000, 8.0, seed=5), MIN_PLUS),
        (power_law_coo(4000, 16000, alpha=1.5, seed=13), OR_AND),
    ]
    for coo, sr in cases:
        a, b = _build_sell2_both(coo, sr, monkeypatch)
        _assert_sell2_identical(a, b)


def test_native_sell2_encode_identical_with_duplicates(monkeypatch):
    from sparseharness_tpu.formats import coo_from_arrays, random_coo
    from sparseharness_tpu.semiring import PLUS_TIMES

    if not native_io.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    base = random_coo(200, 200, 3000, seed=9)
    rows = np.concatenate([base.rows, base.rows[:500]])
    cols = np.concatenate([base.cols, base.cols[:500]])
    vals = np.concatenate([base.vals, base.vals[:500] * 0.5]).astype(
        np.float32)
    coo = coo_from_arrays(rows, cols, vals, base.shape)
    a, b = _build_sell2_both(coo, PLUS_TIMES, monkeypatch)
    _assert_sell2_identical(a, b)


def test_native_sort_fold_matches_numpy():
    from sparseharness_tpu.formats import coo_from_arrays
    from sparseharness_tpu.formats.sparse import fold_duplicates

    if not native_io.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 50, 400).astype(np.int32)
    cols = rng.integers(0, 50, 400).astype(np.int32)
    vals = rng.uniform(0.1, 1.0, 400).astype(np.float32)
    coo = coo_from_arrays(rows, cols, vals, (50, 50))
    want = fold_duplicates(coo, np.add).sorted_by_row()
    got = native_io.sell2_sort_fold(coo, "add")
    np.testing.assert_array_equal(got.rows, want.rows)
    np.testing.assert_array_equal(got.cols, want.cols)
    np.testing.assert_array_equal(got.vals, want.vals)  # exact fold order


def test_native_sell2_encode_edge_cases(monkeypatch):
    # degenerate shapes through the native encode core: single entry,
    # single-column hub (deep piles), pure diagonal, trailing-slab-only
    from sparseharness_tpu.formats import coo_from_arrays
    from sparseharness_tpu.semiring import PLUS_TIMES

    if not native_io.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    cases = [
        coo_from_arrays([5], [7], np.ones(1, np.float32), (16, 16)),
        coo_from_arrays(np.arange(300), np.zeros(300, int),
                        np.ones(300, np.float32), (300, 300)),
        coo_from_arrays(np.arange(200), np.arange(200),
                        np.ones(200, np.float32), (200, 200)),
        coo_from_arrays([1999], [1999], np.ones(1, np.float32),
                        (2000, 2000)),
    ]
    for coo in cases:
        a, b = _build_sell2_both(coo, PLUS_TIMES, monkeypatch)
        _assert_sell2_identical(a, b)

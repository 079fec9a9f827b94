"""ops/pallas_sell2: the all-crossbar ragged kernel's layout edge cases.

The variant×semiring gold matrix in test_spmv_variants.py covers the small
square case; here we exercise the layout machinery the builder must get
right: multi-slab row spaces (> 16384 rows), multi-chunk column spaces
(> 16384 cols, panels bound to one chunk each), hub rows spanning panels,
duplicate folding, empty slabs, and the bf16 value store.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sparseharness_tpu.formats import power_law_coo, random_coo
from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.gold import spmv_gold, check_result, Correctness
from sparseharness_tpu.ops import Geometry, build_operand, spmv
from sparseharness_tpu.ops.pallas_sell2 import SLAB_ROWS, CHUNK_COLS, build_sell2
from sparseharness_tpu.semiring import get_semiring


def _run(coo, srname="plus_times", geometry=Geometry(), delta=1e-4, seed=0):
    sr = get_semiring(srname)
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
    gold = spmv_gold(coo, x, y, sr)
    op = build_operand(coo, sr, "sell2", geometry)
    out = np.asarray(
        spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr, variant="sell2",
             n_rows=coo.shape[0])
    )
    assert check_result(out, gold, delta=delta) is Correctness.CORRECT, (
        f"max|Δ|={np.max(np.abs(out.astype(np.float64) - gold.astype(np.float64)))}"
    )


def test_multi_slab_rows():
    # rows span 2 slabs (> 16384); rectangular
    coo = random_coo(SLAB_ROWS + 3000, 900, 40_000, seed=1)
    _run(coo)


def test_multi_chunk_cols():
    # cols span 3 chunks (> 2·16384): panels must bind to single chunks
    coo = random_coo(700, 2 * CHUNK_COLS + 5000, 30_000, seed=2)
    _run(coo)


def test_power_law_min_plus():
    coo = power_law_coo(3000, 30_000, alpha=1.5, seed=3)
    _run(coo, "min_plus")


def test_power_law_max_right():
    coo = power_law_coo(2000, 20_000, alpha=1.5, seed=4)
    coo = coo.with_values((coo.vals * 50).astype(np.int32))
    _run(coo, "max_right", delta=0)


def test_hub_row_spans_panels():
    # one row with 600 entries: > 127 per panel forces multi-panel runs
    # accumulated through the out tile; plus background noise
    rng = np.random.default_rng(5)
    hub_cols = rng.choice(4000, 600, replace=False)
    bg = random_coo(1200, 4000, 5000, seed=6)
    rows = np.r_[np.full(600, 7), bg.rows]
    cols = np.r_[hub_cols, bg.cols]
    vals = np.r_[rng.uniform(0.1, 1.0, 600).astype(np.float32), bg.vals]
    coo = COO(rows.astype(np.int32), cols.astype(np.int32), vals, (1200, 4000))
    _run(coo)


def test_duplicates_fold():
    rows = np.array([0, 0, 0, 5, 5, 300], np.int32)
    cols = np.array([3, 3, 3, 9, 9, 250], np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], np.float32)
    coo = COO(rows, cols, vals, (400, 400))
    _run(coo)


def test_empty_rows_and_trailing_pad():
    # entries only in the first few rows; most of the padded row space empty
    rows = np.array([0, 1, 2], np.int32)
    cols = np.array([10, 20, 30], np.int32)
    vals = np.array([1.0, 2.0, 3.0], np.float32)
    coo = COO(rows, cols, vals, (5000, 5000))
    _run(coo)


def test_bf16_store():
    coo = random_coo(800, 800, 6000, seed=7)
    _run(coo, geometry=Geometry(value_dtype="bfloat16"), delta=2e-2)


def test_single_entry_runs():
    # every row has exactly 1 entry → all runs width 2 with identity pad
    n = 2000
    rows = np.arange(n, dtype=np.int32)
    cols = ((rows * 37) % n).astype(np.int32)
    vals = np.linspace(0.1, 1.0, n).astype(np.float32)
    _run(COO(rows, cols, vals, (n, n)))


def test_layout_stats():
    # builder invariants: slab count, per-slab panels > 0, depth within 1..7
    coo = power_law_coo(3000, 40_000, alpha=1.5, seed=8)
    sr = get_semiring("plus_times")
    op = build_sell2(coo, sr)
    assert sum(l.rows for l in op.layouts) >= 3000
    for lay in op.layouts:
        assert 1 <= lay.depth <= 7
        assert lay.rows % 1024 == 0


def test_virtual_chunks_gold_and_density():
    # wide scattered structure: many chunks whose per-slab segments are
    # sub-panel. Virtualization must (a) trigger, (b) reduce panels vs
    # the off switch, (c) stay gold-correct — incl. a min-plus identity
    # check (FLT_MAX rides the virtual gather like any x value)
    # many light chunks with dense piles: 60 chunks × 4 occupied blocks
    # × 16 entries — every chunk's segment is sub-panel (demand ~8), so
    # without virtualization each claims one of a panel's two tile slots
    rng = np.random.default_rng(9)
    n = 4096
    ch = np.repeat(np.arange(60), 64)
    bk = np.repeat(np.tile(np.arange(4), 60), 16)
    rows = rng.integers(0, n, ch.size).astype(np.int32)
    cols = (ch * CHUNK_COLS + bk * 128
            + rng.integers(0, 128, ch.size)).astype(np.int32)
    vals = rng.uniform(0.1, 1.0, ch.size).astype(np.float32)
    coo = COO(rows, cols, vals, (n, 60 * CHUNK_COLS))
    sr = get_semiring("plus_times")
    op_on = build_sell2(coo, sr)
    op_off = build_sell2(coo, sr, virtual_chunks=False)
    assert op_on.virt_blocks is not None, "virtualization should trigger"
    p_on = sum(l.panels for l in op_on.layouts)
    p_off = sum(l.panels for l in op_off.layouts)
    assert p_on < p_off, (p_on, p_off)
    _run(coo)
    _run(coo, "min_plus")
    _run(coo, "max_right")


def test_virtual_chunks_off_for_local_structure():
    # banded/local structure: every chunk is heavy → no virtual chunks,
    # identical layouts with the switch on or off
    from sparseharness_tpu.formats import banded_coo

    coo = banded_coo(3000, 5, seed=10)
    sr = get_semiring("plus_times")
    op = build_sell2(coo, sr)
    assert op.virt_blocks is None


def _pack_case(seed=0):
    rng = np.random.default_rng(seed)
    cnt = np.zeros((48, 128), np.int64)
    for b in range(40):     # mixed spectrum: mid blocks + singleton tail
        lanes = rng.choice(128, int(rng.integers(1, 30)), replace=False)
        cnt[b, lanes] = rng.integers(1, 8, lanes.size)
    for b in range(40, 48):
        cnt[b, rng.integers(0, 128)] = 1
    return cnt


def _check_pack(cnt, n_sub, b0, b1, way, flat):
    """Shared invariants: every pile entry gets a distinct (sublane,
    lane) cell inside its block's own-shelf interval; ≤2 bindings per
    sublane is structural (one block id per shelf array)."""
    occ = np.zeros((n_sub, 128), bool)
    pstart = np.zeros(cnt.size + 1, np.int64)
    np.cumsum(cnt.reshape(-1), out=pstart[1:])
    for lb in range(cnt.shape[0]):
        for l in np.nonzero(cnt[lb])[0]:
            rows = flat[pstart[lb * 128 + l]:pstart[lb * 128 + l + 1]]
            assert len(rows) == cnt[lb, l]
            assert not occ[rows, l].any(), "cell collision"
            occ[rows, l] = True
            binding = (b0 if way[lb] == 0 else b1)[rows]
            assert (binding == lb).all(), "pile outside its interval"
    # the packer beats naive per-block stacking (sum of demands)
    assert n_sub < int(cnt.max(axis=1).sum())


def test_twoshelf_pack_invariants():
    from sparseharness_tpu.ops.pallas_sell2 import _twoshelf_pack

    cnt = _pack_case(0)
    _check_pack(cnt, *_twoshelf_pack(cnt))


def test_twoshelf_pack_native_matches_numpy(monkeypatch):
    """The native packer (native/fast_mtx.cpp:sell2_twoshelf_pack) must be
    bit-identical to the NumPy fallback: same sublanes, bindings, shelf
    bits and per-entry slots."""
    import pytest

    from sparseharness_tpu.formats import native_io
    from sparseharness_tpu.ops.pallas_sell2 import (
        SHELF_HOLE_TRIES, SHELF_MAX_HOLES, SHELF_MAX_PUSH, _twoshelf_pack,
    )

    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    for seed in (0, 1, 2):
        cnt = _pack_case(seed)
        nat = native_io.sell2_pack(
            cnt, SHELF_MAX_PUSH, SHELF_MAX_HOLES, SHELF_HOLE_TRIES)
        monkeypatch.setenv("SPARSEHARNESS_TPU_NATIVE", "0")
        ref = _twoshelf_pack(cnt)
        monkeypatch.delenv("SPARSEHARNESS_TPU_NATIVE")
        assert nat[0] == ref[0]
        for a, b in zip(nat[1:], ref[1:]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        _check_pack(cnt, *nat)

"""Operand-initialization verification (ops/verify.py) — the builder-side
analogue of oclgrind --uninitialized (scripts/example/spmv.sh:21 in the
reference; VERDICT r4 missing #3): every slot of every operand array must be
a real entry, a ⊕-folded entry, or the semiring identity padding, and index
leaves must be in bounds."""

import numpy as np
import pytest

from sparseharness_tpu.formats import random_coo, random_graph_coo
from sparseharness_tpu.ops import (
    OperandInitError,
    VARIANTS,
    build_operand,
    get_variant,
    verify_operand_initialized,
)
from sparseharness_tpu.ops.jnp_ops import EllOperand
from sparseharness_tpu.semiring import (
    MAX_RIGHT,
    MIN_PLUS,
    OR_AND,
    PLUS_TIMES,
)

CHECK_VARIANTS = [
    "ell", "coo_seg", "dense", "bsr_pallas", "bsr_ell", "bsr_fused",
    "bsr_band", "sell2",
]
CHECK_SEMIRINGS = [PLUS_TIMES, MIN_PLUS, OR_AND, MAX_RIGHT]


@pytest.mark.parametrize("variant", CHECK_VARIANTS)
@pytest.mark.parametrize("sr", CHECK_SEMIRINGS, ids=lambda s: s.name)
def test_builders_pass_init_check(variant, sr):
    v = get_variant(variant)
    if not v.supports_semiring(sr):
        pytest.skip(f"{variant} does not support {sr.name}")
    coo = random_coo(96, 96, 400, seed=11)
    if sr.dtype != "float32" and np.dtype(sr.dtype).kind in "iub":
        # int/bool semirings: integral values (the builders cast; keep the
        # allowed-set comparison exact)
        from sparseharness_tpu.formats.sparse import COO

        coo = COO(rows=coo.rows, cols=coo.cols,
                  vals=np.arange(1, len(coo.vals) + 1, dtype=np.float32),
                  shape=coo.shape)
    try:
        op = build_operand(coo, sr, variant)
    except NotImplementedError as e:
        pytest.skip(str(e))
    verify_operand_initialized(coo, sr, op, variant)


def test_init_check_graph_matrix_sell2():
    # power-law structure exercises sell2's packer/virtual-chunk paths
    coo = random_graph_coo(300, 4.0, seed=3)
    op = build_operand(coo, MIN_PLUS, "sell2")
    verify_operand_initialized(coo, MIN_PLUS, op, "sell2")


def test_seeded_garbage_value_is_caught():
    # simulate an np.empty builder bug: one padding slot holds heap garbage
    coo = random_coo(40, 40, 120, seed=5)
    op = build_operand(coo, PLUS_TIMES, "ell")
    vals = np.asarray(op.vals).copy()
    # find a padding slot (== sr.zero) and poison it with a non-entry value
    pads = np.argwhere(vals == 0.0)
    assert len(pads), "expected padded slots"
    vals[tuple(pads[0])] = 1.2345678e19  # garbage no entry can equal
    bad = EllOperand(cols=op.cols, vals=vals)
    with pytest.raises(OperandInitError, match="vals"):
        verify_operand_initialized(coo, PLUS_TIMES, bad, "ell")


def test_seeded_out_of_bounds_index_is_caught():
    coo = random_coo(40, 40, 120, seed=6)
    op = build_operand(coo, PLUS_TIMES, "ell")
    cols = np.asarray(op.cols).copy()
    cols.ravel()[3] = 10**7  # garbage index far past any padded width
    bad = EllOperand(cols=cols, vals=op.vals)
    with pytest.raises(OperandInitError, match="cols"):
        verify_operand_initialized(coo, PLUS_TIMES, bad, "ell")


def test_seeded_blocked_tile_garbage_is_caught():
    coo = random_coo(64, 64, 200, seed=7)
    op = build_operand(coo, PLUS_TIMES, "bsr_ell")
    tiles = np.asarray(op.tiles).copy()
    pads = np.argwhere(tiles == 0.0)
    assert len(pads), "expected padded tile slots"
    tiles[tuple(pads[0])] = -7.7e11
    bad = type(op)(tiles=tiles, tile_cols=op.tile_cols)
    with pytest.raises(OperandInitError, match="tiles"):
        verify_operand_initialized(coo, PLUS_TIMES, bad, "bsr_ell")


def test_env_var_wires_check_into_build(monkeypatch):
    # SPARSEHARNESS_TPU_CHECK_INIT=1 makes build_operand itself verify;
    # a poisoned builder then raises where the unchecked build would not
    import dataclasses

    coo = random_coo(32, 32, 90, seed=8)
    good = VARIANTS["ell"]

    def bad_build(c, sr, geom):
        op = good.build(c, sr, geom)
        vals = np.asarray(op.vals).copy()
        vals.ravel()[-1] = 3.14159e33
        return EllOperand(cols=op.cols, vals=vals)

    monkeypatch.setitem(VARIANTS, "ell",
                        dataclasses.replace(good, build=bad_build))
    monkeypatch.setenv("SPARSEHARNESS_TPU_CHECK_INIT", "0")
    build_operand(coo, PLUS_TIMES, "ell")  # unchecked: passes silently
    monkeypatch.setenv("SPARSEHARNESS_TPU_CHECK_INIT", "1")
    with pytest.raises(OperandInitError):
        build_operand(coo, PLUS_TIMES, "ell")

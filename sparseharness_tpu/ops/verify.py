"""Operand-initialization verification — the builder-side analogue of
oclgrind's ``--uninitialized`` check (reference CI runs the harness under
``oclgrind --check-api --data-races --uninitialized``,
scripts/example/spmv.sh:21; VERDICT r4 missing #3).

TPU kernels cannot be instrumented for reads-before-writes the way a
simulated OpenCL device can, so the equivalent defense moves to the host:
after a builder produces an operand, every slot of every operand array must
be *accounted for* — a value slot holds either a real matrix entry (possibly
⊕-folded with duplicates) or the semiring's ⊕-identity padding (the
⊗-annihilator, per the padding contract in CLAUDE.md), and an index slot is
in bounds for what it addresses. A builder that allocates with ``np.empty``
and forgets to fill a region leaves heap garbage in the slots; garbage
floats are (with overwhelming probability) not members of the entry-value
set and garbage indices are wildly out of bounds, so both trip here before
anything is uploaded.

Scope: this checks *initialization*, not *placement* — a builder that pads
correctly but scatters an entry to the wrong coordinate is the gold matrix's
job (tests/test_spmv_variants.py). Packed route words (sell2 wordA/wordB)
encode bit-packed lane routes with no compact value set; they are validated
end-to-end by the all-semiring gold matrix and skipped here.

Enable on every build with ``SPARSEHARNESS_TPU_CHECK_INIT=1`` (wired into
ops.build_operand / build_operand_auto); the pytest matrix runs it across
the variant × semiring grid.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from sparseharness_tpu.formats.sparse import COO, fold_duplicates, round_up
from sparseharness_tpu.semiring import Semiring


class OperandInitError(ValueError):
    """An operand array slot is neither a real entry nor identity padding."""


#: leaves holding matrix values (padding must be the carrier ⊕-identity)
_VALUE_LEAVES = {"vals", "tiles", "strips", "mat"}
#: route/bit-packed leaves with no compact allowed-value set
_SKIP_LEAVES = {"wordA", "wordB", "virt_blocks"}


def _np_fold(sr: Semiring):
    name = getattr(sr.add, "__name__", "")
    return {"add": np.add, "minimum": np.minimum, "maximum": np.maximum}.get(
        name, np.add)


def _leaf_name(path) -> str:
    # NamedTuple fields give .name; sequence/dict indices stringify
    parts = []
    for p in path:
        n = getattr(p, "name", None)
        if n is None:
            n = str(getattr(p, "idx", getattr(p, "key", "")))
        parts.append(str(n))
    return ".".join(parts) or "<leaf>"


def _check_values(name: str, leaf: np.ndarray, allowed: np.ndarray) -> None:
    flat = leaf.ravel()
    if flat.dtype.kind in "fiu":
        cand = allowed.astype(flat.dtype)
    else:
        # low-precision storage (bf16): round the allowed set through the
        # storage dtype, then compare exactly in f32
        cand = allowed.astype(flat.dtype).astype(np.float32)
        flat = flat.astype(np.float32)
    ok = np.isin(flat, cand)
    if not ok.all():
        bad = np.flatnonzero(~ok)
        raise OperandInitError(
            f"operand leaf {name!r}: {bad.size} slot(s) hold values that "
            f"are neither matrix entries nor the semiring identity "
            f"(first: flat index {bad[0]} = {flat[bad[0]]!r}) — "
            f"probable uninitialized builder memory")


def _check_index(name: str, leaf: np.ndarray, lo: int, hi: int) -> None:
    flat = leaf.ravel()
    if flat.size == 0:
        return
    mn, mx = int(flat.min()), int(flat.max())
    if mn < lo or mx >= hi:
        raise OperandInitError(
            f"operand leaf {name!r}: index values span [{mn}, {mx}] outside "
            f"the valid [{lo}, {hi}) — probable uninitialized builder memory")


def verify_operand_initialized(
    coo: COO, sr: Semiring, operand: Any, variant: str = "?",
) -> None:
    """Raise :class:`OperandInitError` if any slot of any operand array is
    neither a real (possibly duplicate-⊕-folded) matrix entry nor the
    semiring's identity padding, or an index leaf is out of bounds."""
    zero = np.asarray(sr.zero, np.dtype(sr.dtype))
    one = np.asarray(sr.one, np.dtype(sr.dtype))
    vals = np.asarray(coo.vals)
    folded = fold_duplicates(coo, _np_fold(sr)).vals
    # bool carriers ride as int32 {0,1} in blocked/packed layouts; offer the
    # allowed set in both the native and the int carrier domain
    allowed = np.unique(np.concatenate([
        vals.astype(np.float64, copy=False).ravel(),
        np.asarray(folded, np.float64).ravel(),
        np.asarray([np.float64(zero), np.float64(one), 0.0, 1.0]),
    ]))
    n_r, n_c = coo.shape
    r_hi = round_up(max(n_r, 1), 128) + len(vals) + 128  # heavy-row pieces
    c_hi = round_up(max(n_c, 1), 128)

    leaves = jax.tree_util.tree_leaves_with_path(operand)
    for path, leaf in leaves:
        name = _leaf_name(path)
        base = name.rsplit(".", 1)[-1]
        arr = np.asarray(leaf)
        if base in _SKIP_LEAVES:
            continue
        if base in _VALUE_LEAVES:
            _check_values(f"{variant}:{name}", arr, allowed)
        elif base in ("cols", "tile_cols"):
            _check_index(f"{variant}:{name}", arr, 0, c_hi)
        elif base in ("rows", "tile_rows", "piece_owner"):
            _check_index(f"{variant}:{name}", arr, 0, r_hi)
        elif base == "row_start":
            _check_index(f"{variant}:{name}", arr, 0, 2)
        elif base == "chunk":
            _check_index(f"{variant}:{name}", arr, 0, 2**31 - 1)
        # other leaves (static aux, scalars) carry no slot contract

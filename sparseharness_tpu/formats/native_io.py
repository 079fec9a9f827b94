"""ctypes bindings to the native MatrixMarket parser (native/fast_mtx.cpp).

The reference's data-loading layer is native C/C++ (src/mmio.cpp + the
fscanf loop at src/sparse_matrix.cpp:50); this module is its TPU-framework
counterpart. The library is built on demand with the local toolchain
(native/Makefile) and every use is guarded — read_mtx falls back to the
NumPy path when the toolchain or binary is unavailable
(SPARSEHARNESS_TPU_NATIVE=0 disables it entirely).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastmtx.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class NativeUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            raise NativeUnavailable("native library previously failed to load")
        _tried = True
        if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
            # always invoke make: a no-op when fresh, and it rebuilds a
            # stale .so that predates newly added symbols
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception as e:  # toolchain missing / build failure
                if not os.path.exists(_LIB_PATH):
                    raise NativeUnavailable(f"native build failed: {e}") from e
        elif not os.path.exists(_LIB_PATH):
            raise NativeUnavailable("native sources not present")
        lib = ctypes.CDLL(_LIB_PATH)
        try:
            _bind(lib)
        except AttributeError as e:
            # a stale libfastmtx.so predating newly added symbols, with the
            # rebuild above having failed: degrade like every other native
            # failure path instead of leaking AttributeError (ADVICE r1 #2)
            raise NativeUnavailable(
                f"stale native library, rebuild required: {e}"
            ) from e
        try:
            # heap-arena reuse for large buffers: this host's first-touch
            # page faults run ~50 µs/page and glibc munmaps big chunks on
            # free, so every encode would refault its working set (145×
            # measured on 140 MB steady-state alloc+fill). Process-wide;
            # opt out with SPARSEHARNESS_TPU_MALLOC_TUNE=0.
            if os.environ.get("SPARSEHARNESS_TPU_MALLOC_TUNE", "1") != "0":
                lib.fastmtx_tune_malloc()
        except AttributeError:
            pass
        _lib = lib
        return lib


def _bind(lib: ctypes.CDLL) -> None:
    lib.fastmtx_parse.restype = ctypes.c_int64
    lib.fastmtx_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.fastmtx_csr_encode.restype = None
    lib.fastmtx_csr_encode.argtypes = [
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fastmtx_rcm.restype = None
    lib.fastmtx_rcm.argtypes = [
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fastmtx_sym_pattern.restype = ctypes.c_int64
    lib.fastmtx_sym_pattern.argtypes = [
        ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sell2_twoshelf_pack.restype = None
    lib.sell2_twoshelf_pack.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sell2_encode_slab.restype = ctypes.c_void_p
    lib.sell2_encode_slab.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.sell2_slab_meta.restype = None
    lib.sell2_slab_meta.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sell2_slab_fetch.restype = None
    lib.sell2_slab_fetch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.sell2_slab_free.restype = None
    lib.sell2_slab_free.argtypes = [ctypes.c_void_p]
    lib.sell2_heavy_split.restype = ctypes.c_int64
    lib.sell2_heavy_split.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sell2_sort_fold.restype = ctypes.c_int64
    lib.sell2_sort_fold.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _body_offset(path: str) -> int:
    """Byte offset of the first entry line (after banner/comments/size)."""
    offset = 0
    with open(path, "rb") as f:
        saw_size = False
        for line in f:
            offset += len(line)
            s = line.strip()
            if not s or s.startswith(b"%"):
                continue
            if not saw_size:
                saw_size = True  # the size line
                return offset
    raise ValueError("missing size line")


def parse_entries(
    path: str, header
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, cols, vals) 0-based via the native parser. Raises
    NativeUnavailable / ValueError on any failure (caller falls back)."""
    lib = _load()
    nnz = header.nnz
    rows = np.empty(nnz, np.int32)
    cols = np.empty(nnz, np.int32)
    vals = np.empty(nnz, np.float64)
    got = lib.fastmtx_parse(
        path.encode(), _body_offset(path), nnz,
        1 if header.field == "pattern" else 0,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if got != nnz:
        raise ValueError(f"native parser read {got} of {nnz} entries")
    if nnz and (
        rows.min() < 0 or cols.min() < 0
        or rows.max() >= header.rows or cols.max() >= header.cols
    ):
        raise ValueError("entry index out of bounds")
    return rows.astype(np.int64), cols.astype(np.int64), vals


def csr_encode(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
               n_rows: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native histogram+scatter CSR encode (row-major, stable)."""
    lib = _load()
    nnz = len(rows)
    rows32 = np.ascontiguousarray(rows, np.int32)
    cols32 = np.ascontiguousarray(cols, np.int32)
    vals64 = np.ascontiguousarray(vals, np.float64)
    indptr = np.empty(n_rows + 1, np.int32)
    out_cols = np.empty(nnz, np.int32)
    out_vals = np.empty(nnz, np.float32)
    lib.fastmtx_csr_encode(
        nnz, n_rows,
        rows32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return indptr, out_cols, out_vals


def rcm(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Native reverse Cuthill-McKee over a symmetrized CSR pattern —
    bit-identical ordering to the NumPy reference (formats/reorder.py).
    Raises NativeUnavailable when the library (or a 32-bit-indexable
    pattern) is not available; callers fall back to NumPy."""
    lib = _load()
    n = len(indptr) - 1
    if len(indices) >= 2**31 or n >= 2**31:
        raise NativeUnavailable("pattern too large for int32 indexing")
    indptr32 = np.ascontiguousarray(indptr, np.int32)
    indices32 = np.ascontiguousarray(indices, np.int32)
    perm = np.empty(max(n, 1), np.int32)
    lib.fastmtx_rcm(
        n,
        indptr32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indices32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return perm[:n]


def sym_pattern(n: int, rows: np.ndarray,
                cols: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(indptr, indices) of the symmetrized, de-duplicated, diagonal-free
    pattern — native counterpart of reorder._sym_pattern_csr."""
    lib = _load()
    nnz = len(rows)
    if n >= 2**31 or 2 * nnz >= 2**31:
        raise NativeUnavailable("pattern too large for int32 indexing")
    rows32 = np.ascontiguousarray(rows, np.int32)
    cols32 = np.ascontiguousarray(cols, np.int32)
    indptr = np.empty(n + 1, np.int32)
    indices = np.empty(max(2 * nnz, 1), np.int32)
    got = lib.fastmtx_sym_pattern(
        n, nnz,
        rows32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if got < 0:
        raise NativeUnavailable("sym_pattern allocation failure")
    return indptr, indices[:got].copy()


def rcm_from_coo(n: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Whole-RCM fast path: native symmetrization + native traversal."""
    indptr, indices = sym_pattern(n, rows, cols)
    return rcm(indptr, indices)


def sell2_pack(cnt: np.ndarray, max_push: int, max_holes: int,
               hole_tries: int):
    """Native two-shelf packer (ops/pallas_sell2._twoshelf_pack contract):
    returns (n_sub, bind0, bind1, way, flat_sub). Bit-identical to the
    NumPy path by construction; raises NativeUnavailable on any failure
    (caller falls back)."""
    lib = _load()
    cnt = np.ascontiguousarray(cnt, dtype=np.int64)
    nb = cnt.shape[0]
    demand_sum = int(cnt.max(axis=1).sum()) if nb else 0
    cap = demand_sum + max_push + 1
    bind0 = np.empty(cap, np.int64)
    bind1 = np.empty(cap, np.int64)
    way = np.empty(max(nb, 1), np.int8)
    flat = np.empty(max(int(cnt.sum()), 1), np.int64)
    n_sub = np.zeros(1, np.int64)
    lib.sell2_twoshelf_pack(
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(nb),
        ctypes.c_int64(max_push), ctypes.c_int64(max_holes),
        ctypes.c_int64(hole_tries),
        bind0.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bind1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        way.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    ns = int(n_sub[0])
    if ns < 0:
        raise NativeUnavailable(
            "sell2_twoshelf_pack: placement bounds invariant breached "
            "(o + d > cap) — refusing the native layout")
    return ns, bind0[:ns], bind1[:ns], way[:nb], flat[: int(cnt.sum())]


def sell2_encode_slab(rows_e, cols_e, vals_store, zero_store,
                      n_chunks: int, virt_base: int, rows_slab: int,
                      virtual_chunks: bool, max_push: int, max_holes: int,
                      hole_tries: int, virt_demand_t: int,
                      bucket_order: bool = False):
    """Native per-slab sell2 encode (ops/pallas_sell2.build_sell2 phase
    A/B + array fills), bit-identical to the NumPy slab body. Returns
    ``(wordA, wordB, vals, chunk_of_panel, p_depth, p_two, p_hi,
    virt_rows, bf_depth, two_tiles, has_hi, P)``; raises
    :class:`NativeUnavailable` on any failure (caller runs the NumPy
    body for this slab instead — safe to mix, the layouts agree)."""
    lib = _load()
    rows_e = np.ascontiguousarray(rows_e, np.int64)
    cols_e = np.ascontiguousarray(cols_e, np.int64)
    vals_store = np.ascontiguousarray(vals_store)
    zero_store = np.ascontiguousarray(zero_store)
    if zero_store.dtype != vals_store.dtype:
        raise NativeUnavailable("zero/value dtype mismatch")
    m = len(rows_e)
    itemsize = vals_store.dtype.itemsize
    h = lib.sell2_encode_slab(
        rows_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals_store.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(m), ctypes.c_int64(itemsize),
        zero_store.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_chunks), ctypes.c_int64(virt_base),
        ctypes.c_int64(rows_slab),
        ctypes.c_int32(1 if virtual_chunks else 0),
        ctypes.c_int64(max_push), ctypes.c_int64(max_holes),
        ctypes.c_int64(hole_tries), ctypes.c_int64(virt_demand_t),
    )
    if not h:
        raise NativeUnavailable("sell2_encode_slab: layout invariant "
                                "failed (align budget / empty slab)")
    try:
        P = ctypes.c_int64()
        n_virt = ctypes.c_int64()
        bf = ctypes.c_int32()
        two = ctypes.c_int32()
        hi = ctypes.c_int32()
        lib.sell2_slab_meta(h, ctypes.byref(P), ctypes.byref(n_virt),
                            ctypes.byref(bf), ctypes.byref(two),
                            ctypes.byref(hi))
        P_, nv = int(P.value), int(n_virt.value)
        L = 128
        wordA = np.empty((P_ * L, L), np.int32)
        wordB = np.empty((P_ * L, L), np.int32)
        vals = np.empty((P_ * L, L), vals_store.dtype)
        cop = np.empty((P_, 2), np.int32)
        p_depth = np.empty(P_, np.int32)
        p_two = np.empty(P_, np.uint8)
        p_hi = np.empty(P_, np.uint8)
        vrows = np.empty((max(nv, 1), L), np.int32)
        lib.sell2_slab_fetch(
            h,
            wordA.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            wordB.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cop.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            p_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            p_two.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            p_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            vrows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(1 if bucket_order else 0),
        )
    finally:
        lib.sell2_slab_free(h)
    return (wordA, wordB, vals, cop, p_depth, p_two.astype(bool),
            p_hi.astype(bool), vrows[:nv], int(bf.value),
            bool(two.value), bool(hi.value), P_)


_VAL_KINDS = {"float32": 0, "float64": 1, "int32": 2, "int64": 3, "bool": 4}
_FOLD_OPS = {"add": 0, "minimum": 1, "maximum": 2, "or": 3}


def sell2_sort_fold(coo, fold_name: str):
    """Native stable (row, col) sort + adjacent duplicate ⊕-fold — the
    fold_duplicates + sorted_by_row front of the sell2 build, same FP
    fold order. Returns a sorted, duplicate-free COO."""
    from sparseharness_tpu.formats.sparse import COO

    lib = _load()
    kind = _VAL_KINDS.get(np.dtype(coo.vals.dtype).name)
    op = _FOLD_OPS.get(fold_name, 0)
    if kind is None:
        raise NativeUnavailable(f"unsupported value dtype {coo.vals.dtype}")
    nnz = coo.nnz
    if nnz == 0 or nnz > 2**31 - 1:
        raise NativeUnavailable("nnz out of native range")
    rows = np.ascontiguousarray(coo.rows, np.int32)
    cols = np.ascontiguousarray(coo.cols, np.int32)
    vals = np.ascontiguousarray(coo.vals)
    out_rows = np.empty(nnz, np.int32)
    out_cols = np.empty(nnz, np.int32)
    out_vals = np.empty(nnz, vals.dtype)
    got = lib.sell2_sort_fold(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(nnz), ctypes.c_int64(coo.shape[0]),
        ctypes.c_int64(coo.shape[1]),
        ctypes.c_int64(vals.dtype.itemsize),
        ctypes.c_int32(kind), ctypes.c_int32(op),
        out_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        raise NativeUnavailable("sell2_sort_fold refused the input")
    return COO(out_rows[:got], out_cols[:got], out_vals[:got], coo.shape)


def sell2_heavy_split(s_coo, vals_all, base_pad: int, split_t: int):
    """Native heavy-row split + final (rows_k, col) order (the closed-form
    stripe in build_sell2). ``s_coo`` must be (row, col) sorted and
    duplicate-free; ``vals_all`` carries the already-converted carrier
    values. Returns (k_rows, k_cols, k_vals, piece_owner, n_pieces)."""
    lib = _load()
    nnz = s_coo.nnz
    n_rows = s_coo.shape[0]
    if nnz == 0 or nnz > 2**31 - 1:
        raise NativeUnavailable("nnz out of native range")
    rows = np.ascontiguousarray(s_coo.rows, np.int32)
    cols = np.ascontiguousarray(s_coo.cols, np.int32)
    vals = np.ascontiguousarray(vals_all)
    k_rows = np.empty(nnz, np.int64)
    k_cols = np.empty(nnz, np.int64)
    k_vals = np.empty(nnz, vals.dtype)
    owner = np.empty(nnz // max(split_t // 2, 1) + 2, np.int32)
    got = lib.sell2_heavy_split(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(nnz), ctypes.c_int64(vals.dtype.itemsize),
        ctypes.c_int64(n_rows), ctypes.c_int64(base_pad),
        ctypes.c_int64(split_t),
        k_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        k_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        k_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        owner.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if got < 0:
        raise NativeUnavailable("sell2_heavy_split refused the input")
    return k_rows, k_cols, k_vals, owner[:got], int(got)

"""Gen-6 Pallas kernel for ragged/power-law rows: all-crossbar pipeline.

This is the chip-validated redesign of the reference's ragged 'rsa' kernel
family (``glb-sdp-rsa``, /root/reference/example/kernel5.json; properties
parsed at /root/reference/src/kernel_config.cpp:20-38) — CSR-like layouts
with per-row offset+length headers for matrices whose power-law row lengths
blow up padded ELL. The v1 design (ops/pallas_sell.py) rode multi-vreg
sublane ``dynamic_gather``, which this Mosaic build rejects; probes
(scripts/probe_sell_prims.py, probe_sell3_stages.py, probe_sell4_butterfly
.py) establish the supported primitive set — lane crossbars with minor dim
exactly 128 (``jnp.take_along_axis(src, idx, axis=1)``) and in-tile
(128,128) transposes — and this kernel is built from exactly those, with
zero scalar loads, zero sublane gathers, and every intermediate a full
(128,128) tile (narrow tiles / minor-axis reshape-reduces crash this TPU
compile helper — probe 5 stage 4).

Everything is organised around (128, 128) *panels* of a packed entry
stream. For each panel the kernel does, entirely in registers:

1. **Staging.** Each stream sublane s is bound at build time to *two*
   128-wide block-rows of x inside one 16K-column *chunk*; the chunk's
   transposed tile xT (built once per SpMV by XLA) is block-streamed via a
   scalar-prefetched per-panel chunk id. ``y_w[l, s] = xT[l, blk_w[s]]``
   (one lane crossbar per way) then a transpose puts x rows back
   sublane-major. Two ways per sublane halve the per-block padding floor
   for scattered tails (a sublane whose two blocks each hold a handful of
   entries carries both); a per-slot way bit picks the staged row. The
   bindings are per-sublane, so block↔sublane assignment is a two-shelf
   interval packing (_twoshelf_pack), not an all-or-nothing block
   pairing: a heavy block's slack sublanes each absorb a different light
   partner. No scalar row loads (those measure 5.1 Gslot/s — probe 4)
   and no VMEM cap on the x size.
2. **Phase A (contrib).** ``w_w[s, l] = staged_w[s, lanesel[s, l]]`` (lane
   crossbar per way), way-selected, then ``contrib = mul(w, vals)``.
   An entry at slot (s, l) must have ``col // 128 ∈ {blk0[s], blk1[s]}``
   and ``row % 128 == l`` — the (block-binding, row-lane) packing.
3. **Phase B (row reduce).** ``tc = contrib.T`` makes each row-class
   r%128 a sublane whose 128 lanes are the panel's stream sublanes. Two
   *align* crossbars gather every row's entries into power-of-two-aligned
   runs over 256 virtual slots (two tiles); a ≤7-level XOR **butterfly**
   ``t_k = add(t_k-1, t_k-1[:, j ^ 2^(k-1)])`` reduces all runs at once —
   after level k every lane uniformly holds the ⊕ of its aligned 2^k
   block, so a width-2^k run is complete at its offset lane at level k,
   where a capture mask freezes it into ``final``. Route crossbars then
   read, for every output row, its run's captured value — two route sets
   (lo/hi) cover 256 out slots so a slab spans 32K rows, halving the
   per-slab block-incidence padding. Rows with no entries in the panel
   route to a never-captured lane (identity). ``out ⊕= route.T``.

Per-panel HBM traffic is 3 words/slot (vals + two packed index words =
12 B/slot f32, 10 B bf16); all index fields ride two int32 arrays::

  wordA[l, v] = a1 | a2<<7 | cap1<<14 | cap2<<18
                | route_hi_lane<<22 | route_hi_tile<<29
  wordB[u, v] = lanesel | route_lo_lane<<7 | route_lo_tile<<14
                | blk1<<15 | blk0<<22 | way<<29

cap fields are 4 bits storing level+1: v=1 captures the raw aligned tile
before any butterfly level (singleton runs — width 1, no reduce work),
v=k+1 captures after level k, v=0 never captures.

The words pack fields with *different* index semantics positionally:
a/cap are [row-class, aligned-slot], route_lo/hi are [row-class, out-slot
(−128 for hi)], lanesel/way are [stream-sublane, lane], blk0/blk1 are
[*, stream-sublane] (replicated down sublanes so the shifted field is
directly the staging crossbar's index tile).

Layout invariants the builder enforces (kernel correctness depends on
them):
- stream sublane 127 of every panel is reserved: vals = 0̄ there, so its
  contribs are the ⊕-identity (0̄ is the ⊗-annihilator);
- per (panel, lane) at most 127 entries; each row's per-panel entries form
  ONE run padded to pow2 width w ∈ {1,...,128} at a w-aligned offset, and
  Σ w ≤ 254 per lane (guaranteed: Σ next_pow2(k) ≤ 2·Σ k ≤ 254; width-1
  singleton runs — the bulk on scattered structure — consume exactly one
  slot, so most panels stay within 126 slots and need only ONE align
  tile), so aligned slots 254/255 — tile-2 lanes 126/127 — are never
  captured and lane 126 (of tile 2 when in play, else tile 1, where the
  builder keeps slots 126/127 free) is the default identity route;
- a panel's entries all come from one 16K-column x chunk;
- rows longer than SPLIT_T are pre-split into col-striped overflow pieces
  (consecutive row ids past the padded base space, cycling lanes mod 128 —
  a hub row otherwise digs a deep single-lane pile into every block it
  touches); the pieces are ⊕-combined into the owner row by a tiny
  segment reduce after the sweep.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats.sparse import COO, fold_duplicates, round_up
from sparseharness_tpu.semiring import Semiring
from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret, _np_fold_for

LANES = 128
#: columns per x chunk (one transposed (128,128) tile = 16384 x elements)
CHUNK_COLS = LANES * LANES

# ---- encode-stage wall clocks (SPARSEHARNESS_TPU_ENCODE_TIMINGS=1) ----
# the encode path is a first-class measured surface (just_parser parity,
# app/just_parser.cpp); per-stage attribution drives its optimization
ENCODE_TIMINGS: dict = {}


def _enc_mark(key, t0):
    """Accumulate [t0, now) into ENCODE_TIMINGS[key]; returns now.
    No-ops (returns 0.0) unless the env gate is set."""
    import os
    import time

    if os.environ.get("SPARSEHARNESS_TPU_ENCODE_TIMINGS", "0") != "1":
        return 0.0
    now = time.perf_counter()
    if key is not None:
        ENCODE_TIMINGS[key] = ENCODE_TIMINGS.get(key, 0.0) + now - t0
    return now
#: usable stream sublanes per panel (127; sublane 127 is the identity row)
USABLE = LANES - 1
#: rows per output slab: out tile is (SLAB_ROWS/128, 128), ≤ 256 sublanes
SLAB_ROWS = 2 * LANES * LANES
#: per-(panel,lane) aligned-slot budget (slots 254/255 stay identity)
ALIGN_BUDGET = 254
#: refuse layouts whose packed slots exceed this multiple of nnz. Unlike
#: the dense-tile builders (where blowup means allocating GBs), sell2
#: padding costs bandwidth only — identity slots stream through the
#: crossbars — so the limit is generous; the byte cap below bounds memory.
PAD_BLOWUP_LIMIT = 24.0
#: absolute operand size cap (12 B/slot): refuse > 2 GiB of packed stream
SLOT_BYTE_CAP = 2 << 30
#: rows longer than this split into col-striped overflow pieces
SPLIT_T = 256
#: two-shelf packer: max forward pushes before placing on fresh ground
SHELF_MAX_PUSH = 64
#: two-shelf packer: holes remembered per shelf for backfilling
SHELF_MAX_HOLES = 64
#: two-shelf packer: placements probed inside one hole before giving up
SHELF_HOLE_TRIES = 32
#: chunks whose per-slab 1-way sublane demand is at most this are
#: *virtualized*: their blocks regroup into synthetic xT tiles so tiny
#: segments from many chunks can share panels (a panel prefetches only
#: two xT tiles — on the zipf bench ~45% of slots were chunk-boundary
#: padding from ~30 sub-panel segments per slab). Just under one panel:
#: a chunk above this earns its own tile slots; chunks below it would
#: pack into sub-panel pools whose 2-chunks-per-panel pairing wastes the
#: panel remainder (218→213 panels on the zipf bench vs the old 64).
VIRT_DEMAND_T = 100


class _SlabLayout(NamedTuple):
    row0: int       # first row (multiple of SLAB_ROWS)
    rows: int       # rows covered (multiple of 1024; out tile rows/128×128)
    panels: int     # grid size for this slab's call (0 = empty slab)
    depth: int      # butterfly levels = log2(max run width), ≥ 1
    two_tiles: bool  # any aligned offset > 126 (align tile 2 in play)
    has_hi: bool    # any out slot ≥ 128 (hi route set in play)


@jax.tree_util.register_pytree_node_class
class Sell2Operand:
    """Packed panel streams per row slab + static layout.

    arrays per slab: chunk (P,) i32 scalar-prefetch, wordA (P·128,128) i32,
    wordB (P·128,128) i32, vals (P·128,128).

    ``virt_blocks`` (n_virt, 128) i32, optional: global 128-column block
    ids backing each *virtual chunk* — synthetic xT tiles (ids ≥ n_chunks)
    that dp_sell2 row-gathers from x so that light chunk segments from
    many real chunks can share panels (a panel prefetches only two xT
    tiles, so on scattered structure ~45% of slots were chunk-boundary
    padding before this)."""

    def __init__(self, slabs, layouts: Tuple[_SlabLayout, ...],
                 n_chunks: int, n_rows: int, base_pad: int,
                 piece_owner=None, virt_blocks=None):
        self.slabs = slabs
        self.layouts = layouts
        self.n_chunks = int(n_chunks)
        self.n_rows = int(n_rows)
        # heavy-row splitting: kernel rows [base_pad, base_pad+len(owner))
        # are overflow pieces ⊕-combined into piece_owner after the sweep
        self.base_pad = int(base_pad)
        self.piece_owner = piece_owner
        self.virt_blocks = virt_blocks

    def tree_flatten(self):
        return (self.slabs, self.piece_owner, self.virt_blocks), (
            self.layouts, self.n_chunks, self.n_rows, self.base_pad)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux, piece_owner=children[1],
                   virt_blocks=children[2])


def _next_pow2(k: np.ndarray) -> np.ndarray:
    """Elementwise run width: next pow2 ≥ k (singletons stay width 1 —
    they capture *before* the butterfly, cap level 0)."""
    k = np.maximum(k, 1)
    return (1 << np.ceil(np.log2(k)).astype(np.int64)).astype(np.int64)


def _grouped_exclusive_cumsum(vals: np.ndarray, group_key: np.ndarray):
    """Exclusive cumsum of `vals` restarting at each change of (sorted)
    `group_key`."""
    cum = np.cumsum(vals) - vals
    starts = np.r_[0, 1 + np.nonzero(np.diff(group_key))[0]]
    start_of = np.zeros(len(vals), np.int64)
    start_of[starts] = np.r_[cum[starts][:1], np.diff(cum[starts])]
    return cum - np.cumsum(start_of)


def _twoshelf_pack(cnt: np.ndarray):
    """Two-shelf interval packing of one chunk-pool's block lane
    histograms (cnt: n_blocks × 128) onto stream sublanes.

    The layout carries blk0/blk1 *per sublane* (wordB), so block↔sublane
    binding need not be an all-or-nothing pairing: each block gets one
    contiguous interval of ``demand = max_l cnt[b, l]`` sublanes on one of
    two *shelves* (layers); any sublane is covered by ≤1 interval per
    shelf ⇒ ≤2 bindings, and a heavy block's slack absorbs MANY lighter
    partners instead of exactly one. Blocks are placed by demand
    descending at the shorter shelf's frontier, pushed forward until the
    block's per-lane piles fit the actual free cells (exact occupancy
    bookkeeping); skipped spans are remembered as holes that later
    (smaller) blocks backfill. On the r3 zipf bench this packs 2.285 →
    ~1.89 slots/nnz against the Σdemand/2 two-binding floor of 1.53
    (scripts/probe_sell2_{density,shelves}.py).

    Returns ``(n_sub, bind0, bind1, way, flat_sub)``: per-sublane local
    block ids per shelf (−1 = uncovered), per-block shelf bit, and the
    per-entry sublane ids in (block, lane, pile-pos) order — aligned to
    the exclusive cumsum of ``cnt`` flattened row-major.

    The hot path is `native/fast_mtx.cpp:sell2_twoshelf_pack` (the encode
    layer is native in the reference too, src/sparse_matrix.cpp
    cl_encode); it is bit-identical to the NumPy fallback below by
    construction (same stable order, hole policy, first-free ascending
    placement — tests/test_native.py asserts equality).
    """
    import os

    if os.environ.get("SPARSEHARNESS_TPU_NATIVE", "1") != "0":
        try:
            from sparseharness_tpu.formats import native_io

            return native_io.sell2_pack(
                cnt, SHELF_MAX_PUSH, SHELF_MAX_HOLES, SHELF_HOLE_TRIES)
        except Exception:
            pass    # toolchain unavailable: NumPy fallback below
    demand = cnt.max(axis=1)
    order = np.argsort(-demand, kind="stable")
    order = order[demand[order] > 0]
    cap = int(demand.sum()) + SHELF_MAX_PUSH + 1
    occ = np.zeros((cap, LANES), bool)
    bind = [np.full(cap, -1, np.int64), np.full(cap, -1, np.int64)]
    way = np.zeros(cnt.shape[0], np.int8)
    placements: list = []
    frontier = [0, 0]
    holes: List[List[Tuple[int, int]]] = [[], []]

    def fits(o, d, h):
        return bool(np.all(d - occ[o:o + d].sum(axis=0) >= h))

    def place(bi, sh, o, d, h):
        for l in np.nonzero(h)[0]:
            rows = np.nonzero(~occ[o:o + d, l])[0][: h[l]]
            occ[o + rows, l] = True
            placements.append((bi, l, o + rows))
        bind[sh][o:o + d] = bi
        way[bi] = sh

    for bi in order:
        h = cnt[bi]
        d = int(demand[bi])
        placed = False
        for sh in (0, 1):
            hl = holes[sh]
            for k in range(len(hl)):
                h0, h1 = hl[k]
                if h1 - h0 < d:
                    continue
                o = h0
                tries = 0
                while o + d <= h1 and tries < SHELF_HOLE_TRIES:
                    if fits(o, d, h):
                        break
                    o += 1
                    tries += 1
                else:
                    continue
                place(bi, sh, o, d, h)
                new = []
                if o > h0:
                    new.append((h0, o))
                if o + d < h1:
                    new.append((o + d, h1))
                hl[k:k + 1] = new
                placed = True
                break
            if placed:
                break
        if placed:
            continue
        sh = 0 if frontier[0] <= frontier[1] else 1
        o = frontier[sh]
        pushes = 0
        while pushes < SHELF_MAX_PUSH:
            if fits(o, d, h):
                break
            o += 1
            pushes += 1
        else:
            o = max(frontier[0], frontier[1])   # fresh ground always fits
        if o > frontier[sh] and len(holes[sh]) < SHELF_MAX_HOLES:
            holes[sh].append((frontier[sh], o))
        place(bi, sh, o, d, h)
        frontier[sh] = o + d
    n_sub = max(frontier)
    flat = np.empty(int(cnt.sum()), np.int64)
    pstart = np.zeros(cnt.size + 1, np.int64)
    np.cumsum(cnt.reshape(-1), out=pstart[1:])
    for bi, l, rows in placements:
        s0 = int(pstart[bi * LANES + l])
        flat[s0:s0 + len(rows)] = rows
    return n_sub, bind[0][:n_sub], bind[1][:n_sub], way, flat


def build_sell2(coo: COO, sr: Semiring,
                value_dtype: str = "float32",
                split_calls: bool = True,
                virtual_chunks: bool = True) -> Sell2Operand:
    """Pack a COO matrix into the panel-stream layout (pure NumPy).

    ``split_calls``: bucket each slab's panels by (butterfly depth group,
    two-tile alignment) into separate pallas_calls, so the 60%+ of panels
    on scattered structure whose runs are ALL singletons (depth 0, one
    align tile) skip the butterfly entirely instead of paying the slab's
    worst-case depth × two tiles (VERDICT r2 weak #3). Multiple layouts
    then share a row0; dp_sell2 ⊕-combines their out tiles. The sharded
    builder passes False (its cross-shard layout union needs one call per
    slab index).

    ``virtual_chunks``: regroup blocks of light chunk segments (per-slab
    1-way demand ≤ VIRT_DEMAND_T sublanes) into synthetic xT tiles that
    dp_sell2 row-gathers per SpMV, so they pack densely instead of each
    claiming one of a panel's two tile slots. Banded/local structure has
    no light segments and pays nothing. The sharded builder relies on the
    default True and unions the per-shard gather tables (only
    ``split_calls`` is False there — parallel/sharded_sell.py)."""
    n, c = coo.shape
    _, _, _, _, zero, as_int = _carrier(sr)
    np_dtype = np.int32 if as_int else np.dtype(sr.dtype)
    if not as_int and value_dtype == "bfloat16":
        import ml_dtypes
        store_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        store_dtype = np_dtype
    zero = np.asarray(zero, np_dtype)

    # native encode paths (front sort/fold + per-slab core): bit-identical
    # to the NumPy stages (tests/test_native.py asserts equality), so any
    # native failure just runs the corresponding NumPy stage instead
    import os as _os

    use_native_slab = _os.environ.get("SPARSEHARNESS_TPU_NATIVE", "1") != "0"
    if use_native_slab:
        try:
            from sparseharness_tpu.formats import native_io as _nio

            _nio._load()
        except Exception:
            use_native_slab = False

    _t = _enc_mark(None, 0.0)
    s = None
    if use_native_slab:
        try:
            fold = _np_fold_for(sr, as_int)
            s = _nio.sell2_sort_fold(coo, getattr(fold, "__name__", "add"))
        except Exception:
            s = None
    if s is None:
        coo = fold_duplicates(coo, _np_fold_for(sr, as_int))
        s = coo.sorted_by_row()
    vals_all = s.vals if not as_int else (s.vals != 0).astype(np.int32)
    vals_all = vals_all.astype(np_dtype)
    _t = _enc_mark("fold+rowsort", _t)

    # ---- heavy-row split: stripe rows > SPLIT_T over overflow pieces ----
    base_pad = round_up(max(n, 1), 1024)
    split_done = False
    if use_native_slab:
        try:
            (k_rows, k_cols, k_vals, _owner,
             _npieces) = _nio.sell2_heavy_split(s, vals_all, base_pad,
                                                SPLIT_T)
            piece_owner = _owner if _npieces else None
            n_tot = base_pad + _npieces if _npieces else n
            split_done = True
        except Exception:
            split_done = False
    if not split_done:
        lens = np.bincount(s.rows, minlength=n).astype(np.int64)
        heavy = np.nonzero(lens > SPLIT_T)[0]
        indptr0 = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=indptr0[1:])
    if not split_done and heavy.size:
        p_r = -(-lens[heavy] // SPLIT_T)                # pieces per row
        ov_off = np.cumsum(p_r) - p_r
        n_pieces = int(p_r.sum())
        piece_owner = np.repeat(heavy, p_r).astype(np.int32)
        rank = np.arange(s.nnz, dtype=np.int64) - indptr0[s.rows]
        is_h = lens[s.rows] > SPLIT_T
        hidx = np.searchsorted(heavy, s.rows[is_h])
        # entry j of a heavy row (col-sorted) → piece j % p_r: consecutive
        # piece ids cycle lanes mod 128 and stripe every block's pile
        rows_k_h = base_pad + ov_off[hidx] + rank[is_h] % p_r[hidx]
        n_tot = base_pad + n_pieces
        # final (rows_k, col) order WITHOUT a sort (r5: the lexsort here
        # was 15% of encode): light entries keep their (row, col) order
        # and come first (every piece id ≥ base_pad > any light row);
        # a heavy row of length len striped over p pieces (q = len//p,
        # rr = len%p: pieces 0..rr-1 hold q+1 entries) sends rank r to
        # in-row position (r%p)·q + min(r%p, rr) + r//p — pieces ascend
        # and ranks r%p ≡ j stride col-ascending, exactly the
        # lexsort((cols, rows_k)) order (keys unique after fold)
        rk = rank[is_h]
        pe = p_r[hidx]
        le = lens[s.rows[is_h]]
        qe, rre = le // pe, le % pe
        j = rk % pe
        pos_in_row = j * qe + np.minimum(j, rre) + rk // pe
        hlens = lens[heavy]
        before = (np.cumsum(hlens) - hlens)[hidx]
        n_light = int(s.nnz - is_h.sum())
        target_h = n_light + before + pos_in_row
        k_rows = np.empty(s.nnz, np.int64)
        k_cols = np.empty(s.nnz, np.int64)
        k_vals = np.empty(s.nnz, vals_all.dtype)
        light = ~is_h
        k_rows[:n_light] = s.rows[light]
        k_cols[:n_light] = s.cols[light]
        k_vals[:n_light] = vals_all[light]
        k_rows[target_h] = rows_k_h
        k_cols[target_h] = s.cols[is_h]
        k_vals[target_h] = vals_all[is_h]
    elif not split_done:
        piece_owner = None
        n_tot = n
        k_rows = s.rows.astype(np.int64)
        k_cols = s.cols.astype(np.int64)
        k_vals = vals_all

    _t = _enc_mark("heavy-split", _t)
    n_pad = round_up(max(n_tot, 1), 1024)
    n_chunks = round_up(max(c, 1), CHUNK_COLS) // CHUNK_COLS
    indptr = np.zeros(n_tot + 1, np.int64)
    np.cumsum(np.bincount(k_rows, minlength=n_tot), out=indptr[1:])

    slabs = []
    layouts: List[_SlabLayout] = []
    total_slots = 0
    virt_rows: List[np.ndarray] = []   # per virtual chunk: 128 block ids

    def _blowup_guard(slots, m_):
        if ((slots > PAD_BLOWUP_LIMIT * m_ and slots > (1 << 20))
                or slots * 12 > SLOT_BYTE_CAP):
            raise NotImplementedError(
                f"sell2 padding blowup: {slots} packed slots for "
                f"{m_} nonzeros; use coo_seg/ell"
            )

    # native path: encode slabs on a 2-worker thread pool (the ctypes call
    # releases the GIL). Each job uses a LOCAL virtual-chunk base of
    # n_chunks; virtual ids only ever appear in chunk_of_panel and are
    # order-invariant under a uniform shift, so collection (in slab
    # order) rebases them by the virt count accumulated so far — the
    # result is bit-identical to the sequential NumPy build.
    _futs = {}
    _pool = None
    if use_native_slab:
        import concurrent.futures as _cf

        _pool = _cf.ThreadPoolExecutor(max_workers=2)
        zero_store = np.asarray(zero, store_dtype)
        for r0 in range(0, n_pad, SLAB_ROWS):
            rows_slab = min(SLAB_ROWS, n_pad - r0)
            e0 = int(indptr[min(r0, n_tot)])
            e1 = int(indptr[min(r0 + rows_slab, n_tot)])
            if e1 == e0:
                continue
            _futs[r0] = _pool.submit(
                _nio.sell2_encode_slab,
                k_rows[e0:e1] - r0, k_cols[e0:e1],
                k_vals[e0:e1].astype(store_dtype, copy=False), zero_store,
                n_chunks, n_chunks, rows_slab, virtual_chunks,
                SHELF_MAX_PUSH, SHELF_MAX_HOLES, SHELF_HOLE_TRIES,
                VIRT_DEMAND_T, bucket_order=split_calls)
        _t = _enc_mark("native-submit", _t)

    for r0 in range(0, n_pad, SLAB_ROWS):
        rows_slab = min(SLAB_ROWS, n_pad - r0)
        e0 = int(indptr[min(r0, n_tot)])
        e1 = int(indptr[min(r0 + rows_slab, n_tot)])
        m = e1 - e0
        if m == 0:
            layouts.append(_SlabLayout(r0, rows_slab, 0, 1, False, False))
            slabs.append(None)
            continue
        native_res = None
        if r0 in _futs:
            try:
                native_res = _futs[r0].result()
            except _nio.NativeUnavailable:
                native_res = None   # this slab runs the NumPy body below
        if native_res is not None:
            (wordA, wordB, vals_arr, chunk_of_panel, p_depth_a,
             p_two_a, p_hi_a, vrows, bf_depth, two_tiles, has_hi,
             P) = native_res
            if len(vrows):
                chunk_of_panel = chunk_of_panel.copy()
                chunk_of_panel[chunk_of_panel >= n_chunks] += len(virt_rows)
                for vrow in vrows:
                    virt_rows.append(vrow)
            total_slots += P * LANES * LANES
            _blowup_guard(P * LANES * LANES, m)
            _t = _enc_mark("native-slab", _t)
            if not split_calls:
                slabs.append({
                    "chunk": jnp.asarray(chunk_of_panel),
                    "wordA": jnp.asarray(wordA),
                    "wordB": jnp.asarray(wordB),
                    "vals": jnp.asarray(vals_arr),
                })
                layouts.append(_SlabLayout(
                    r0, rows_slab, P, bf_depth, two_tiles, has_hi))
                _t = _enc_mark("bucket+upload", _t)
                continue
            # panels arrive bucket-ordered from the native fetch
            # (stable, ascending bkey — identical per-bucket arrays to
            # the NumPy wa3[sel] selections), so each call's arrays are
            # CONTIGUOUS slices: no fancy-select temps
            dgrp = np.where(p_depth_a == 0, 0,
                            np.where(p_depth_a <= 2, 1, 2))
            bkey = dgrp * 2 + p_two_a.astype(np.int64)
            bounds = np.flatnonzero(np.diff(bkey)) + 1
            for s0, s1 in zip(np.r_[0, bounds], np.r_[bounds, P]):
                s0, s1 = int(s0), int(s1)
                sl = slice(s0 * LANES, s1 * LANES)
                slabs.append({
                    "chunk": jnp.asarray(chunk_of_panel[s0:s1]),
                    "wordA": jnp.asarray(wordA[sl]),
                    "wordB": jnp.asarray(wordB[sl]),
                    "vals": jnp.asarray(vals_arr[sl]),
                })
                layouts.append(_SlabLayout(
                    r0, rows_slab, s1 - s0,
                    int(p_depth_a[s0:s1].max()),
                    bool(p_two_a[s0:s1].any()),
                    bool(p_hi_a[s0:s1].any()) or rows_slab > 16384,
                ))
            _t = _enc_mark("bucket+upload", _t)
            continue

        rows_e = k_rows[e0:e1] - r0
        cols_e = k_cols[e0:e1]
        vals_e = k_vals[e0:e1]
        lane = rows_e % LANES
        chunk = cols_e // CHUNK_COLS
        blkc = (cols_e % CHUNK_COLS) // LANES
        col_lane = cols_e % LANES
        _t = _enc_mark("slab-slice", _t)

        # ---- virtual chunks -------------------------------------------
        # chunks whose whole-slab 1-way demand is sub-panel fragment the
        # stream (each claims one of a panel's TWO prefetched tile slots);
        # regroup their blocks under synthetic chunk ids — the kernel is
        # untouched, dp_sell2 just appends gathered xT tiles. Light chunks
        # have ≤ VIRT_DEMAND_T blocks by construction (demand ≥ #blocks).
        if virtual_chunks:
            gb = cols_e // LANES                     # global block id
            gbu, gbi = np.unique(gb, return_inverse=True)
            cnt_b = np.zeros((len(gbu), LANES), np.int64)
            np.add.at(cnt_b, (gbi, lane), 1)
            dem_b = cnt_b.max(axis=1)                # per-block demand
            chu = gbu // LANES
            dem_c = np.zeros(int(chu.max()) + 1, np.int64)
            np.add.at(dem_c, chu, dem_b)
            light_b = dem_c[chu] <= VIRT_DEMAND_T
            if np.unique(chu[light_b]).size >= 2:
                lb = np.nonzero(light_b)[0]
                # deal blocks demand-desc round-robin across the pools so
                # every pool gets the full heavy→light spectrum — the
                # two-shelf packer fills heavy blocks' slack with light
                # partners, so segregated pools pack measurably worse
                # (213 vs 210 panels on the zipf bench)
                lb = lb[np.argsort(-dem_b[lb], kind="stable")]
                npools = -(-lb.size // LANES)
                pool_of = np.arange(lb.size) % npools
                lb = lb[np.argsort(pool_of, kind="stable")]
                sizes = np.bincount(pool_of, minlength=npools)
                vid_pool = np.repeat(np.arange(npools), sizes)
                echunk = chu.copy()
                eblk = (gbu % LANES).astype(np.int64)
                echunk[lb] = n_chunks + len(virt_rows) + vid_pool
                eblk[lb] = np.concatenate(
                    [np.arange(c, dtype=np.int64) for c in sizes])
                o = 0
                for c in sizes:
                    row = np.zeros(LANES, np.int32)
                    ids = gbu[lb[o:o + int(c)]]
                    row[: len(ids)] = ids.astype(np.int32)
                    virt_rows.append(row)
                    o += int(c)
                chunk = echunk[gbi]
                blkc = eblk[gbi]

        # ---- phase A packing ------------------------------------------
        # entries sorted (chunk, blk, lane): pool-contiguous, pile order
        _t = _enc_mark("virtual-chunks", _t)
        order = np.lexsort((lane, blkc, chunk))
        och, obl, oln = chunk[order], blkc[order], lane[order]
        _t = _enc_mark("phaseA-sort", _t)

        # per-(chunk, blk) lane histograms
        key_cb = och * LANES + obl
        cb_u, cb_inv = np.unique(key_cb, return_inverse=True)
        ncb = len(cb_u)
        cnt_cbl = np.zeros((ncb, LANES), np.int64)
        np.add.at(cnt_cbl, (cb_inv, oln), 1)
        cb_chunk = cb_u // LANES
        _t = _enc_mark("phaseA-hist", _t)

        # two-shelf interval packing per chunk-pool (see _twoshelf_pack):
        # every sublane carries ≤2 block bindings via its own blk0/blk1
        # fields, so a heavy block's slack absorbs many light partners
        # instead of the r3 all-or-nothing pairing
        pool_ids = np.unique(cb_chunk)
        packs = []
        pool_nsub = np.zeros(len(pool_ids), np.int64)
        for ci, ch in enumerate(pool_ids):
            sel = np.nonzero(cb_chunk == ch)[0]
            pk = _twoshelf_pack(cnt_cbl[sel])
            packs.append((sel,) + pk)
            pool_nsub[ci] = pk[0]
        _t = _enc_mark("pack", _t)

        # chunk-major stream packed CONTIGUOUSLY across chunk boundaries:
        # a panel may mix sublanes from up to TWO chunks (the kernel
        # prefetches two xT tiles per panel; a per-sublane bit selects
        # one), so each pool's segment starts wherever the previous
        # ended. A segment start is bumped to the next panel boundary
        # only when its start panel already touches two chunks.
        seg_start = np.zeros(len(pool_ids), np.int64)
        panel_touch: List[List[int]] = []   # chunks touching each panel
        q = 0
        # lay segments longest-first: long segments leave one mid-panel
        # boundary each for the next segment to continue from, and the
        # sub-half-panel pools pair up 2-per-panel at the end instead of
        # forcing a bump against every long segment's tail
        for ci in np.argsort(-pool_nsub, kind="stable"):
            if pool_nsub[ci] == 0:
                seg_start[ci] = q
                continue
            p0 = q // USABLE
            if p0 < len(panel_touch) and len(panel_touch[p0]) >= 2:
                q = (p0 + 1) * USABLE
            seg_start[ci] = q
            q_end = q + int(pool_nsub[ci])
            for pp in range(q // USABLE, (q_end - 1) // USABLE + 1):
                while len(panel_touch) <= pp:
                    panel_touch.append([])
                panel_touch[pp].append(int(pool_ids[ci]))
            q = q_end
        P = (q + USABLE - 1) // USABLE
        while len(panel_touch) < P:
            panel_touch.append([])
        _t = _enc_mark("segments", _t)

        # per entry: stream slot from the packer's pile placements.
        # Entries within a pool are (blk asc, lane asc, pile-pos) ordered,
        # exactly the placement-scatter order via per-pile start offsets.
        ent_pool = np.searchsorted(pool_ids, cb_chunk)[cb_inv]
        pool_cnt = np.bincount(ent_pool, minlength=len(pool_ids))
        pool_start = np.zeros(len(pool_ids) + 1, np.int64)
        np.cumsum(pool_cnt, out=pool_start[1:])
        g_abs = np.empty(m, np.int64)
        way_e = np.empty(m, np.int8)
        for ci, (sel, n_sub, b0, b1, way_b, flat) in enumerate(packs):
            e0p, e1p = int(pool_start[ci]), int(pool_start[ci + 1])
            g_abs[e0p:e1p] = seg_start[ci] + flat
            lb_e = np.searchsorted(sel, cb_inv[e0p:e1p])
            way_e[e0p:e1p] = way_b[lb_e]
        panel = g_abs // USABLE
        s_sub = g_abs % USABLE
        _t = _enc_mark("slots", _t)

        slots = P * LANES * LANES
        total_slots += slots
        if ((slots > PAD_BLOWUP_LIMIT * m and slots > (1 << 20))
                or slots * 12 > SLOT_BYTE_CAP):
            raise NotImplementedError(
                f"sell2 padding blowup: {slots} packed slots for "
                f"{m} nonzeros in slab@{r0}; use coo_seg/ell"
            )

        # ---- phase B: runs = (panel, row) groups ------------------------
        orow = rows_e[order]
        key_pr = panel * SLAB_ROWS + orow
        order2 = np.argsort(key_pr, kind="stable")
        kpr2 = key_pr[order2]
        rstarts = np.r_[0, 1 + np.nonzero(np.diff(kpr2))[0]]
        rid2 = np.zeros(m, np.int64)
        rid2[rstarts[1:]] = 1
        rid2 = np.cumsum(rid2)
        t_in_run = np.arange(m, dtype=np.int64) - rstarts[rid2]
        n_runs = len(rstarts)
        run_len = np.diff(np.r_[rstarts, m])
        run_panel = panel[order2][rstarts]
        run_row = orow[order2][rstarts]
        run_lane = run_row % LANES
        run_out = run_row // LANES
        run_w = _next_pow2(run_len)
        run_level = np.log2(run_w).astype(np.int32)    # capture level 0..7

        # aligned offsets: per (panel, lane), runs sorted by width desc
        order3 = np.lexsort((-run_w, run_lane, run_panel))
        key_pl3 = run_panel[order3] * LANES + run_lane[order3]
        off3 = _grouped_exclusive_cumsum(run_w[order3], key_pl3)
        if n_runs and int((off3 + run_w[order3]).max()) > ALIGN_BUDGET:
            raise AssertionError("sell2 internal: aligned budget exceeded")
        run_off = np.zeros(n_runs, np.int64)
        run_off[order3] = off3
        bf_depth = int(run_level.max(initial=0))
        # lane 126/127 of the identity-route tile must stay un-captured
        two_tiles = bool((run_off + run_w).max(initial=0) > 126)
        has_hi = bool(run_out.max(initial=0) >= 128) or rows_slab > 16384
        _t = _enc_mark("phaseB-runs", _t)

        # ---- array fills -------------------------------------------------
        vals_arr = np.full((P * LANES, LANES), zero, store_dtype)
        # wordA default: align → identity sublane 127, cap 0 (= never
        # capture), hi route = identity (lane 126 of the last align tile)
        id_tile = 1 if two_tiles else 0
        wordA = np.full(
            (P * LANES, LANES),
            127 | (127 << 7) | (126 << 22) | (id_tile << 29), np.int32)
        # wordB default: lanesel 0, lo route = identity, blk 0, way 0
        wordB = np.full(
            (P * LANES, LANES),
            (126 << 7) | (id_tile << 14), np.int32)
        # two prefetched xT tiles per panel (the ≤2 chunks touching it;
        # single-chunk panels carry the same id twice)
        chunk_of_panel = np.zeros((P, 2), np.int32)
        for pp, touch in enumerate(panel_touch):
            if touch:
                chunk_of_panel[pp, 0] = touch[0]
                chunk_of_panel[pp, 1] = touch[1] if len(touch) > 1 else touch[0]

        flatA = panel * LANES + s_sub                  # stream row index
        vals_arr[flatA, oln] = vals_e[order]
        # lanesel (bits 0-6) + way (bit 29) at [stream-sublane, lane]
        wordB[flatA, oln] |= (col_lane[order].astype(np.int32)
                              | (way_e.astype(np.int32) << 29))
        # blk0/blk1 (bits 22-28 / 15-21) + chunk-select (bit 30) at
        # [*, stream-sublane]: per-sublane shelf bindings from the packer
        # scattered panel-wise (uncovered sublanes keep the identity 0s)
        blk0_of_sub = np.zeros((P, LANES), np.int32)
        blk1_of_sub = np.zeros((P, LANES), np.int32)
        csel_of_sub = np.zeros((P, LANES), np.int32)
        for ci, (sel, n_sub, b0, b1, _w, _flat) in enumerate(packs):
            if n_sub == 0:
                continue
            g = seg_start[ci] + np.arange(n_sub)
            sp_panel = g // USABLE
            sp_sub = g % USABLE
            blks = (cb_u[sel] % LANES).astype(np.int32)
            v0 = np.where(b0 >= 0, blks[np.maximum(b0, 0)], -1)
            v1 = np.where(b1 >= 0, blks[np.maximum(b1, 0)], -1)
            blk0_of_sub[sp_panel, sp_sub] = np.where(
                v0 >= 0, v0, np.maximum(v1, 0))
            blk1_of_sub[sp_panel, sp_sub] = np.where(
                v1 >= 0, v1, np.maximum(v0, 0))
            csel_of_sub[sp_panel, sp_sub] = (
                pool_ids[ci] == chunk_of_panel[sp_panel, 1]
            ).astype(np.int32)
        wordB |= np.repeat(
            ((blk0_of_sub << 22) | (blk1_of_sub << 15)
             | (csel_of_sub << 30))[:, None, :],
            LANES, axis=1).reshape(P * LANES, LANES)

        # align crossbars: aligned slot j of row-class lane ← stream sublane
        j = run_off[rid2] + t_in_run                   # per entry (order2)
        lane2 = lane[order][order2]
        s2 = s_sub[order2]
        p2 = panel[order2]
        lo = j < LANES
        rowA = p2 * LANES + lane2
        # clear the 7-bit default (127) then set: a1 bits 0-6, a2 bits 7-13
        iA1 = (rowA[lo], j[lo])
        wordA[iA1] = (wordA[iA1] & ~np.int32(127)) | s2[lo].astype(np.int32)
        hi = ~lo
        iA2 = (rowA[hi], j[hi] - LANES)
        wordA[iA2] = (wordA[iA2] & ~np.int32(127 << 7)) | (
            s2[hi].astype(np.int32) << 7)

        # capture masks at [row-class, run offset lane]: cap1/cap2 4 bits,
        # stored value = level + 1 (1 = capture the raw aligned tile before
        # the butterfly — singleton runs; 0 = never capture)
        rowR = run_panel * LANES + run_lane
        f_lo = run_off < LANES
        iC1 = (rowR[f_lo], run_off[f_lo])
        wordA[iC1] |= (run_level[f_lo] + 1) << 14
        f_hi = ~f_lo
        iC2 = (rowR[f_hi], run_off[f_hi] - LANES)
        wordA[iC2] |= (run_level[f_hi] + 1) << 18

        # route fields at [row-class, out-slot]: lo (wordB, o<128) and hi
        # (wordA, o≥128); clear the identity default, set the run's node
        route_lane = (run_off % LANES).astype(np.int32)
        route_tile = (run_off // LANES).astype(np.int32)
        o_lo = run_out < LANES
        iRlo = (rowR[o_lo], run_out[o_lo])
        wordB[iRlo] = (wordB[iRlo] & ~np.int32((127 << 7) | (1 << 14))) | (
            (route_lane[o_lo] << 7) | (route_tile[o_lo] << 14))
        o_hi = ~o_lo
        iRhi = (rowR[o_hi], run_out[o_hi] - LANES)
        wordA[iRhi] = (wordA[iRhi] & ~np.int32((127 << 22) | (1 << 29))) | (
            (route_lane[o_hi] << 22) | (route_tile[o_hi] << 29))
        _t = _enc_mark("fills", _t)

        if not split_calls:
            slabs.append({
                "chunk": jnp.asarray(chunk_of_panel),
                "wordA": jnp.asarray(wordA),
                "wordB": jnp.asarray(wordB),
                "vals": jnp.asarray(vals_arr),
            })
            layouts.append(_SlabLayout(
                r0, rows_slab, P, bf_depth, two_tiles, has_hi))
            _t = _enc_mark("bucket+upload", _t)
            continue

        # ---- per-panel call bucketing ----------------------------------
        # panel order is free (the chunk id rides scalar prefetch), so
        # group panels with like static needs: depth groups {0} (pure
        # singletons — no butterfly), {1,2}, {3+}; x alignment tiles {1,2}
        p_depth = np.zeros(P, np.int64)
        np.maximum.at(p_depth, run_panel, run_level.astype(np.int64))
        p_end = np.zeros(P, np.int64)
        np.maximum.at(p_end, run_panel, run_off + run_w)
        p_two = p_end > 126
        p_hi = np.zeros(P, bool)
        np.logical_or.at(p_hi, run_panel, run_out >= LANES)
        dgrp = np.where(p_depth == 0, 0, np.where(p_depth <= 2, 1, 2))
        bkey = dgrp * 2 + p_two.astype(np.int64)
        wa3 = wordA.reshape(P, LANES, LANES)
        wb3 = wordB.reshape(P, LANES, LANES)
        va3 = vals_arr.reshape(P, LANES, LANES)
        for kk in np.unique(bkey):
            sel = np.nonzero(bkey == kk)[0]
            slabs.append({
                "chunk": jnp.asarray(chunk_of_panel[sel]),
                "wordA": jnp.asarray(wa3[sel].reshape(-1, LANES)),
                "wordB": jnp.asarray(wb3[sel].reshape(-1, LANES)),
                "vals": jnp.asarray(va3[sel].reshape(-1, LANES)),
            })
            layouts.append(_SlabLayout(
                r0, rows_slab, len(sel), int(p_depth[sel].max()),
                bool(p_two[sel].any()),
                bool(p_hi[sel].any()) or rows_slab > 16384,
            ))
        _t = _enc_mark("bucket+upload", _t)

    if _pool is not None:
        _pool.shutdown(wait=False)
    nnz = max(coo.nnz, 1)
    if ((total_slots > PAD_BLOWUP_LIMIT * nnz and total_slots > (1 << 20))
            or total_slots * 12 > SLOT_BYTE_CAP):
        raise NotImplementedError(
            f"sell2 padding blowup: {total_slots} packed slots for {nnz} "
            "nonzeros; use coo_seg/ell"
        )
    return Sell2Operand(
        slabs, tuple(layouts), n_chunks, n, base_pad,
        piece_owner=jnp.asarray(piece_owner) if piece_owner is not None
        else None,
        virt_blocks=jnp.asarray(np.stack(virt_rows)) if virt_rows else None,
    )


_SEGMENT_REDUCERS = {
    "add": jax.ops.segment_sum,
    "minimum": jax.ops.segment_min,
    "maximum": jax.ops.segment_max,
}


def _segment_reducer(sr: Semiring, as_int: bool):
    """XLA segment reduction matching the carrier ⊕ (pieces → owner row)."""
    if as_int:
        return jax.ops.segment_max   # bool carrier: ⊕ = max on int32
    return _SEGMENT_REDUCERS[getattr(sr.add, "__name__", "add")]


# ----------------------------------------------------------------- kernel


def _panel_call(slab, lay: _SlabLayout, xT: jax.Array, sr: Semiring,
                as_int: bool):
    """One pallas_call sweeping a slab's panels, ⊕-accumulating the
    (rows/128, 128) out tile in VMEM."""
    _, add, mul, _, zero, _ = _carrier(sr)
    d_out = lay.rows // LANES
    acc_dtype = jnp.int32 if as_int else jnp.dtype(sr.dtype)
    czero = np.asarray(zero, np.int32 if as_int else np.dtype(sr.dtype))

    def kernel(chunk_ref, xTa_ref, xTb_ref, wa_ref, wb_ref, val_ref,
               out_ref):
        p = pl.program_id(0)
        wb = wb_ref[...]
        # staging: y_w[l, s] = xT_c[l, blk_w[s]] where the per-sublane
        # chunk-select bit picks which of the panel's two prefetched xT
        # tiles c is (panels span up to two 16K-column chunks)
        xa = xTa_ref[...]
        xb = xTb_ref[...]
        csel = (wb >> 30) & 1
        b0 = (wb >> 22) & 127
        b1 = (wb >> 15) & 127
        staged0 = jnp.where(
            csel == 0,
            jnp.take_along_axis(xa, b0, axis=1),
            jnp.take_along_axis(xb, b0, axis=1),
        ).T
        staged1 = jnp.where(
            csel == 0,
            jnp.take_along_axis(xa, b1, axis=1),
            jnp.take_along_axis(xb, b1, axis=1),
        ).T
        # phase A: per-way x element crossbars, way select, semiring ⊗
        lanesel = wb & 127
        w0 = jnp.take_along_axis(staged0, lanesel, axis=1)
        w1 = jnp.take_along_axis(staged1, lanesel, axis=1)
        w = jnp.where(((wb >> 29) & 1) == 0, w0, w1)
        vals = val_ref[...]
        if vals.dtype != w.dtype:
            vals = vals.astype(w.dtype)
        contrib = mul(w, vals)
        # phase B: class-major transpose, align crossbars, XOR butterfly.
        # cap value v freezes the tile after level v-1 (v=1 captures the
        # raw aligned tile — singleton runs skip the butterfly entirely)
        wa = wa_ref[...]
        tc = contrib.T
        t1 = jnp.take_along_axis(tc, wa & 127, axis=1)
        cap1 = (wa >> 14) & 15
        f1 = jnp.where(cap1 == 1, t1, jnp.full_like(t1, czero))
        if lay.two_tiles:
            t2 = jnp.take_along_axis(tc, (wa >> 7) & 127, axis=1)
            cap2 = (wa >> 18) & 15
            f2 = jnp.where(cap2 == 1, t2, jnp.full_like(t2, czero))
        iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        for k in range(1, lay.depth + 1):
            idx = iota ^ (1 << (k - 1))
            t1 = add(t1, jnp.take_along_axis(t1, idx, axis=1))
            f1 = jnp.where(cap1 == k + 1, t1, f1)
            if lay.two_tiles:
                t2 = add(t2, jnp.take_along_axis(t2, idx, axis=1))
                f2 = jnp.where(cap2 == k + 1, t2, f2)
        # route: per (row-class, out-slot) read the run's captured value
        q_lo = jnp.take_along_axis(f1, (wb >> 7) & 127, axis=1)
        if lay.two_tiles:
            q2 = jnp.take_along_axis(f2, (wb >> 7) & 127, axis=1)
            q_lo = jnp.where(((wb >> 14) & 1) == 0, q_lo, q2)
        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, czero)

        if lay.has_hi:
            q_hi = jnp.take_along_axis(f1, (wa >> 22) & 127, axis=1)
            if lay.two_tiles:
                q2h = jnp.take_along_axis(f2, (wa >> 22) & 127, axis=1)
                q_hi = jnp.where(((wa >> 29) & 1) == 0, q_hi, q2h)
            # two static-slice stores instead of concat+slice: the r5
            # bucket calibration measured the hi-route path at ~2× its
            # crossbar count (results/sell2_buckets_tpu.json) — the
            # concat materialized both transposed tiles into a third
            lo_rows = min(d_out, LANES)
            out_ref[:lo_rows] = add(out_ref[:lo_rows], q_lo.T[:lo_rows])
            if d_out > LANES:
                out_ref[LANES:] = add(out_ref[LANES:],
                                      q_hi.T[: d_out - LANES])
        else:
            out_ref[...] = add(out_ref[...], q_lo.T[:d_out])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lay.panels,),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda p, c: (c[p, 0], 0)),  # xT A
            pl.BlockSpec((LANES, LANES), lambda p, c: (c[p, 1], 0)),  # xT B
            pl.BlockSpec((LANES, LANES), lambda p, c: (p, 0)),      # wordA
            pl.BlockSpec((LANES, LANES), lambda p, c: (p, 0)),      # wordB
            pl.BlockSpec((LANES, LANES), lambda p, c: (p, 0)),      # vals
        ],
        out_specs=pl.BlockSpec((d_out, LANES), lambda p, c: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_out, LANES), acc_dtype),
        interpret=_interpret(),
    )(slab["chunk"], xT, xT, slab["wordA"], slab["wordB"], slab["vals"])


def dp_sell2(op: Sell2Operand, x: jax.Array, sr: Semiring, *,
             n_rows: int) -> jax.Array:
    """⊕-reduced row dot-products over the padded row space (canonical
    row order: slab tiles flatten row-major)."""
    _, _, _, _, zero, as_int = _carrier(sr)
    acc_dtype = jnp.int32 if as_int else jnp.dtype(sr.dtype)
    c_pad = op.n_chunks * CHUNK_COLS
    x_pad = jnp.pad(
        x.astype(sr.dtype), (0, c_pad - x.shape[0]),
        constant_values=jnp.asarray(sr.zero, sr.dtype),
    )
    if as_int:
        x_pad = x_pad.astype(jnp.int32)
    # xT[k·128 + l, r] = x[k·16384 + r·128 + l]: per-chunk transposed tiles
    xT = x_pad.reshape(op.n_chunks, LANES, LANES).transpose(0, 2, 1)
    xT = xT.reshape(op.n_chunks * LANES, LANES)
    if op.virt_blocks is not None:
        # synthetic tiles for virtualized light segments: row-gather the
        # backing 128-column blocks (128-lane row gathers — the fast
        # XLA gather shape, not the per-element scalar loop) and lay them
        # out like a chunk's transposed tile
        xb = x_pad.reshape(-1, LANES)                # (n_blocks, 128)
        vt = xb[op.virt_blocks]                      # (n_v, 128, 128)
        xT = jnp.concatenate(
            [xT, vt.transpose(0, 2, 1).reshape(-1, LANES)])

    # multiple layouts may share a row0 (split_calls buckets): their out
    # tiles ⊕-combine into one slab result, slabs concatenate row-major
    add = _carrier(sr)[1]
    acc_by_row0: dict = {}
    slab_order = []
    for slab, lay in zip(op.slabs, op.layouts):
        if lay.row0 not in acc_by_row0:
            slab_order.append((lay.row0, lay.rows))
            acc_by_row0[lay.row0] = None
        if lay.panels == 0:
            continue
        tile = _panel_call(slab, lay, xT, sr, as_int).reshape(-1)
        prev = acc_by_row0[lay.row0]
        acc_by_row0[lay.row0] = tile if prev is None else add(prev, tile)
    outs = []
    for r0, rows in slab_order:
        acc = acc_by_row0[r0]
        if acc is None:
            acc = jnp.full((rows,), jnp.asarray(zero, acc_dtype))
        outs.append(acc)
    dp = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    if op.piece_owner is not None:
        # fold heavy-row overflow pieces back into their owner rows
        n_pieces = op.piece_owner.shape[0]
        ov = dp[op.base_pad:op.base_pad + n_pieces]
        add = _carrier(sr)[1]
        seg = _segment_reducer(sr, as_int)(
            ov, op.piece_owner, num_segments=op.base_pad,
            indices_are_sorted=True,
        )
        dp = add(dp[:op.base_pad], seg)
    return dp

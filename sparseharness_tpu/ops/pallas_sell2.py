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

1. **Staging.** Each stream sublane s is bound at build time to one
   128-wide block-row of x inside one 16K-column *chunk*; the chunk's
   transposed tile xT (built once per SpMV by XLA) is block-streamed via a
   scalar-prefetched per-panel chunk id. ``y[l, s] = xT[l, blk[s]]`` is one
   lane crossbar; ``staged = y.T`` puts x rows back sublane-major. No
   scalar row loads (those measure 5.1 Gslot/s — probe 4) and no VMEM cap
   on the x size.
2. **Phase A (contrib).** ``w[s, l] = staged[s, lanesel[s, l]]`` (lane
   crossbar) selects each entry's x element; ``contrib = mul(w, vals)``.
   An entry at slot (s, l) must have ``col // 128 == blk[s]`` and
   ``row % 128 == l`` — the (block, row-lane) histogram packing.
3. **Phase B (row reduce).** ``tc = contrib.T`` makes each row-class
   r%128 a sublane whose 128 lanes are the panel's stream sublanes. Two
   *align* crossbars gather every row's entries into power-of-two-aligned
   runs over 256 virtual slots (two tiles); a 7-level XOR **butterfly**
   ``t_k = add(t_k-1, t_k-1[:, j ^ 2^(k-1)])`` reduces all runs at once —
   after level k every lane uniformly holds the ⊕ of its aligned 2^k
   block, so a width-2^k run is complete at its offset lane at level k,
   where a capture mask freezes it into ``final``. One route crossbar per
   tile then reads, for every output row, its run's captured value. Rows
   with no entries in the panel route to a never-captured lane (identity).
   ``out ⊕= route.T``.

Per-panel HBM traffic is 3 words/slot (vals + two packed index words =
12 B/slot f32, 10 B bf16); all index fields ride two int32 arrays::

  wordA[l, j] = a1 | a2<<7 | cap1<<14 | cap2<<17      (align + capture)
  wordB[u, v] = lanesel | route_lane<<7 | route_tile<<14 | blk<<22

wordB packs three fields with *different* index semantics positionally:
lanesel is [stream-sublane, lane], the route fields are [row-class,
out-slot], blk is [*, stream-sublane] (replicated down sublanes so
``(wb >> 22) & 127`` is directly the staging crossbar's index tile).

Layout invariants the builder enforces (kernel correctness depends on
them):
- stream sublane 127 of every panel is reserved: vals = 0̄ there, so its
  contribs are the ⊕-identity (0̄ is the ⊗-annihilator);
- per (panel, lane) at most 127 entries; each row's per-panel entries form
  ONE run padded to pow2 width w ∈ {2,...,128} at a w-aligned offset, and
  Σ w ≤ 254 per lane (guaranteed: Σ next_pow2(k) ≤ 2·Σ k ≤ 254), so
  aligned slots 254/255 — tile-2 lanes 126/127 — are never captured and
  lane 126 of tile 2 is the default identity route;
- a panel's entries all come from one 16K-column x chunk.
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
#: usable stream sublanes per panel (127; sublane 127 is the identity row)
USABLE = LANES - 1
#: rows per output slab: out tile is (SLAB_ROWS/128, 128)
SLAB_ROWS = LANES * LANES
#: per-(panel,lane) aligned-slot budget (slots 254/255 stay identity)
ALIGN_BUDGET = 254
#: refuse layouts whose packed slots exceed this multiple of nnz
PAD_BLOWUP_LIMIT = 8.0


class _SlabLayout(NamedTuple):
    row0: int       # first row (multiple of SLAB_ROWS)
    rows: int       # rows covered (multiple of 1024; out tile rows/128×128)
    panels: int     # grid size for this slab's call (0 = empty slab)
    depth: int      # butterfly levels = log2(max run width), ≥ 1
    two_tiles: bool  # any aligned offset ≥ 128 (tile 2 in play)


@jax.tree_util.register_pytree_node_class
class Sell2Operand:
    """Packed panel streams per row slab + static layout.

    arrays per slab: chunk (P,) i32 scalar-prefetch, wordA (P·128,128) i32,
    wordB (P·128,128) i32, vals (P·128,128)."""

    def __init__(self, slabs, layouts: Tuple[_SlabLayout, ...],
                 n_chunks: int, n_rows: int):
        self.slabs = slabs
        self.layouts = layouts
        self.n_chunks = int(n_chunks)
        self.n_rows = int(n_rows)

    def tree_flatten(self):
        return (self.slabs,), (self.layouts, self.n_chunks, self.n_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def _next_pow2(k: np.ndarray) -> np.ndarray:
    """Elementwise run width: max(2, next pow2 ≥ k)."""
    k = np.maximum(k, 2)
    return (1 << np.ceil(np.log2(k)).astype(np.int64)).astype(np.int64)


def _grouped_exclusive_cumsum(vals: np.ndarray, group_key: np.ndarray):
    """Exclusive cumsum of `vals` restarting at each change of (sorted)
    `group_key`."""
    cum = np.cumsum(vals) - vals
    starts = np.r_[0, 1 + np.nonzero(np.diff(group_key))[0]]
    start_of = np.zeros(len(vals), np.int64)
    start_of[starts] = np.r_[cum[starts][:1], np.diff(cum[starts])]
    return cum - np.cumsum(start_of)


def build_sell2(coo: COO, sr: Semiring,
                value_dtype: str = "float32") -> Sell2Operand:
    """Pack a COO matrix into the panel-stream layout (pure NumPy)."""
    n, c = coo.shape
    _, _, _, _, zero, as_int = _carrier(sr)
    np_dtype = np.int32 if as_int else np.dtype(sr.dtype)
    if not as_int and value_dtype == "bfloat16":
        import ml_dtypes
        store_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        store_dtype = np_dtype
    zero = np.asarray(zero, np_dtype)

    coo = fold_duplicates(coo, _np_fold_for(sr, as_int))
    s = coo.sorted_by_row()
    vals_all = s.vals if not as_int else (s.vals != 0).astype(np.int32)
    vals_all = vals_all.astype(np_dtype)

    n_pad = round_up(max(n, 1), 1024)
    n_chunks = round_up(max(c, 1), CHUNK_COLS) // CHUNK_COLS
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(s.rows, minlength=n), out=indptr[1:])

    slabs = []
    layouts: List[_SlabLayout] = []
    total_slots = 0
    for r0 in range(0, n_pad, SLAB_ROWS):
        rows_slab = min(SLAB_ROWS, n_pad - r0)
        e0, e1 = int(indptr[min(r0, n)]), int(indptr[min(r0 + rows_slab, n)])
        m = e1 - e0
        if m == 0:
            layouts.append(_SlabLayout(r0, rows_slab, 0, 1, False))
            slabs.append(None)
            continue
        rows_e = s.rows[e0:e1].astype(np.int64) - r0
        cols_e = s.cols[e0:e1].astype(np.int64)
        vals_e = vals_all[e0:e1]

        lane = rows_e % LANES
        chunk = cols_e // CHUNK_COLS
        blkc = (cols_e % CHUNK_COLS) // LANES
        col_lane = cols_e % LANES

        # ---- phase A packing: sublane = (chunk, blk) stack position ----
        # position of each entry within its (chunk, blk, lane) pile
        order = np.lexsort((lane, blkc, chunk))
        och, obl, oln = chunk[order], blkc[order], lane[order]
        key_cbl = (och * LANES + obl) * LANES + oln
        starts = np.r_[0, 1 + np.nonzero(np.diff(key_cbl))[0]]
        gid = np.zeros(m, np.int64)
        gid[starts[1:]] = 1
        gid = np.cumsum(gid)
        pos = np.arange(m, dtype=np.int64) - starts[gid]

        # sublanes per (chunk, blk) = max pile depth over lanes
        key_cb = och * LANES + obl
        cb_u, cb_inv = np.unique(key_cb, return_inverse=True)
        depth_cb = np.zeros(len(cb_u), np.int64)
        np.maximum.at(depth_cb, cb_inv, pos + 1)

        # chunk-major sublane layout with panel-aligned chunk boundaries
        cb_chunk = cb_u // LANES
        ch_u, ch_inv = np.unique(cb_chunk, return_inverse=True)
        sub_in_chunk_off = _grouped_exclusive_cumsum(depth_cb, cb_chunk)
        ch_sub = np.zeros(len(ch_u), np.int64)
        np.add.at(ch_sub, ch_inv, depth_cb)
        ch_panels = (ch_sub + USABLE - 1) // USABLE
        ch_panel_base = np.cumsum(ch_panels) - ch_panels
        P = int(ch_panels.sum())

        # per entry: panel and in-panel sublane
        sub_local = sub_in_chunk_off[cb_inv] + pos      # within its chunk
        panel = ch_panel_base[ch_inv[cb_inv]] + sub_local // USABLE
        s_sub = sub_local % USABLE

        slots = P * LANES * LANES
        total_slots += slots
        if slots > PAD_BLOWUP_LIMIT * m and slots > (1 << 20):
            raise NotImplementedError(
                f"sell2 padding blowup: {slots} packed slots for "
                f"{m} nonzeros in slab@{r0}; use coo_seg/ell"
            )

        # ---- array fills (entry order = `order`) -----------------------
        vals_arr = np.full((P * LANES, LANES), zero, store_dtype)
        # wordA default: align crossbars → identity sublane 127, cap 0
        wordA = np.full((P * LANES, LANES), 127 | (127 << 7), np.int32)
        # wordB default: lanesel 0, route (lane 126, tile 2), blk 0
        wordB = np.full((P * LANES, LANES), (126 << 7) | (1 << 14), np.int32)
        chunk_of_panel = np.zeros(P, np.int32)
        for ci, (base, cnt) in enumerate(zip(ch_panel_base, ch_panels)):
            chunk_of_panel[base:base + cnt] = ch_u[ci]

        flatA = panel * LANES + s_sub                  # stream row index
        vals_arr[flatA, oln] = vals_e[order]
        # lanesel field (bits 0-6) at [stream-sublane, lane]
        wordB[flatA, oln] |= col_lane[order].astype(np.int32)
        # blk field (bits 22-28) at [*, stream-sublane]: replicated down u
        blk_of_sub = np.zeros((P, LANES), np.int32)    # default 0, incl s=127
        blk_of_sub[panel, s_sub] = obl.astype(np.int32)
        wordB |= np.repeat(blk_of_sub[:, None, :], LANES, axis=1).reshape(
            P * LANES, LANES) << 22

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
        run_level = np.log2(run_w).astype(np.int32)    # capture level 1..7

        # aligned offsets: per (panel, lane), runs sorted by width desc
        order3 = np.lexsort((-run_w, run_lane, run_panel))
        key_pl3 = run_panel[order3] * LANES + run_lane[order3]
        off3 = _grouped_exclusive_cumsum(run_w[order3], key_pl3)
        if n_runs and int((off3 + run_w[order3]).max()) > ALIGN_BUDGET:
            raise AssertionError("sell2 internal: aligned budget exceeded")
        run_off = np.zeros(n_runs, np.int64)
        run_off[order3] = off3
        bf_depth = int(run_level.max(initial=1))
        two_tiles = bool((run_off + run_w).max(initial=0) > LANES)

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

        # capture masks at [row-class, run offset lane]: cap1/cap2 3 bits
        rowR = run_panel * LANES + run_lane
        f_lo = run_off < LANES
        iC1 = (rowR[f_lo], run_off[f_lo])
        wordA[iC1] |= run_level[f_lo] << 14
        f_hi = ~f_lo
        iC2 = (rowR[f_hi], run_off[f_hi] - LANES)
        wordA[iC2] |= run_level[f_hi] << 17

        # route fields at [row-class, out-slot]: clear default, set run's
        iR = (rowR, run_out)
        route = (run_off % LANES).astype(np.int32) << 7
        route |= (run_off // LANES).astype(np.int32) << 14
        wordB[iR] = (wordB[iR] & ~np.int32((127 << 7) | (1 << 14))) | route

        slabs.append({
            "chunk": jnp.asarray(chunk_of_panel),
            "wordA": jnp.asarray(wordA),
            "wordB": jnp.asarray(wordB),
            "vals": jnp.asarray(vals_arr),
        })
        layouts.append(_SlabLayout(r0, rows_slab, P, bf_depth, two_tiles))

    nnz = max(coo.nnz, 1)
    if total_slots > PAD_BLOWUP_LIMIT * nnz and total_slots > (1 << 20):
        raise NotImplementedError(
            f"sell2 padding blowup: {total_slots} packed slots for {nnz} "
            "nonzeros; use coo_seg/ell"
        )
    return Sell2Operand(slabs, tuple(layouts), n_chunks, n)


# ----------------------------------------------------------------- kernel


def _panel_call(slab, lay: _SlabLayout, xT: jax.Array, sr: Semiring,
                as_int: bool):
    """One pallas_call sweeping a slab's panels, ⊕-accumulating the
    (rows/128, 128) out tile in VMEM."""
    _, add, mul, _, zero, _ = _carrier(sr)
    d_out = lay.rows // LANES
    acc_dtype = jnp.int32 if as_int else jnp.dtype(sr.dtype)
    czero = np.asarray(zero, np.int32 if as_int else np.dtype(sr.dtype))

    def kernel(chunk_ref, xT_ref, wa_ref, wb_ref, val_ref, out_ref):
        p = pl.program_id(0)
        wb = wb_ref[...]
        # staging: y[l, s] = xT[l, blk[s]]; staged[s, :] = x row blk[s]
        blk = (wb >> 22) & 127
        y = jnp.take_along_axis(xT_ref[...], blk, axis=1)
        staged = y.T
        # phase A: entry x element by lane crossbar, then ⊗ with vals
        lanesel = wb & 127
        w = jnp.take_along_axis(staged, lanesel, axis=1)
        vals = val_ref[...]
        if vals.dtype != staged.dtype:
            vals = vals.astype(staged.dtype)
        contrib = mul(w, vals)
        # phase B: class-major transpose, align crossbars, XOR butterfly
        wa = wa_ref[...]
        tc = contrib.T
        t1 = jnp.take_along_axis(tc, wa & 127, axis=1)
        cap1 = (wa >> 14) & 7
        f1 = jnp.full_like(t1, czero)
        if lay.two_tiles:
            t2 = jnp.take_along_axis(tc, (wa >> 7) & 127, axis=1)
            cap2 = (wa >> 17) & 7
            f2 = jnp.full_like(t2, czero)
        iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        for k in range(1, lay.depth + 1):
            idx = iota ^ (1 << (k - 1))
            t1 = add(t1, jnp.take_along_axis(t1, idx, axis=1))
            f1 = jnp.where(cap1 == k, t1, f1)
            if lay.two_tiles:
                t2 = add(t2, jnp.take_along_axis(t2, idx, axis=1))
                f2 = jnp.where(cap2 == k, t2, f2)
        # route: per (row-class, out-slot) read the run's captured value
        route_lane = (wb >> 7) & 127
        q = jnp.take_along_axis(f1, route_lane, axis=1)
        if lay.two_tiles:
            q2 = jnp.take_along_axis(f2, route_lane, axis=1)
            q = jnp.where(((wb >> 14) & 1) == 0, q, q2)
        acc = q.T[:d_out]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, czero)

        out_ref[...] = add(out_ref[...], acc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lay.panels,),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda p, c: (c[p], 0)),   # xT
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
    )(slab["chunk"], xT, slab["wordA"], slab["wordB"], slab["vals"])


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

    outs = []
    for slab, lay in zip(op.slabs, op.layouts):
        if lay.panels == 0:
            outs.append(jnp.full((lay.rows,), jnp.asarray(zero, acc_dtype)))
            continue
        tile = _panel_call(slab, lay, xT, sr, as_int)
        outs.append(tile.reshape(-1))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

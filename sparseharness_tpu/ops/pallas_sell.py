"""Gen-5 Pallas kernel for ragged/power-law rows: vectorized VMEM gathers.

This is the TPU-native re-design of the reference's ragged 'rsa' kernel
family (`glb-sdp-rsa`, /root/reference/example/kernel5.json; properties
parsed at /root/reference/src/kernel_config.cpp:20-38): CSR-like layouts
with per-row offset+length headers, built for matrices whose row lengths
are power-law distributed so padded-ELL blows up.

The TPU problem with general sparsity is the x gather: XLA's elementwise
gather is a ~1 GB/s scalar loop, and the blocked kernels' dense (8,128)
tiles blow up on scattered nonzeros. The design here rides Mosaic's
``tpu.dynamic_gather`` — a *vectorized VMEM gather* exposed through
``jnp.take_along_axis(src, idx, axis=0/1)`` when ``idx.shape == src.shape``
— with layouts arranged at build time so every gather is exactly one of
the two supported forms:

**Phase A (contrib stream).** Entries are packed column-block-major: each
stream sublane holds up to 128 entries from ONE 128-wide column block of
x, and an entry sits at lane ``row % 128``. Per grid step: one axis-0
gather broadcasts each sublane's x block row (``blocksel``), one axis-1
gather selects each entry's lane within it (``lanesel``), then the
semiring ⊗ with the streamed values: ``contrib = mul(x[col], val)``, all
on the VPU with no scalar loops.

**Phase B (gather-reduce levels).** Every entry of row r lives at lane
``r % 128``, so reducing a row is a *lane-preserving* axis-0 gather: pull
its contrib sublanes into a w-aligned run, ⊕-reduce the run. Rows are
grouped into power-of-two width regions inside ONE index array per level
(static region slicing, no per-bucket calls); rows longer than a run chain
through further levels until one slot remains; the final level's output
positions ARE the canonical row order, so the un-permutation costs
nothing extra.

Constraints (fallback chain handles the rest):
- x must fit VMEM alongside the phase-A tiles: padded cols ≤ 256k (f32).
- matrices are processed in row slabs of ≤ ~400k nnz so the phase-B
  gather source (the contrib stream) fits VMEM per call.
- the column-block packing needs no conflict resolution, but skewed
  (block, row-lane) histograms cost padding; build refuses ≥ 8x blowup.
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
#: max padded x sublanes resident in VMEM during phase A (256k f32 cols = 1MB)
XROWS_MAX = 2048
#: target nonzeros per row slab (phase-B source must fit VMEM)
SLAB_NNZ = 400_000
#: max contrib sublanes per slab (≈ SLAB_NNZ/128 with packing slack)
TB_MAX = 4608
#: run widths per level (pow2); rows longer than W_MAX chain across levels
W_SET = (1, 4, 16, 64)
W_MAX = W_SET[-1]
#: refuse layouts whose packed slots exceed this multiple of nnz
PAD_BLOWUP_LIMIT = 8.0


class _LevelLayout(NamedTuple):
    """Static description of one gather-reduce level (hashable aux data)."""

    regions: Tuple[Tuple[int, int, int], ...]  # (w, sublane_start, sublane_end)
    t_src: int       # padded source sublanes (== idx sublanes)
    d_out: int       # output sublanes (sum of region_rows / w)
    final: bool      # output is the canonical (rows/128, 128) block


class _SlabLayout(NamedTuple):
    row0: int        # first row of the slab (multiple of 128)
    rows: int        # rows covered (multiple of 128)
    t_a: int         # phase-A stream sublanes (multiple of the A-tile rows)
    levels: Tuple[_LevelLayout, ...]


@jax.tree_util.register_pytree_node_class
class SellOperand:
    """Per-slab packed streams + static layout (aux data keys jit caches).

    arrays per slab: lanesel (T_A,128) i32, vals (T_A,128), blocksel
    (T_A,1) i32, idx per level (t_src,128) i32."""

    def __init__(self, slabs, layouts: Tuple[_SlabLayout, ...], xrows: int,
                 n_rows: int):
        self.slabs = slabs            # list of dict-of-arrays pytrees
        self.layouts = layouts
        self.xrows = int(xrows)
        self.n_rows = int(n_rows)

    def tree_flatten(self):
        return (self.slabs,), (self.layouts, self.xrows, self.n_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def _run_width(length: int) -> int:
    for w in W_SET:
        if length <= w:
            return w
    return W_MAX


def build_sell(coo: COO, sr: Semiring, xrows_max: int = XROWS_MAX,
               slab_nnz: int = SLAB_NNZ,
               value_dtype: str = "float32") -> SellOperand:
    import jax as _jax

    if _jax.default_backend() == "tpu":
        # This design rides multi-vreg sublane tpu.dynamic_gather, which
        # this Mosaic build rejects ("Multiple source vregs along gather
        # dimension" — scripts/probe_sell_prims.py maps what IS supported:
        # lane crossbars with minor dim exactly 128, single-vreg sublane
        # gathers, dynamic scalar-indexed VMEM row/slice loads). The
        # crossbar-based redesign is ops/pallas_sell2.py; this v1 kernel
        # remains correct in interpret mode and as design documentation.
        raise NotImplementedError(
            "sell v1 needs multi-vreg dynamic_gather (unsupported by this "
            "Mosaic build); use the 'sell2' variant"
        )
    n, c = coo.shape
    dtype, _, _, _, zero, as_int = _carrier(sr)
    np_dtype = np.int32 if as_int else np.dtype(sr.dtype)
    zero = np.asarray(zero, np_dtype)
    xrows = round_up(max(round_up(max(c, 1), LANES) // LANES, 8), 8)
    if xrows > xrows_max:
        raise NotImplementedError(
            f"sell needs x resident in VMEM: {c} cols > {xrows_max * LANES}"
        )
    coo = fold_duplicates(coo, _np_fold_for(sr, as_int))
    s = coo.sorted_by_row()
    vals = s.vals if not as_int else (s.vals != 0).astype(np.int32)
    vals = vals.astype(np_dtype)
    lens = np.bincount(s.rows, minlength=n).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=indptr[1:])
    if lens.max(initial=0) > slab_nnz:
        raise NotImplementedError("a single row exceeds the slab capacity")

    # ---- row slabs (boundaries multiples of 128, ≤ slab_nnz each) -------
    n_pad = round_up(max(n, 1), LANES)
    slab_bounds: List[Tuple[int, int]] = []
    r0 = 0
    while r0 < n_pad:
        r1 = r0 + LANES
        while r1 < n_pad:
            nxt = r1 + LANES
            if indptr[min(nxt, n)] - indptr[min(r0, n)] > slab_nnz:
                break
            r1 = nxt
        slab_bounds.append((r0, r1))
        r0 = r1

    slabs = []
    layouts = []
    total_slots = 0
    for (r0, r1) in slab_bounds:
        e0, e1 = int(indptr[min(r0, n)]), int(indptr[min(r1, n)])
        rows_e = s.rows[e0:e1]
        cols_e = s.cols[e0:e1]
        vals_e = vals[e0:e1]
        m = e1 - e0

        # ---- phase A packing: sublane ↔ (column block), lane = row%128
        blk = cols_e // LANES
        lane = (rows_e % LANES).astype(np.int64)
        # position of each entry within its (block, lane) group
        order = np.lexsort((lane, blk))
        ob, ol = blk[order], lane[order]
        group = ob * LANES + ol
        grp_starts = np.r_[0, 1 + np.nonzero(np.diff(group))[0]]
        grp_id = np.zeros(m, np.int64)
        grp_id[grp_starts[1:]] = 1
        grp_id = np.cumsum(grp_id)
        pos = np.arange(m, dtype=np.int64) - grp_starts[grp_id]
        # per-block sublane count = max over lanes of group size
        counts = np.zeros((ob.max(initial=0) + 1 if m else 1) * LANES, np.int64)
        np.add.at(counts, group, 1)
        counts2d = counts.reshape(-1, LANES)
        s_per_block = counts2d.max(axis=1)
        blocks_used = np.nonzero(s_per_block)[0]
        block_off = np.zeros(len(s_per_block) + 1, np.int64)
        np.cumsum(s_per_block, out=block_off[1:])
        t_real = int(block_off[-1])
        # A-tile = min(xrows, t_a) sublanes per grid step; t_a must be a
        # multiple of the tile (xrows is 8-aligned by construction)
        t_a = round_up(max(t_real, 8), 8)
        if t_a > xrows:
            t_a = round_up(t_a, xrows)
        if t_a > TB_MAX:
            raise NotImplementedError(
                f"phase-A stream {t_a} sublanes exceeds {TB_MAX}: "
                "(block, lane) histogram too skewed for sell"
            )
        sub = block_off[ob] + pos      # entry sublane in the contrib stream
        lanesel = np.zeros((t_a, LANES), np.int32)
        vals_a = np.full((t_a, LANES), zero, np_dtype)
        blocksel = np.zeros((t_a, 1), np.int32)
        for b in blocks_used:
            blocksel[block_off[b]:block_off[b + 1], 0] = b
        lanesel[sub, ol] = (cols_e[order] % LANES).astype(np.int32)
        vals_a[sub, ol] = vals_e[order]
        total_slots += t_a * LANES

        # ---- phase B: per-row slot lists (contrib sublanes), lane = r%128
        # level 0 sources are the entry sublanes; later levels chain slots
        row_local = rows_e[order] - r0
        slots = [[] for _ in range(r1 - r0)]
        for rl, sb in zip(row_local, sub):
            slots[rl].append(int(sb))

        levels = []
        arrays = {"lanesel": lanesel, "vals": vals_a, "blocksel": blocksel}
        src_sublanes = t_a          # current source row-count (pre padding)
        li = 0
        while True:
            n_slots = [len(sl) for sl in slots]
            done = all(k <= 1 for k in n_slots)
            # region planning: rows grouped by run width; every row emits
            # ceil(k/W) runs of width w = _run_width; final level is the
            # canonical w=1 placement
            if done:
                d_out = (r1 - r0) // LANES
                t_src = max(round_up(src_sublanes + 1, 8), d_out)
                t_src = round_up(t_src, 8)
                idx = np.full((t_src, LANES), t_src - 1, np.int32)
                for rl, sl in enumerate(slots):
                    if sl:
                        idx[rl // LANES, rl % LANES] = sl[0]
                levels.append(_LevelLayout(
                    regions=((1, 0, d_out),), t_src=t_src, d_out=d_out,
                    final=True,
                ))
                arrays[f"idx{li}"] = idx
                total_slots += t_src * LANES
                break

            # runs per row for this level
            runs = []  # (row_local, [slot sublanes])
            for rl, sl in enumerate(slots):
                if not sl:
                    continue
                k = len(sl)
                w = _run_width(k)
                for q in range(0, k, w):
                    runs.append((rl, sl[q:q + w], w))
            # group runs into regions by w; lanes stack independently
            regions = []
            sub_cursor = 0
            for w in W_SET:
                w_runs = [r for r in runs if r[2] == w]
                if not w_runs:
                    continue
                per_lane = np.zeros(LANES, np.int64)
                for (rl, _, _) in w_runs:
                    per_lane[rl % LANES] += 1
                depth = int(per_lane.max())
                # region span a multiple of 8·w so the /w output stays
                # 8-sublane aligned for the concat
                region_rows = round_up(depth * w, 8 * w)
                regions.append((w, sub_cursor, sub_cursor + region_rows))
                sub_cursor += region_rows
            t_idx = max(sub_cursor, 8)
            t_src = round_up(max(src_sublanes + 1, t_idx), 8)
            idx = np.full((t_src, LANES), t_src - 1, np.int32)
            reg_of_w = {w: (start, end) for (w, start, end) in regions}
            out_of_w = {}
            oc = 0
            for (w, start, end) in regions:
                out_of_w[w] = oc
                oc += (end - start) // w
            per_lane = {w: np.zeros(LANES, np.int64) for (w, _, _) in regions}
            new_slots = [[] for _ in range(r1 - r0)]
            for (rl, sl, w) in runs:
                j = rl % LANES
                p = int(per_lane[w][j])
                per_lane[w][j] += 1
                start, _ = reg_of_w[w]
                s0 = start + p * w
                for t, sb in enumerate(sl):
                    idx[s0 + t, j] = sb
                out_slot = out_of_w[w] + p    # output sublane for this run
                new_slots[rl].append(out_slot)
            levels.append(_LevelLayout(
                regions=tuple(regions), t_src=t_src, d_out=oc, final=False,
            ))
            arrays[f"idx{li}"] = idx
            total_slots += t_src * LANES
            slots = new_slots
            src_sublanes = oc
            li += 1

        slabs.append({k: jnp.asarray(v) for k, v in arrays.items()})
        layouts.append(_SlabLayout(
            row0=r0, rows=r1 - r0, t_a=t_a, levels=tuple(levels),
        ))

    nnz = max(coo.nnz, 1)
    if total_slots > PAD_BLOWUP_LIMIT * nnz and total_slots > 1 << 20:
        raise NotImplementedError(
            f"sell padding blowup: {total_slots} packed slots for {nnz} "
            "nonzeros; use coo_seg/ell"
        )
    return SellOperand(slabs, tuple(layouts), xrows, n)


# ----------------------------------------------------------------- kernels


def _phase_a_call(x2d, lanesel, vals_a, blocksel, sr: Semiring, xrows: int,
                  as_int: bool):
    """contrib (T_A,128) = mul(x[col], val) via two dynamic_gathers."""
    t_a = lanesel.shape[0]
    tile = min(xrows, t_a)
    grid = (t_a // tile,)
    _, _, mul, _, _, _ = _carrier(sr)

    def kernel(x_ref, lane_ref, val_ref, blk_ref, out_ref):
        xv = x_ref[...]
        blk = jnp.broadcast_to(blk_ref[...], (tile, LANES))
        z = jnp.take_along_axis(xv, blk, axis=0)       # sublane broadcast
        y = jnp.take_along_axis(z, lane_ref[...], axis=1)  # lane crossbar
        out_ref[...] = mul(y, val_ref[...])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x2d resident
            pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_a, LANES), x2d.dtype),
        interpret=_interpret(),
    )(x2d, lanesel, vals_a, blocksel)


def _level_call(src, idx, level: _LevelLayout, sr: Semiring, as_int: bool):
    """One lane-preserving gather-reduce level: z = src[idx[s,j], j], then
    per-region strided ⊕ over runs of w sublanes."""
    _, add, _, _, _, _ = _carrier(sr)
    t_src, d_out = level.t_src, level.d_out
    zero = jnp.asarray(_carrier(sr)[4], src.dtype)
    pad = t_src - src.shape[0]
    src_p = jnp.pad(src, ((0, pad), (0, 0)), constant_values=zero)

    def kernel(src_ref, idx_ref, out_ref):
        z = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)
        parts = []
        for (w, s0, s1) in level.regions:
            zr = z[s0:s1]
            if w == 1:
                parts.append(zr)
                continue
            acc = zr[0::w]
            for t in range(1, w):
                acc = add(acc, zr[t::w])
            parts.append(acc)
        out_ref[...] = parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_out, LANES), src.dtype),
        interpret=_interpret(),
    )(src_p, idx)


def dp_sell(op: SellOperand, x: jax.Array, sr: Semiring, *,
            n_rows: int) -> jax.Array:
    """⊕-reduced row dot-products over the padded row space (canonical
    row order — the final level's layout IS the un-permutation)."""
    dtype, _, _, _, zero, as_int = _carrier(sr)
    c_pad = op.xrows * LANES
    x_pad = jnp.pad(
        x.astype(sr.dtype), (0, c_pad - x.shape[0]),
        constant_values=jnp.asarray(sr.zero, sr.dtype),
    )
    x2d = x_pad.reshape(op.xrows, LANES)
    if as_int:
        x2d = x2d.astype(jnp.int32)

    outs = []
    for slab, lay in zip(op.slabs, op.layouts):
        contrib = _phase_a_call(
            x2d, slab["lanesel"], slab["vals"], slab["blocksel"], sr,
            op.xrows, as_int,
        )
        src = contrib
        for li, level in enumerate(lay.levels):
            src = _level_call(src, slab[f"idx{li}"], level, sr, as_int)
        outs.append(src.reshape(-1))        # (rows,) canonical order
    dp = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    if as_int:
        dp = dp > 0
    return dp

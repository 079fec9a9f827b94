"""Sharded SpMV/fixpoints whose *local compute is the Pallas band kernel*.

Round-1's sharded path computed each shard's dot-products with an XLA
per-element gather (`sharded._local_dp`) — a ~1 GB/s scalar loop on TPU,
~500x below the single-chip Pallas kernels. This module closes that gap:
the matrix is row-block partitioned across the ``"rows"`` mesh axis and
each shard's chunk is encoded as a *window-local* bsr_band strip array, so
the per-iteration local compute inside ``shard_map`` is exactly
``ops.pallas_bsr_band.dp_bsr_band`` (the 90%-of-HBM-roofline kernel) over
the shard's halo window.

Communication/compute overlap (the north star's "halo exchange overlapped
with local SpMV compute"): each shard's block-row groups are split at build
time into a contiguous *interior* range — groups whose affine x-window
lies entirely inside the shard's own x_local — and *boundary* head/tail
groups that touch the halo. Each step issues the two ring ``ppermute``s
first, then computes the interior dp from x_local alone (no data
dependency on the permutes, so XLA's latency-hiding scheduler runs the
collective-permute during the interior pallas_call), and only the small
head/tail dp waits for the arrived edges.

Solvers are cached by static configuration (mesh, shapes, semiring,
combine fn, convergence) so repeated calls hit one trace — no per-call
retrace (jax.jit keyed on a cached closure).

No counterpart in the single-device reference (SURVEY §2 'Parallelism
strategies — explicit accounting'); the quantitative bar is BASELINE.json's
north star (rows-per-chip at roofline, ≥70% weak scaling).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparseharness_tpu.formats.sparse import COO, fold_duplicates, round_up
from sparseharness_tpu.ops.pallas_bsr import _carrier, _np_fold_for
from sparseharness_tpu.ops.pallas_bsr_band import (
    MAX_WINDOW_BLOCKS, BsrBandOperand, dp_bsr_band,
)
from sparseharness_tpu.parallel import fixcore
from sparseharness_tpu.parallel.mesh import ROWS_AXIS
from sparseharness_tpu.semiring import Semiring


class ShardedBandOperand(NamedTuple):
    """Per-shard window-local band strips, leading axis = device.

    The strips are **pre-split at build time** into the overlap split's
    three static ranges — head boundary groups [0, g_lo), interior groups
    [g_lo, g_hi), tail boundary groups [g_hi, ng) — so each per-iteration
    pallas_call consumes a whole array. Feeding per-iteration *slices* of
    one (D, chunk//bm, bm, k_win*bn) array made XLA materialize a
    near-full copy of the ~250 MB operand every iteration (the
    %slice.24/%slice.25 copies in results/overlap_hlo_tpu.txt — VERDICT r2
    weak #1, measured at 0.30x the plain kernel).

    strips_*: (D, groups*gs, bm, k_win*bn) with gs = bn//bm block-rows per
    group; lane slot k of group g holds the x block at window-local block
    index base(g)+k with base(g) = clip(g + c0, 0, wblocks - k_win).
    Static ints ride along so they key jit caches (NamedTuple fields of
    python ints hash into the closure cache, and the arrays are the only
    traced leaves via the solver's argument structure)."""

    strips_head: jax.Array  # (D, g_lo*gs, bm, k_win*bn) boundary head
    strips_int: jax.Array   # (D, (g_hi-g_lo)*gs, bm, k_win*bn) interior
    strips_tail: jax.Array  # (D, (ng-g_hi)*gs, bm, k_win*bn) boundary tail
    c0: int        # window offset (window-local block units)
    k_win: int     # window width in x blocks
    halo: int      # halo rows each side (multiple of bn)
    chunk: int     # rows per shard (multiple of bn)
    bn: int
    g_lo: int      # first interior group (static)
    g_hi: int      # one past last interior group (static)


def band_arrays(op: "ShardedBandOperand") -> dict:
    """The operand's traced leaves, empty splits dropped (their pallas
    calls are statically absent too — g_lo/g_hi key the solver cache)."""
    d = {}
    if op.strips_head.shape[1]:
        d["head"] = op.strips_head
    if op.strips_int.shape[1]:
        d["interior"] = op.strips_int
    if op.strips_tail.shape[1]:
        d["tail"] = op.strips_tail
    return d


def without_overlap_split(op: ShardedBandOperand) -> ShardedBandOperand:
    """The same operand with the interior/boundary overlap split disabled:
    every group becomes a 'tail' boundary group (g_lo = g_hi = 0), so each
    iteration runs ONE full-window pallas_call that waits for both edge
    ppermutes. The A/B foil for measuring what the split buys/costs
    (VERDICT r2 missing #4)."""
    all_strips = jnp.concatenate(
        [a for a in (op.strips_head, op.strips_int, op.strips_tail)
         if a.shape[1]],
        axis=1,
    )
    empty = all_strips[:, :0]
    return op._replace(
        strips_head=empty, strips_int=empty, strips_tail=all_strips,
        g_lo=0, g_hi=0,
    )


def build_sharded_band(
    coo: COO,
    sr: Semiring,
    n_shards: int,
    bm: int = 8,
    bn: int = 128,
    value_dtype: str = "float32",
    max_window: int = MAX_WINDOW_BLOCKS,
) -> Tuple[ShardedBandOperand, int]:
    """Row-block partition with window-local affine band structure.

    Shard d owns rows [d*chunk, (d+1)*chunk) and an x window
    [d*chunk - halo, (d+1)*chunk + halo); columns are stored window-local.
    Raises NotImplementedError when the matrix is not banded enough for a
    neighbour-only window (halo > chunk, or the affine window exceeds
    MAX_WINDOW_BLOCKS) — callers fall back to the ELL halo/gather paths.
    """
    if bn % bm != 0:
        raise NotImplementedError("sharded band requires bn % bm == 0")
    n = coo.shape[0]
    dtype, _, _, _, zero, as_int = _carrier(sr)
    coo = fold_duplicates(coo, _np_fold_for(sr, as_int))
    # chunk multiple of bn: x_local reshapes into whole bn-blocks and each
    # group (= bn rows = bn/bm block-rows) aligns with one x block
    chunk = round_up(max(-(-n // n_shards), 1), bn)

    starts = (coo.rows // chunk).astype(np.int64) * chunk
    reach_left = int(np.maximum(starts - coo.cols, 0).max()) if coo.nnz else 0
    reach_right = (
        int(np.maximum(coo.cols - (starts + chunk - 1), 0).max()) if coo.nnz else 0
    )
    halo = round_up(max(reach_left, reach_right, 1), bn)
    if halo > chunk:
        raise NotImplementedError(
            f"halo {halo} exceeds chunk {chunk}: matrix is not banded enough "
            "for neighbour-only exchange"
        )

    wblocks = (chunk + 2 * halo) // bn
    ng = chunk // bn                  # groups per shard
    gs = bn // bm                     # block-rows per group
    shard_idx = (coo.rows // chunk).astype(np.int64)
    local_row = coo.rows - shard_idx * chunk
    wcol = coo.cols.astype(np.int64) - shard_idx * chunk + halo  # >= 0
    g = local_row // bn               # local group
    bc = wcol // bn                   # window-local x block

    # global affine window: one (c0, k_win) shared by every shard (SPMD —
    # all shards trace the same program); same derivation as
    # ops.pallas_bsr_band.build_bsr_band but over (shard, group) jointly
    key = shard_idx * ng + g
    n_keys = n_shards * ng
    min_bc = np.full(n_keys, np.iinfo(np.int64).max, np.int64)
    max_bc = np.full(n_keys, -1, np.int64)
    np.minimum.at(min_bc, key, bc)
    np.maximum.at(max_bc, key, bc)
    occupied = max_bc >= 0
    if not occupied.any():
        raise NotImplementedError("empty matrix; use another sharded mode")
    g_of_key = np.arange(n_keys) % ng
    c0 = int(np.min((min_bc - g_of_key)[occupied]))
    base_k = np.clip(g_of_key + c0, 0, None)
    k_win = int(np.max((max_bc - base_k + 1)[occupied]))
    if k_win > max_window:
        raise NotImplementedError(
            f"window of {k_win} x-blocks exceeds {max_window}: "
            "matrix is not banded enough for the sharded band kernel"
        )
    base_k = np.clip(g_of_key + c0, 0, max(wblocks - k_win, 0))
    if np.any(bc < base_k[key]) or np.any(bc >= base_k[key] + k_win):
        k_win += int(np.max(bc - (base_k[key] + k_win - 1)).clip(0))
        if k_win > max_window:
            raise NotImplementedError("edge clamping exceeds window limit")
        base_k = np.clip(g_of_key + c0, 0, max(wblocks - k_win, 0))
        if np.any(bc < base_k[key]) or np.any(bc >= base_k[key] + k_win):
            raise NotImplementedError("window structure not affine enough")

    # interior groups: x-window entirely inside x_local (blocks [h, h+cb));
    # base(g) = clip(g+c0, 0, wb-k) is monotone in g, so the interior is one
    # contiguous static range — the overlap split
    h = halo // bn
    cb = chunk // bn
    base_of_g = np.clip(np.arange(ng) + c0, 0, max(wblocks - k_win, 0))
    interior = (base_of_g >= h) & (base_of_g + k_win <= h + cb)
    if interior.any():
        g_lo = int(np.argmax(interior))
        g_hi = int(ng - np.argmax(interior[::-1]))
    else:
        g_lo = g_hi = 0  # everything is boundary (tiny chunks)

    store_np = np.dtype(sr.dtype) if not as_int else np.int32
    strips = np.full((n_shards, chunk // bm, bm, k_win * bn), zero,
                     dtype=store_np)
    vals = coo.vals if not as_int else (coo.vals != 0).astype(np.int32)
    slot = bc - base_k[key]
    lane = slot * bn + wcol % bn
    strips[shard_idx, local_row // bm, local_row % bm, lane] = (
        vals.astype(strips.dtype)
    )

    store_dtype = dtype
    if value_dtype == "bfloat16" and not as_int and np.issubdtype(
        np.dtype(sr.dtype), np.floating
    ):
        store_dtype = jnp.bfloat16
    # pre-split at the overlap boundaries (block-row units: gs per group)
    i0, i1 = g_lo * gs, g_hi * gs
    return (
        ShardedBandOperand(
            strips_head=jnp.asarray(
                np.ascontiguousarray(strips[:, :i0]), dtype=store_dtype),
            strips_int=jnp.asarray(
                np.ascontiguousarray(strips[:, i0:i1]), dtype=store_dtype),
            strips_tail=jnp.asarray(
                np.ascontiguousarray(strips[:, i1:]), dtype=store_dtype),
            c0=c0, k_win=k_win, halo=halo, chunk=chunk, bn=bn,
            g_lo=g_lo, g_hi=g_hi,
        ),
        chunk,
    )


def _edge_exchange(x_local, halo: int, axis_name: str):
    """(from_left, from_right): the two ring ppermutes of the halo edges.
    Issued before (and independent of) the interior compute so XLA's
    latency-hiding scheduler overlaps the collective-permute with it."""
    d = jax.lax.axis_size(axis_name)
    from_left = jax.lax.ppermute(
        x_local[-halo:], axis_name, [(i, (i + 1) % d) for i in range(d)]
    )
    from_right = jax.lax.ppermute(
        x_local[:halo], axis_name, [(i, (i - 1) % d) for i in range(d)]
    )
    return from_left, from_right


def _local_band_dp(op: ShardedBandOperand, parts_local: dict, x_local,
                   from_left, from_right, sr: Semiring):
    """Per-shard dp via up to three band pallas_calls: interior (x_local
    only, overlappable with the edge ppermutes) + boundary head/tail (full
    window). ``parts_local`` holds the pre-split strip arrays (leading
    device axis already squeezed) — each pallas_call consumes a whole
    array, never a slice. Returns the (chunk,)-length ⊕-clamped dp."""
    bn = op.bn
    h = op.halo // bn
    cb = op.chunk // bn
    ng = cb
    wb = cb + 2 * h
    g_lo, g_hi, k = op.g_lo, op.g_hi, op.k_win
    zero = jnp.asarray(sr.zero, sr.dtype)

    parts = []
    if g_lo > 0 or g_hi < ng:
        window = jnp.concatenate([from_left, x_local, from_right])
    if g_lo > 0:  # head boundary groups [0, g_lo) against the full window
        head_op = BsrBandOperand(parts_local["head"], op.c0, k, wb * bn)
        parts.append(dp_bsr_band(head_op, window, sr, n_rows=g_lo * bn))
    if g_hi > g_lo:  # interior against x_local alone (base shifted by -h)
        int_op = BsrBandOperand(
            parts_local["interior"], op.c0 + g_lo - h, k, cb * bn
        )
        parts.append(
            dp_bsr_band(int_op, x_local, sr, n_rows=(g_hi - g_lo) * bn)
        )
    if g_hi < ng:  # tail boundary groups against the full window
        tail_op = BsrBandOperand(parts_local["tail"], op.c0 + g_hi, k, wb * bn)
        parts.append(dp_bsr_band(tail_op, window, sr, n_rows=(ng - g_hi) * bn))
    dp = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    dp = dp.astype(sr.dtype)
    # ⊕-identity clamp (saturate float overflow on padded slots)
    return sr.add(dp, jnp.full_like(dp, zero))


# --------------------------------------------------------------- solvers
#
# The shard_map/while_loop/psum/cache machinery is parallel/fixcore.py
# (shared with the sell2 mode); only the local dot-product step — ring
# edge exchange + the three band pallas_calls — lives here.


def _static_key(op: ShardedBandOperand, sr: Semiring):
    return (
        op.strips_head.shape, op.strips_int.shape, op.strips_tail.shape,
        str(op.strips_int.dtype),
        op.c0, op.k_win, op.halo, op.chunk, op.bn, op.g_lo, op.g_hi,
        sr.name,
    )


def _band_local_dp(op: ShardedBandOperand, sr: Semiring):
    halo = op.halo

    def local_dp(op_local, x_local):
        from_left, from_right = _edge_exchange(x_local, halo, ROWS_AXIS)
        parts = {k: v[0] for k, v in op_local.items()}
        return _local_band_dp(op, parts, x_local, from_left, from_right, sr)

    return local_dp


def _spmv_solver(mesh: Mesh, op: ShardedBandOperand, sr: Semiring):
    """Cached jitted one-shot dp solver for this (mesh, operand, semiring)
    config — repeated calls return the identical traced closure."""
    return fixcore.make_spmv_solver(
        mesh, band_arrays(op), _band_local_dp(op, sr),
        key=_static_key(op, sr),
    )


def sharded_spmv_band(
    mesh: Mesh,
    op: ShardedBandOperand,
    x: jax.Array,
    sr: Semiring,
    n_rows: int,
) -> jax.Array:
    """One y = A ⊗ x with the Pallas band kernel as each shard's local
    compute and O(halo) ring exchange — the TPU-native sharded SpMV."""
    D = op.strips_int.shape[0]
    r_pad = D * op.chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(x.astype(sr.dtype), (0, r_pad - x.shape[0]),
                    constant_values=zero)
    arrays = band_arrays(op)
    solver = _spmv_solver(mesh, op, sr)
    arrs = fixcore.shard_operand(mesh, arrays)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    return solver(arrs, x_sh)[:n_rows]


def sharded_fixpoint_band(
    mesh: Mesh,
    op: ShardedBandOperand,
    x0: np.ndarray,
    sr: Semiring,
    *,
    n_rows: int,
    combine: Callable,
    exact: bool = True,
    delta: float = 0.0,
    max_iter: int = 10_000,
    norm: bool = False,
    aux0: Optional[np.ndarray] = None,
    aux_update: Optional[Callable] = None,
):
    """Whole fixpoint on-device across the mesh with Pallas-band local
    compute: while_loop inside shard_map, two edge ppermutes per iteration
    (overlapped with the interior pallas_call), psum'd convergence flag.
    Same result contract as sharded.sharded_fixpoint[_halo], including the
    optional per-row aux channel (BFS levels)."""
    from sparseharness_tpu.parallel.sharded import ShardedFixpointResult

    D = op.strips_int.shape[0]
    r_pad = D * op.chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(
        jnp.asarray(x0, dtype=sr.dtype), (0, r_pad - len(x0)),
        constant_values=zero,
    )
    with_aux = aux_update is not None
    if with_aux:
        aux_pad = jnp.pad(jnp.asarray(aux0), (0, r_pad - len(aux0)))
    arrays = band_arrays(op)
    solver = fixcore.make_fixpoint_solver(
        mesh, arrays, _band_local_dp(op, sr),
        combine=combine, exact=exact, delta=delta, max_iter=max_iter,
        norm=norm, with_aux=with_aux, aux_update=aux_update,
        key=_static_key(op, sr),
    )
    arrs = fixcore.shard_operand(mesh, arrays)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    if with_aux:
        aux_sh = jax.device_put(aux_pad, NamedSharding(mesh, P(ROWS_AXIS)))
        x_fin, aux_fin, iters, done = solver(arrs, x_sh, aux_sh)
        return ShardedFixpointResult(
            x=x_fin[:n_rows], iterations=int(iters[0]),
            converged=bool(done[0]), aux=aux_fin[:n_rows],
        )
    x_fin, iters, done = solver(arrs, x_sh)
    return ShardedFixpointResult(
        x=x_fin[:n_rows], iterations=int(iters[0]), converged=bool(done[0])
    )

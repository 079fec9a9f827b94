"""Sharded SpMV/fixpoints whose *local compute is the sell2 crossbar kernel*.

parallel/sharded_band.py gives row-sharded solves Pallas-speed local
compute when the structure is (block-)banded; everything else previously
fell through to the ELL per-element-gather paths (~1 GB/s scalar loop on
TPU). This module closes that gap for the structures band can't take —
power-law/scattered graphs: the matrix is row-block partitioned across the
``"rows"`` mesh axis and each shard's chunk is packed by
``ops.pallas_sell2.build_sell2`` (the chip-validated all-crossbar ragged
kernel, 1434× the ELL path on zipf structure), so the per-iteration local
compute inside ``shard_map`` is exactly ``dp_sell2`` over an all-gathered
x.

Exchange is dense ``all_gather`` (O(n) per step over ICI): scattered
columns reference the whole vector, so there is no O(halo) window to
exploit — that *is* the structural tradeoff vs the band mode, and the
frontier-compressed ``all_to_all`` path (parallel/frontier.py) is the
sparse-iteration alternative. The outer machinery (on-device while_loop,
psum convergence, aux channel, solver cache) is parallel/fixcore.py,
shared with the band mode.

SPMD uniformity: every shard must trace the same program, but per-shard
sell2 layouts naturally differ (panel counts, butterfly depth, tile
flags). The builder unions the static layout across shards (max panels
per slab index / max depth / OR'd tile flags) and pads shards' streams
with identity panels — all-default index words route every output row to
a never-captured lane, so padding panels ⊕-contribute nothing by the same
invariant that makes in-panel padding free.

No counterpart in the single-device reference (SURVEY §2 'Parallelism
strategies — explicit accounting').
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparseharness_tpu.formats.sparse import COO, round_up
from sparseharness_tpu.ops.pallas_bsr import _carrier
from sparseharness_tpu.ops.pallas_sell2 import (
    LANES, Sell2Operand, _SlabLayout, build_sell2, dp_sell2,
)
from sparseharness_tpu.parallel import fixcore
from sparseharness_tpu.parallel.mesh import ROWS_AXIS
from sparseharness_tpu.semiring import Semiring


@jax.tree_util.register_pytree_node_class
class ShardedSellOperand:
    """Per-shard sell2 panel streams, leading axis = device.

    slabs: per slab index, dict of stacked arrays {chunk (D,P), wordA/
    wordB/vals (D, P·128, 128)}; layouts: the unioned static layout
    (identical for every shard — SPMD)."""

    def __init__(self, slabs, piece_owner, layouts: Tuple[_SlabLayout, ...],
                 n_chunks: int, n_cols: int, chunk_rows: int, base_pad: int,
                 n_rows: int, virt_blocks=None):
        self.slabs = slabs
        self.piece_owner = piece_owner   # (D, Q) i32 or None
        self.layouts = layouts
        self.n_chunks = int(n_chunks)
        self.n_cols = int(n_cols)
        self.chunk_rows = int(chunk_rows)
        self.base_pad = int(base_pad)
        self.n_rows = int(n_rows)
        # (D, n_v, 128) i32 or None: per-shard virtual-chunk gather tables
        # (padded with block id 0 — padded tiles are never referenced)
        self.virt_blocks = virt_blocks

    def tree_flatten(self):
        return (self.slabs, self.piece_owner, self.virt_blocks), (
            self.layouts, self.n_chunks, self.n_cols, self.chunk_rows,
            self.base_pad, self.n_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux, virt_blocks=children[2])

    def arrays(self):
        """The traced pytree handed to the sharded solver."""
        tree = {"slabs": self.slabs}
        if self.piece_owner is not None:
            tree["piece_owner"] = self.piece_owner
        if self.virt_blocks is not None:
            tree["virt_blocks"] = self.virt_blocks
        return tree


def _identity_words(two_tiles: bool):
    # keep in sync with ops/pallas_sell2.py wordA/wordB defaults (the
    # cap=0 / identity-route encoding: a1=a2=127, route_hi lane 126)
    id_tile = 1 if two_tiles else 0
    wa = np.int32(127 | (127 << 7) | (126 << 22) | (id_tile << 29))
    wb = np.int32((126 << 7) | (id_tile << 14))
    return wa, wb


def build_sharded_sell(
    coo: COO,
    sr: Semiring,
    n_shards: int,
    value_dtype: str = "float32",
) -> Tuple[ShardedSellOperand, int]:
    """Row-block partition, each shard packed by build_sell2, layouts
    unioned across shards and streams padded with identity panels.

    Raises NotImplementedError when any shard's packing blows the sell2
    padding budget — callers fall back to the ELL halo/gather paths."""
    n, c = coo.shape
    _, _, _, _, zero, as_int = _carrier(sr)
    np_store = np.int32 if as_int else np.dtype(sr.dtype)
    if not as_int and value_dtype == "bfloat16":
        import ml_dtypes
        np_store = np.dtype(ml_dtypes.bfloat16)
    chunk = round_up(max(-(-n // n_shards), 1), 1024)

    shard_idx = (coo.rows // chunk).astype(np.int64)
    ops: List[Sell2Operand] = []
    for d in range(n_shards):
        sel = shard_idx == d
        sub = COO(
            (coo.rows[sel] - d * chunk).astype(np.int32),
            coo.cols[sel], coo.vals[sel], (chunk, c),
        )
        # one call per slab index: the cross-shard layout union below
        # matches slabs positionally, so no per-panel call bucketing
        ops.append(build_sell2(sub, sr, value_dtype=value_dtype,
                               split_calls=False))

    # ---- union the static layouts across shards ------------------------
    S = max(len(op.layouts) for op in ops)
    base_pad = ops[0].base_pad            # = chunk (multiple of 1024)
    layouts: List[_SlabLayout] = []
    for s in range(S):
        ls = [op.layouts[s] for op in ops if s < len(op.layouts)]
        rows = max(l.rows for l in ls)
        panels = max(l.panels for l in ls)
        depth = max(l.depth for l in ls)
        two_tiles = any(l.two_tiles for l in ls)
        has_hi = any(l.has_hi for l in ls) or rows > LANES * LANES
        layouts.append(_SlabLayout(
            s * (2 * LANES * LANES), rows, panels, depth, two_tiles, has_hi))

    q_max = max(
        (0 if op.piece_owner is None else int(op.piece_owner.shape[0]))
        for op in ops
    )

    # ---- stack + identity-pad the streams -------------------------------
    zero_np = np.asarray(zero, np.int32 if as_int else np.dtype(sr.dtype))
    slabs = []
    for s, lay in enumerate(layouts):
        if lay.panels == 0:
            slabs.append(None)
            continue
        wa_id, wb_id = _identity_words(lay.two_tiles)
        P_s = lay.panels
        chunk_ids = np.zeros((n_shards, P_s, 2), np.int32)
        wordA = np.full((n_shards, P_s * LANES, LANES), wa_id, np.int32)
        wordB = np.full((n_shards, P_s * LANES, LANES), wb_id, np.int32)
        vals = np.full((n_shards, P_s * LANES, LANES), zero_np, np_store)
        for d, op in enumerate(ops):
            if s >= len(op.layouts) or op.layouts[s].panels == 0:
                continue
            sd = op.slabs[s]
            p_d = op.layouts[s].panels
            chunk_ids[d, :p_d] = np.asarray(sd["chunk"])
            wordA[d, : p_d * LANES] = np.asarray(sd["wordA"])
            wordB[d, : p_d * LANES] = np.asarray(sd["wordB"])
            vals[d, : p_d * LANES] = np.asarray(sd["vals"])
        slabs.append({
            "chunk": jnp.asarray(chunk_ids),
            "wordA": jnp.asarray(wordA),
            "wordB": jnp.asarray(wordB),
            "vals": jnp.asarray(vals),
        })

    piece_owner = None
    if q_max:
        po = np.zeros((n_shards, q_max), np.int32)
        for d, op in enumerate(ops):
            if op.piece_owner is not None:
                q = int(op.piece_owner.shape[0])
                po[d, :q] = np.asarray(op.piece_owner)
        piece_owner = jnp.asarray(po)

    # union the virtual-chunk gather tables (pad with block id 0 — the
    # padded tiles are gathered but never referenced by any sublane)
    nv_max = max(
        (0 if op.virt_blocks is None else int(op.virt_blocks.shape[0]))
        for op in ops
    )
    virt_blocks = None
    if nv_max:
        vb = np.zeros((n_shards, nv_max, LANES), np.int32)
        for d, op in enumerate(ops):
            if op.virt_blocks is not None:
                vb[d, : op.virt_blocks.shape[0]] = np.asarray(op.virt_blocks)
        virt_blocks = jnp.asarray(vb)

    return (
        ShardedSellOperand(
            slabs, piece_owner, tuple(layouts), ops[0].n_chunks, c,
            chunk, base_pad, n, virt_blocks=virt_blocks,
        ),
        chunk,
    )


def _sell_dp_full(op: ShardedSellOperand, op_local, x_full, sr: Semiring):
    """Per-shard sell2 panel sweep against an already-available full x
    (all-gathered here, or the frontier path's device-local cache)."""
    # rebuild the device-local slab list from the traced pytree
    slabs_l = []
    it = iter(op_local["slabs"])
    for sd in op.slabs:
        if sd is None:
            slabs_l.append(None)
            continue
        loc = next(it)
        slabs_l.append({k: v[0] for k, v in loc.items()})
    po = op_local.get("piece_owner")
    po = po[0] if po is not None else None
    vb = op_local.get("virt_blocks")
    vb = vb[0] if vb is not None else None
    op2 = Sell2Operand(
        slabs_l, op.layouts, op.n_chunks, op.chunk_rows, op.base_pad,
        piece_owner=po, virt_blocks=vb,
    )
    dp = dp_sell2(op2, x_full, sr, n_rows=op.chunk_rows)[: op.chunk_rows]
    dp = dp.astype(sr.dtype)
    zero = jnp.asarray(sr.zero, sr.dtype)
    # ⊕-identity clamp (saturate float overflow on padded slots)
    return sr.add(dp, jnp.full_like(dp, zero))


def _local_sell_dp(op: ShardedSellOperand, op_local, x_local, sr: Semiring):
    """Per-shard dp: all_gather x over ICI, then the sell2 panel sweep."""
    x_full = jax.lax.all_gather(x_local, ROWS_AXIS, tiled=True)[: op.n_cols]
    return _sell_dp_full(op, op_local, x_full, sr)


def _traced_arrays(op: ShardedSellOperand):
    """The solver's traced operand pytree (None slabs dropped)."""
    tree = {"slabs": [sd for sd in op.slabs if sd is not None]}
    if op.piece_owner is not None:
        tree["piece_owner"] = op.piece_owner
    if op.virt_blocks is not None:
        tree["virt_blocks"] = op.virt_blocks
    return tree


def _static_key(op: ShardedSellOperand, sr: Semiring, value_shapes):
    return (
        op.layouts, op.n_chunks, op.n_cols, op.chunk_rows, op.base_pad,
        sr.name, value_shapes,
    )


def _shapes_key(tree):
    return tuple(
        (a.shape, str(a.dtype)) for a in jax.tree_util.tree_leaves(tree)
    )


def sharded_spmv_sell(
    mesh: Mesh,
    op: ShardedSellOperand,
    x: jax.Array,
    sr: Semiring,
    n_rows: int,
) -> jax.Array:
    """One y = A ⊗ x with the sell2 kernel as each shard's local compute."""
    D = len(mesh.devices.flat)
    r_pad = D * op.chunk_rows
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(x.astype(sr.dtype), (0, r_pad - x.shape[0]),
                    constant_values=zero)
    arrays = _traced_arrays(op)
    solver = fixcore.make_spmv_solver(
        mesh, arrays,
        lambda op_local, x_local: _local_sell_dp(op, op_local, x_local, sr),
        key=_static_key(op, sr, _shapes_key(arrays)),
    )
    arrs = fixcore.shard_operand(mesh, arrays)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    return solver(arrs, x_sh)[:n_rows]


def sharded_fixpoint_sell(
    mesh: Mesh,
    op: ShardedSellOperand,
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
    """Whole fixpoint on-device across the mesh with sell2 local compute:
    while_loop inside shard_map, all-gathered x per iteration, psum'd
    convergence flag. Same result contract as sharded.sharded_fixpoint."""
    from sparseharness_tpu.parallel.sharded import ShardedFixpointResult

    D = len(mesh.devices.flat)
    r_pad = D * op.chunk_rows
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(
        jnp.asarray(x0, dtype=sr.dtype), (0, r_pad - len(x0)),
        constant_values=zero,
    )
    with_aux = aux_update is not None
    if with_aux:
        aux_pad = jnp.pad(jnp.asarray(aux0), (0, r_pad - len(aux0)))
    arrays = _traced_arrays(op)
    solver = fixcore.make_fixpoint_solver(
        mesh, arrays,
        lambda op_local, x_local: _local_sell_dp(op, op_local, x_local, sr),
        combine=combine, exact=exact, delta=delta, max_iter=max_iter,
        norm=norm, with_aux=with_aux, aux_update=aux_update,
        key=_static_key(op, sr, _shapes_key(arrays)),
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

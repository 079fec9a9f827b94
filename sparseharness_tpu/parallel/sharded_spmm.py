"""Sharded batched (multi-source) fixpoints whose local compute is the
tile-native SpMM Pallas kernel (ops/spmm_tiles.spmm_bsr_ell).

VERDICT r4 weak #4: ``--roots --mesh`` solves previously always ran the
XLA row-gather ELL SpMM (parallel/sharded._local_dp over 2D x) — the
fallback compute the rest of the mesh layer graduated from. Here the
matrix is row-block partitioned over the 1-D ``"rows"`` mesh, each shard's
chunk rides the gen-2 strip layout (pallas_bsr_ell), and the per-iteration
local compute inside ``shard_map`` is the strip-streaming tile kernel:
one MXU contraction per (row-group, K-chunk) for plus_times, VPU
mul+reduce passes for the other semirings.

Exchange is dense ``all_gather`` of the (chunk, m) X block per iteration
(same tradeoff as the sell mode, parallel/sharded_sell.py: strips address
arbitrary columns, so there is no O(halo) window; multi-source frontier
compression is future scope). The outer machinery (while_loop in
shard_map, psum convergence, aux channel, solver cache) is
parallel/fixcore.py, shared with the band and sell modes.

SPMD uniformity: per-shard K (max blocks per block-row) differs; the
builder unions K and pads shards' strips with identity tiles at block-col
0 — a zero tile ⊗-annihilates whatever x block it gathers, so padding
contributes the ⊕-identity exactly like in-strip padding.

No counterpart in the reference (single-device, single-x —
inc/kernel_utils.h:36; SURVEY §2 parallelism accounting).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparseharness_tpu.formats.sparse import COO, round_up
from sparseharness_tpu.ops.pallas_bsr import _carrier
from sparseharness_tpu.ops.pallas_bsr_ell import BsrEllOperand, build_bsr_ell
from sparseharness_tpu.ops.spmm_tiles import spmm_bsr_ell
from sparseharness_tpu.parallel import fixcore
from sparseharness_tpu.parallel.mesh import ROWS_AXIS
from sparseharness_tpu.semiring import Semiring


@jax.tree_util.register_pytree_node_class
class ShardedSpmmTiles:
    """Per-shard strip operands with a leading device axis.

    tiles: (D, R_blocks, bm, K·bn), tile_cols: (D, R_blocks, K) — K
    unioned across shards (identity-padded)."""

    def __init__(self, tiles, tile_cols, chunk_rows: int, n_cols: int):
        self.tiles = tiles
        self.tile_cols = tile_cols
        self.chunk_rows = int(chunk_rows)
        self.n_cols = int(n_cols)

    def tree_flatten(self):
        return (self.tiles, self.tile_cols), (self.chunk_rows, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def build_sharded_spmm_tiles(coo: COO, sr: Semiring,
                             n_shards: int) -> ShardedSpmmTiles:
    """Row-block partition + per-shard strip build, K unioned.

    Raises NotImplementedError when any shard's strip layout blows up
    (scattered structure) — callers fall back to the halo/gather ELL
    paths exactly like the single-device AUTO_CHAIN."""
    n, c = coo.shape
    bm, bn = 8, 128
    chunk = round_up(max(n, 1), n_shards * bm) // n_shards
    dtype, _, _, _, zero, as_int = _carrier(sr)
    store = np.int32 if as_int else np.dtype(sr.dtype)

    shard_ops = []
    k_max = 1
    order = np.argsort(coo.rows, kind="stable")
    rows_s, cols_s, vals_s = (coo.rows[order], coo.cols[order],
                              coo.vals[order])
    bounds = np.searchsorted(rows_s, np.arange(n_shards + 1) * chunk)
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        local = COO(
            rows=(rows_s[lo:hi] - s * chunk).astype(np.int32),
            cols=cols_s[lo:hi], vals=vals_s[lo:hi],
            shape=(chunk, c),
        )
        if local.nnz == 0:
            shard_ops.append(None)
            continue
        op = build_bsr_ell(coo=local, sr=sr, bm=bm, bn=bn)  # may raise NIE
        shard_ops.append(op)
        k_max = max(k_max, op.tile_cols.shape[1])

    # build_bsr_ell row-pads each shard's block space (slab row groups);
    # union the padded extent too — identity rows cost one strip row each
    r_blocks = max(
        [chunk // bm] + [op.tiles.shape[0] for op in shard_ops
                         if op is not None])
    tiles = np.full((n_shards, r_blocks, bm, k_max * bn),
                    np.asarray(zero, store), store)
    tcols = np.zeros((n_shards, r_blocks, k_max), np.int32)
    for s, op in enumerate(shard_ops):
        if op is None:
            continue
        t = np.asarray(op.tiles)
        cgrid = np.asarray(op.tile_cols)
        rb, _, kbn = t.shape
        k = cgrid.shape[1]
        tiles[s, :rb, :, : k * bn] = t
        tcols[s, :rb, :k] = cgrid
    return ShardedSpmmTiles(
        tiles=jnp.asarray(tiles), tile_cols=jnp.asarray(tcols),
        chunk_rows=chunk, n_cols=c,
    )


def _traced_arrays(op: ShardedSpmmTiles):
    return {"tiles": op.tiles, "cols": op.tile_cols}


def _static_key(op: ShardedSpmmTiles, sr: Semiring):
    return ("spmm_tiles", sr.name, op.chunk_rows, op.n_cols,
            tuple(op.tiles.shape), str(op.tiles.dtype))


def _local_spmm_dp(op: ShardedSpmmTiles, op_local, x_local, sr: Semiring):
    """Per-shard dp: all_gather the (chunk, m) X block, then the strip
    tile-SpMM sweep over this shard's chunk."""
    x_full = jax.lax.all_gather(x_local, ROWS_AXIS, tiled=True)[: op.n_cols]
    local = BsrEllOperand(tiles=op_local["tiles"][0],
                          tile_cols=op_local["cols"][0])
    return spmm_bsr_ell(local, x_full, sr, n_rows=op.chunk_rows)


def sharded_fixpoint_spmm_tiles(
    mesh: Mesh,
    op: ShardedSpmmTiles,
    x0: np.ndarray,            # (n, m)
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
    """Whole batched fixpoint on-device across the mesh with tile-SpMM
    local compute. Same result contract as sharded.sharded_fixpoint."""
    from sparseharness_tpu.parallel.sharded import ShardedFixpointResult

    D = len(mesh.devices.flat)
    r_pad = D * op.chunk_rows
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(
        jnp.asarray(x0, dtype=sr.dtype),
        ((0, r_pad - x0.shape[0]), (0, 0)), constant_values=zero,
    )
    with_aux = aux_update is not None
    if with_aux:
        aux_pad = jnp.pad(jnp.asarray(aux0),
                          ((0, r_pad - len(aux0)), (0, 0)))
    arrays = _traced_arrays(op)
    solver = fixcore.make_fixpoint_solver(
        mesh, arrays,
        lambda op_local, x_local: _local_spmm_dp(op, op_local, x_local, sr),
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

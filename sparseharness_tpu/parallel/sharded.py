"""Explicit SPMD semiring SpMV and fixpoints via shard_map.

The multi-chip design mandated by the north star (BASELINE.json), with no
counterpart in the single-device reference:

- matrix rows block-partitioned across the ``"rows"`` mesh axis — each chip
  owns a contiguous row chunk as a padded ELL shard of identical shape
  (SPMD requires uniform blocks);
- the x vector lives row-sharded between iterations and is **all-gathered
  over ICI** at the top of each step (v1), or ring-``ppermute``d in
  column chunks overlapped with local compute (v2, ring variant);
- fixpoint convergence is an on-device ``psum`` of a changed-flag inside
  the ``lax.while_loop`` — replacing the reference's per-iteration full
  host readback + CPU compare (app/sssp.cpp:129-141) with zero host round
  trips across the whole multi-chip solve.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sparseharness_tpu.formats.sparse import COO, round_up
from sparseharness_tpu.formats.preprocess import pagerank_normalise
from sparseharness_tpu.parallel.mesh import ROWS_AXIS, make_mesh
from sparseharness_tpu.semiring import Semiring, PLUS_TIMES, MIN_PLUS, OR_AND

FLT_MAX = float(np.finfo(np.float32).max)


class ShardedEll(NamedTuple):
    """Per-device padded-ELL shards, leading axis = device.

    cols/vals: (D, chunk_rows, width); column ids are GLOBAL (they index the
    all-gathered x). Pad slots: col 0 / semiring zero."""

    cols: jax.Array
    vals: jax.Array


def build_sharded_ell(
    coo: COO,
    sr: Semiring,
    n_shards: int,
    width_multiple: int = 128,
    row_multiple: int = 8,
) -> Tuple[ShardedEll, int]:
    """Row-block partition: shard d owns rows [d·chunk, (d+1)·chunk).

    All shards share one width (global max row length, padded) so the
    stacked arrays are rectangular. Returns (operand, chunk_rows);
    padded total rows = n_shards * chunk_rows.
    """
    n = coo.shape[0]
    chunk = round_up(max(-(-n // n_shards), 1), row_multiple)
    lengths = coo.row_lengths()
    width = max(
        round_up(max(int(lengths.max()) if len(lengths) else 1, 1), width_multiple),
        width_multiple,
    )
    dtype = np.dtype(sr.dtype)
    zero = np.asarray(sr.zero, dtype)
    cols = np.zeros((n_shards, chunk, width), np.int32)
    vals = np.full((n_shards, chunk, width), zero, dtype)

    s = coo.sorted_by_row()
    # position of each nnz within its row
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(s.rows, minlength=n), out=indptr[1:])
    pos = np.arange(s.nnz, dtype=np.int64) - indptr[s.rows]
    shard_idx = s.rows // chunk
    local_row = s.rows % chunk
    cols[shard_idx, local_row, pos] = s.cols
    vals[shard_idx, local_row, pos] = s.vals.astype(dtype)
    return ShardedEll(cols=jnp.asarray(cols), vals=jnp.asarray(vals)), chunk


def _place(mesh: Mesh, op: ShardedEll) -> ShardedEll:
    sh = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    return ShardedEll(
        cols=jax.device_put(op.cols, sh), vals=jax.device_put(op.vals, sh)
    )


def _local_dp(cols, vals, x_full, sr: Semiring):
    """Per-device dp over the local row chunk; x_full is the gathered
    (D·chunk,)-padded vector, cols index it globally."""
    contrib = sr.mul(x_full[cols], vals)
    dp = sr.add_reduce(contrib, axis=1)
    # ⊕-identity clamp (saturate min_plus overflow, normalize empties)
    return sr.add(dp, jnp.full_like(dp, jnp.asarray(sr.zero, dp.dtype)))


def sharded_spmv(
    mesh: Mesh,
    op: ShardedEll,
    x: jax.Array,
    sr: Semiring,
    n_rows: int,
) -> jax.Array:
    """One y = A ⊗ x with rows sharded and x replicated (all-gather v1).

    x: (n,) logical; returns (n,) row-sharded output (resharded lazily)."""
    D, chunk, _ = op.cols.shape
    r_pad = D * chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(x.astype(sr.dtype), (0, r_pad - x.shape[0]),
                    constant_values=zero)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                  P(ROWS_AXIS)),
        out_specs=P(ROWS_AXIS),
    )
    def run(cols, vals, x_local):
        x_full = jax.lax.all_gather(x_local, ROWS_AXIS, tiled=True)
        return _local_dp(cols[0], vals[0], x_full, sr)

    op = _place(mesh, op)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    out = jax.jit(run)(op.cols, op.vals, x_sh)
    return out[:n_rows]


# ------------------------------------------------------------ halo mode


class HaloEll(NamedTuple):
    """Row-sharded ELL whose columns are *window-local*: shard d's entries
    index into [d·chunk − halo, (d+1)·chunk + halo) — so each fixpoint
    iteration exchanges only the halo edges with ring neighbours via two
    ``ppermute``s instead of all-gathering the whole x. The right design
    when the matrix is (block-)banded so every row's neighbours live within
    ``halo`` of its own chunk; build fails loudly otherwise and callers
    fall back to the all-gather operand."""

    cols: jax.Array  # int32 (D, chunk, width), window-local; pads → 0
    vals: jax.Array  # (D, chunk, width)
    halo: int        # static


def build_sharded_ell_halo(
    coo: COO,
    sr: Semiring,
    n_shards: int,
    width_multiple: int = 128,
    row_multiple: int = 8,
    halo_multiple: int = 8,
) -> Tuple[HaloEll, int]:
    """Like build_sharded_ell but with window-local columns. Raises
    ValueError when the required halo exceeds the chunk size (entries
    reach beyond ring neighbours)."""
    n = coo.shape[0]
    chunk = round_up(max(-(-n // n_shards), 1), row_multiple)
    starts = (coo.rows // chunk).astype(np.int64) * chunk
    reach_left = int(np.maximum(starts - coo.cols, 0).max()) if coo.nnz else 0
    reach_right = (
        int(np.maximum(coo.cols - (starts + chunk - 1), 0).max()) if coo.nnz else 0
    )
    halo = round_up(max(reach_left, reach_right, 1), halo_multiple)
    if halo > chunk:
        raise ValueError(
            f"halo {halo} exceeds chunk {chunk}: matrix is not banded enough "
            "for neighbour-only exchange; use build_sharded_ell (all-gather)"
        )
    lengths = coo.row_lengths()
    width = max(
        round_up(max(int(lengths.max()) if len(lengths) else 1, 1), width_multiple),
        width_multiple,
    )
    dtype = np.dtype(sr.dtype)
    zero = np.asarray(sr.zero, dtype)
    cols = np.zeros((n_shards, chunk, width), np.int32)
    vals = np.full((n_shards, chunk, width), zero, dtype)

    s = coo.sorted_by_row()
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(s.rows, minlength=n), out=indptr[1:])
    pos = np.arange(s.nnz, dtype=np.int64) - indptr[s.rows]
    shard_idx = s.rows // chunk
    local_row = s.rows % chunk
    window_col = s.cols.astype(np.int64) - (shard_idx * chunk - halo)
    cols[shard_idx, local_row, pos] = window_col.astype(np.int32)
    vals[shard_idx, local_row, pos] = s.vals.astype(dtype)
    return (
        HaloEll(cols=jnp.asarray(cols), vals=jnp.asarray(vals), halo=halo),
        chunk,
    )


def _halo_window(x_local, halo: int, axis_name: str):
    """[left-neighbour's right edge | x_local | right-neighbour's left edge]
    via two ring ppermutes (wrap edges are garbage but only ⊗-annihilator
    pad slots reference them)."""
    d = jax.lax.axis_size(axis_name)
    right_edge = x_local[-halo:]
    left_edge = x_local[:halo]
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % d) for i in range(d)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % d) for i in range(d)]
    )
    return jnp.concatenate([from_left, x_local, from_right])


def sharded_spmv_halo(
    mesh: Mesh,
    op: HaloEll,
    x: jax.Array,
    sr: Semiring,
    n_rows: int,
) -> jax.Array:
    """One y = A ⊗ x with halo exchange instead of all-gather: ICI traffic
    is O(halo) per chip, not O(n)."""
    D, chunk, _ = op.cols.shape
    halo = op.halo
    r_pad = D * chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(x.astype(sr.dtype), (0, r_pad - x.shape[0]),
                    constant_values=zero)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                  P(ROWS_AXIS)),
        out_specs=P(ROWS_AXIS),
    )
    def run(cols, vals, x_local):
        window = _halo_window(x_local, halo, ROWS_AXIS)
        return _local_dp(cols[0], vals[0], window, sr)

    sh = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    cols = jax.device_put(op.cols, sh)
    vals = jax.device_put(op.vals, sh)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    return jax.jit(run)(cols, vals, x_sh)[:n_rows]


# --------------------------------------------------------------- fixpoint


@dataclasses.dataclass(frozen=True)
class ShardedFixpointResult:
    x: jax.Array
    iterations: int
    converged: bool
    aux: Optional[jax.Array] = None


def sharded_fixpoint(
    mesh: Mesh,
    op: ShardedEll,
    x0: np.ndarray,
    sr: Semiring,
    *,
    n_rows: int,
    combine: Callable,        # (x_local, dp_local) -> x_new_local
    exact: bool = True,
    delta: float = 0.0,
    max_iter: int = 10_000,
    norm: bool = False,       # L2-normalize x_new globally (eigenvector)
) -> ShardedFixpointResult:
    """Whole fixpoint on-device across the mesh: while_loop inside
    shard_map, all-gather per iteration, psum'd convergence flag."""
    D, chunk, _ = op.cols.shape
    r_pad = D * chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(
        jnp.asarray(x0, dtype=sr.dtype), (0, r_pad - len(x0)),
        constant_values=zero,
    )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                  P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(), P()),
    )
    def solve(cols, vals, x_local):
        cols, vals = cols[0], vals[0]

        def step(x_loc):
            x_full = jax.lax.all_gather(x_loc, ROWS_AXIS, tiled=True)
            dp = _local_dp(cols, vals, x_full, sr)
            x_new = combine(x_loc, dp)
            if norm:
                sq = jax.lax.psum(jnp.sum(x_new.astype(jnp.float32) ** 2),
                                  ROWS_AXIS)
                nrm = jnp.sqrt(sq)
                x_new = jnp.where(nrm > 0, x_new / nrm.astype(x_new.dtype), x_new)
            return x_new

        def local_changed(a, b):
            if exact:
                return jnp.any(a != b)
            return jnp.any(jnp.abs(a - b) >= delta)

        def cond(carry):
            _, it, done = carry
            return jnp.logical_and(~done, it < max_iter)

        def body(carry):
            x_loc, it, _ = carry
            x_new = step(x_loc)
            changed = jax.lax.psum(
                local_changed(x_loc, x_new).astype(jnp.int32), ROWS_AXIS
            )
            return (x_new, it + 1, changed == 0)

        x_fin, iters, done = jax.lax.while_loop(
            cond, body, (x_local, jnp.int32(0), jnp.bool_(False))
        )
        return x_fin, iters[None], done[None]

    op = _place(mesh, op)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    x_fin, iters, done = jax.jit(solve)(op.cols, op.vals, x_sh)
    return ShardedFixpointResult(
        x=x_fin[:n_rows],
        iterations=int(iters[0]),
        converged=bool(done[0]),
    )


def sharded_fixpoint_halo(
    mesh: Mesh,
    op: HaloEll,
    x0: np.ndarray,
    sr: Semiring,
    *,
    n_rows: int,
    combine: Callable,
    exact: bool = True,
    delta: float = 0.0,
    max_iter: int = 10_000,
    norm: bool = False,       # L2-normalize x_new globally (eigenvector)
) -> ShardedFixpointResult:
    """Fixpoint with per-iteration halo exchange: two ring ppermutes of the
    halo edges replace the all-gather — ICI traffic O(halo) per chip per
    iteration, overlapped with local compute by XLA's scheduler. Banded
    operands only (build_sharded_ell_halo)."""
    D, chunk, _ = op.cols.shape
    halo = op.halo
    r_pad = D * chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x_pad = jnp.pad(
        jnp.asarray(x0, dtype=sr.dtype), (0, r_pad - len(x0)),
        constant_values=zero,
    )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                  P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(), P()),
    )
    def solve(cols, vals, x_local):
        cols, vals = cols[0], vals[0]

        def step(x_loc):
            window = _halo_window(x_loc, halo, ROWS_AXIS)
            dp = _local_dp(cols, vals, window, sr)
            x_new = combine(x_loc, dp)
            if norm:
                sq = jax.lax.psum(jnp.sum(x_new.astype(jnp.float32) ** 2),
                                  ROWS_AXIS)
                nrm = jnp.sqrt(sq)
                x_new = jnp.where(nrm > 0, x_new / nrm.astype(x_new.dtype), x_new)
            return x_new

        def local_changed(a, b):
            if exact:
                return jnp.any(a != b)
            return jnp.any(jnp.abs(a - b) >= delta)

        def cond(carry):
            _, it, done = carry
            return jnp.logical_and(~done, it < max_iter)

        def body(carry):
            x_loc, it, _ = carry
            x_new = step(x_loc)
            changed = jax.lax.psum(
                local_changed(x_loc, x_new).astype(jnp.int32), ROWS_AXIS
            )
            return (x_new, it + 1, changed == 0)

        x_fin, iters, done = jax.lax.while_loop(
            cond, body, (x_local, jnp.int32(0), jnp.bool_(False))
        )
        return x_fin, iters[None], done[None]

    sh3 = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    cols = jax.device_put(op.cols, sh3)
    vals = jax.device_put(op.vals, sh3)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    x_fin, iters, done = jax.jit(solve)(cols, vals, x_sh)
    return ShardedFixpointResult(
        x=x_fin[:n_rows], iterations=int(iters[0]), converged=bool(done[0])
    )


def sharded_fixpoint_checkpointed(
    solver: Callable,
    mesh: Mesh,
    op,
    x0: np.ndarray,
    sr: Semiring,
    *,
    n_rows: int,
    combine: Callable,
    ckpt_path: str,
    every: int = 100,
    exact: bool = True,
    delta: float = 0.0,
    max_iter: int = 10_000,
    **solver_kw,
) -> ShardedFixpointResult:
    """Durable long multi-chip solves: run ``solver`` (sharded_fixpoint or
    sharded_fixpoint_halo) in ``every``-iteration chunks, writing (x, total
    iterations) to ``ckpt_path`` after each chunk (atomic rename) and
    resuming from an existing checkpoint on restart — the sharded
    counterpart of algorithms.fixpoint.run_fixpoint_checkpointed, per
    SURVEY §5's 'checkpointing is for long multi-host solves'."""
    import os

    if not ckpt_path.endswith(".npz"):
        ckpt_path += ".npz"
    x = np.asarray(x0)
    total = 0
    if os.path.exists(ckpt_path):
        data = np.load(ckpt_path)
        x = data["x"][:len(x0)]
        total = int(data["iteration"])
    converged = False
    while total < max_iter and not converged:
        res = solver(
            mesh, op, x, sr, n_rows=n_rows, combine=combine, exact=exact,
            delta=delta, max_iter=min(every, max_iter - total), **solver_kw,
        )
        x = np.asarray(res.x)
        total += res.iterations
        converged = res.converged
        tmp = ckpt_path[:-4] + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez(f, x=x, iteration=total)
        os.replace(tmp, ckpt_path)
    return ShardedFixpointResult(
        x=jnp.asarray(x), iterations=total, converged=converged,
    )


# ----------------------------------------------------- algorithm wrappers


def _build_sharded_auto(coo: COO, sr: Semiring, n_shards: int,
                        mode: str = "auto"):
    """(operand, solver): the O(halo)-ICI operand + halo fixpoint when the
    structure permits neighbour-only exchange, else the all-gather pair.

    mode: "auto" (prefer halo, fall back), "halo" (require it — raises
    ValueError when the matrix reaches beyond ring neighbours), "gather".
    Combine with reorder="rcm" on the wrappers: RCM bandwidth reduction is
    what makes general matrices halo-eligible in the first place."""
    if mode not in ("auto", "halo", "gather"):
        raise ValueError(f"unknown sharded mode {mode!r}")
    if mode in ("auto", "halo"):
        try:
            op, _ = build_sharded_ell_halo(coo, sr, n_shards)
            return op, sharded_fixpoint_halo
        except ValueError:
            if mode == "halo":
                raise
    op, _ = build_sharded_ell(coo, sr, n_shards)
    return op, sharded_fixpoint


def _sharded_reorder_pre(coo: COO, reorder, root=None):
    # shared with the single-device apps (algorithms/apps.py); local import
    # keeps parallel/ free of an apps dependency at module load
    from sparseharness_tpu.algorithms.apps import _reorder_pre

    return _reorder_pre(coo, reorder, root)


def _sharded_unpermute(res: ShardedFixpointResult, inv):
    if inv is None:
        return res
    return dataclasses.replace(res, x=jnp.asarray(np.asarray(res.x)[inv]))


def sharded_sssp(coo: COO, root: int, mesh: Optional[Mesh] = None,
                 max_iter: Optional[int] = None, mode: str = "auto",
                 reorder: Optional[str] = None) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, root = _sharded_reorder_pre(coo, reorder, root)
    sr = MIN_PLUS
    op, solver = _build_sharded_auto(coo, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.full(n, FLT_MAX, np.float32)
    x0[root] = 0.0
    res = solver(
        mesh, op, x0, sr, n_rows=n,
        combine=lambda x, dp: jnp.minimum(x, dp),
        exact=True, max_iter=max_iter or n + 1,
    )
    return _sharded_unpermute(res, inv)


def sharded_bfs(coo: COO, root: int, mesh: Optional[Mesh] = None,
                max_iter: Optional[int] = None, mode: str = "auto",
                reorder: Optional[str] = None) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, root = _sharded_reorder_pre(coo, reorder, root)
    sr = OR_AND
    op, solver = _build_sharded_auto(coo, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.zeros(n, bool)
    x0[root] = True
    res = solver(
        mesh, op, x0, sr, n_rows=n,
        combine=lambda x, dp: jnp.logical_or(x, dp),
        exact=True, max_iter=max_iter or n + 1,
    )
    return _sharded_unpermute(res, inv)


def sharded_pagerank(coo: COO, damping: float = 0.85,
                     mesh: Optional[Mesh] = None, delta: float = 1e-6,
                     max_iter: int = 1000, mode: str = "auto",
                     reorder: Optional[str] = None) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, _ = _sharded_reorder_pre(coo, reorder)
    sr = PLUS_TIMES
    damped = pagerank_normalise(coo, damping)
    op, solver = _build_sharded_auto(damped, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.full(n, 1.0 / n, np.float32)
    teleport = np.float32((1.0 - damping) / n)
    res = solver(
        mesh, op, x0, sr, n_rows=n,
        combine=lambda x, dp: dp + teleport,
        exact=False, delta=delta, max_iter=max_iter,
    )
    return _sharded_unpermute(res, inv)


def sharded_scc_forward(coo: COO, mesh: Optional[Mesh] = None,
                        max_iter: Optional[int] = None) -> ShardedFixpointResult:
    """Forward max-label propagation across the mesh (the reference's scc
    pass); full SCC intersects with the transpose pass (algorithms.scc)."""
    from sparseharness_tpu.formats.preprocess import scc_normalise
    from sparseharness_tpu.semiring import MAX_RIGHT

    mesh = mesh or make_mesh()
    sr = MAX_RIGHT
    op, _ = build_sharded_ell(scc_normalise(coo), sr, mesh.devices.size)
    n = coo.shape[0]
    x0 = np.arange(n, dtype=np.int32)
    return sharded_fixpoint(
        mesh, op, x0, sr, n_rows=n,
        combine=lambda x, dp: jnp.maximum(x, dp),
        exact=True, max_iter=max_iter or n + 1,
    )


def sharded_eigenvector(coo: COO, mesh: Optional[Mesh] = None,
                        delta: float = 1e-6,
                        max_iter: int = 1000, mode: str = "auto",
                        reorder: Optional[str] = None) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, _ = _sharded_reorder_pre(coo, reorder)
    sr = PLUS_TIMES
    op, solver = _build_sharded_auto(coo, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.full(n, 1.0 / np.sqrt(n), np.float32)
    res = solver(
        mesh, op, x0, sr, n_rows=n,
        combine=lambda x, dp: dp,
        exact=False, delta=delta, max_iter=max_iter, norm=True,
    )
    return _sharded_unpermute(res, inv)

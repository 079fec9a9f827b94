"""Explicit SPMD semiring SpMV and fixpoints via shard_map.

The multi-chip design mandated by the north star (BASELINE.json), with no
counterpart in the single-device reference:

- matrix rows block-partitioned across the ``"rows"`` mesh axis — each chip
  owns a contiguous row chunk (padded ELL shard, or a window-local Pallas
  band operand — parallel/sharded_band.py — when the structure permits);
- the x vector lives row-sharded between iterations and is **all-gathered
  over ICI** at the top of each step (gather mode), or ring-``ppermute``d
  halo edges overlapped with local compute (halo/band modes);
- fixpoint convergence is an on-device ``psum`` of a changed-flag inside
  the ``lax.while_loop`` — replacing the reference's per-iteration full
  host readback + CPU compare (app/sssp.cpp:129-141) with zero host round
  trips across the whole multi-chip solve.

Solvers are memoized by static configuration so repeated calls reuse one
trace (jax.jit keyed on a cached closure) — no per-call retrace.
"""

from __future__ import annotations

import dataclasses
import hashlib
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
from sparseharness_tpu.parallel.sharded_band import (
    build_sharded_band, sharded_fixpoint_band,
)
from sparseharness_tpu.parallel.sharded_sell import (
    build_sharded_sell, sharded_fixpoint_sell,
)
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
    (D·chunk,)-padded vector — or a (D·chunk, m) block of m right-hand
    sides (batched multi-source SpMM fixpoint), in which case each gather
    fetches a whole m-wide row (the 128-lane-row gather CLAUDE.md calls
    "fast-ish", amortizing the matrix stream across all m sources).

    NOTE: this is the *correctness fallback* for structures the Pallas
    kernels can't take (per-element XLA gather, slow on TPU —
    CLAUDE.md 'Environment gotchas'); bandable matrices route through
    parallel/sharded_band.py instead (mode="auto")."""
    gathered = x_full[cols]              # (rows, W) or (rows, W, m)
    v = vals if gathered.ndim == vals.ndim else vals[..., None]
    contrib = sr.mul(gathered, v)
    dp = sr.add_reduce(contrib, axis=1)
    # ⊕-identity clamp (saturate min_plus overflow, normalize empties)
    return sr.add(dp, jnp.full_like(dp, jnp.asarray(sr.zero, dp.dtype)))


# ------------------------------------------------------------ solver cache


_SOLVER_CACHE: dict = {}


def _mesh_key(mesh: Mesh):
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)


def _cached(key, build: Callable):
    fn = _SOLVER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(build())
        _SOLVER_CACHE[key] = fn
    return fn


# hashable-by-value combine fns (module-level identity keys the caches)


def combine_min(x, dp):
    return jnp.minimum(x, dp)


def combine_max(x, dp):
    return jnp.maximum(x, dp)


def combine_or(x, dp):
    return jnp.logical_or(x, dp)


def combine_keep_dp(x, dp):
    return dp


@dataclasses.dataclass(frozen=True)
class CombineAddConst:
    """dp + const (PageRank teleport) — frozen dataclass so equal constants
    hash equal and the solver cache hits across calls."""

    const: float

    def __call__(self, x, dp):
        return dp + jnp.asarray(self.const, dp.dtype)


def bfs_level_stamp(levels, x_old, x_new, it):
    """Stamp iteration index on newly reached vertices (matches the
    single-device bfs aux, algorithms/apps.py)."""
    newly = jnp.logical_and(x_new, jnp.logical_not(x_old))
    return jnp.where(newly, it + 1, levels)


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

    def build():
        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                      P(ROWS_AXIS)),
            out_specs=P(ROWS_AXIS),
        )
        def run(cols, vals, x_local):
            x_full = jax.lax.all_gather(x_local, ROWS_AXIS, tiled=True)
            return _local_dp(cols[0], vals[0], x_full, sr)

        return run

    key = (_mesh_key(mesh), "spmv", op.cols.shape, str(op.vals.dtype), sr.name)
    op = _place(mesh, op)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    out = _cached(key, build)(op.cols, op.vals, x_sh)
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

    def build():
        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                      P(ROWS_AXIS)),
            out_specs=P(ROWS_AXIS),
        )
        def run(cols, vals, x_local):
            window = _halo_window(x_local, halo, ROWS_AXIS)
            return _local_dp(cols[0], vals[0], window, sr)

        return run

    key = (_mesh_key(mesh), "spmv_halo", op.cols.shape, str(op.vals.dtype),
           sr.name, halo)
    sh = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    cols = jax.device_put(op.cols, sh)
    vals = jax.device_put(op.vals, sh)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, P(ROWS_AXIS)))
    return _cached(key, build)(cols, vals, x_sh)[:n_rows]


# --------------------------------------------------------------- fixpoint


@dataclasses.dataclass(frozen=True)
class ShardedFixpointResult:
    x: jax.Array
    iterations: int
    converged: bool
    aux: Optional[jax.Array] = None


def _run_ell_fixpoint(
    mesh: Mesh,
    op,
    x0: np.ndarray,
    sr: Semiring,
    *,
    halo: Optional[int],      # None → all-gather mode
    n_rows: int,
    combine: Callable,
    exact: bool,
    delta: float,
    max_iter: int,
    norm: bool,
    aux0: Optional[np.ndarray],
    aux_update: Optional[Callable],
) -> ShardedFixpointResult:
    """Shared gather/halo ELL fixpoint: while_loop inside shard_map,
    psum'd convergence flag, optional per-row aux (BFS levels).

    ``x0`` may be (n,) — one source — or (n, m): a block of m sources
    solved in one SpMM fixpoint (rows sharded, source axis replicated),
    the sharded counterpart of algorithms.apps.multi_sssp/multi_bfs."""
    D, chunk, _ = op.cols.shape
    r_pad = D * chunk
    zero = jnp.asarray(sr.zero, sr.dtype)
    x0 = jnp.asarray(x0, dtype=sr.dtype)
    row_pad = ((0, r_pad - x0.shape[0]),) + ((0, 0),) * (x0.ndim - 1)
    x_pad = jnp.pad(x0, row_pad, constant_values=zero)
    xspec = P(ROWS_AXIS, *([None] * (x0.ndim - 1)))
    with_aux = aux_update is not None
    if with_aux:
        aux_pad = jnp.pad(jnp.asarray(aux0), row_pad)

    def build():
        out_specs = (xspec,) * (2 if with_aux else 1) + (P(), P())
        in_specs = (P(ROWS_AXIS, None, None), P(ROWS_AXIS, None, None),
                    xspec) + ((xspec,) if with_aux else ())

        @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
        def solve(cols, vals, x_local, *maybe_aux):
            cols, vals = cols[0], vals[0]

            def dp_of(x_loc):
                if halo is None:
                    xf = jax.lax.all_gather(x_loc, ROWS_AXIS, tiled=True)
                else:
                    xf = _halo_window(x_loc, halo, ROWS_AXIS)
                return _local_dp(cols, vals, xf, sr)

            def step(x_loc):
                x_new = combine(x_loc, dp_of(x_loc))
                if norm:
                    sq = jax.lax.psum(
                        jnp.sum(x_new.astype(jnp.float32) ** 2), ROWS_AXIS
                    )
                    nrm = jnp.sqrt(sq)
                    x_new = jnp.where(
                        nrm > 0, x_new / nrm.astype(x_new.dtype), x_new
                    )
                return x_new

            def local_changed(a, b):
                if exact:
                    return jnp.any(a != b)
                return jnp.any(jnp.abs(a - b) >= delta)

            def cond(carry):
                return jnp.logical_and(~carry[-1], carry[-2] < max_iter)

            def body(carry):
                if with_aux:
                    x_loc, aux, it, _ = carry
                else:
                    x_loc, it, _ = carry
                x_new = step(x_loc)
                changed = jax.lax.psum(
                    local_changed(x_loc, x_new).astype(jnp.int32), ROWS_AXIS
                )
                if with_aux:
                    aux = aux_update(aux, x_loc, x_new, it)
                    return (x_new, aux, it + 1, changed == 0)
                return (x_new, it + 1, changed == 0)

            init = (
                (x_local, maybe_aux[0], jnp.int32(0), jnp.bool_(False))
                if with_aux else (x_local, jnp.int32(0), jnp.bool_(False))
            )
            out = jax.lax.while_loop(cond, body, init)
            if with_aux:
                x_fin, aux_fin, iters, done = out
                return x_fin, aux_fin, iters[None], done[None]
            x_fin, iters, done = out
            return x_fin, iters[None], done[None]

        return solve

    key = (
        _mesh_key(mesh), "fix", op.cols.shape, str(op.vals.dtype), sr.name,
        halo, combine, exact, float(delta), int(max_iter), norm, aux_update,
        str(aux_pad.dtype) if with_aux else None, x_pad.shape[1:],
    )
    sh3 = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    cols = jax.device_put(op.cols, sh3)
    vals = jax.device_put(op.vals, sh3)
    x_sh = jax.device_put(x_pad, NamedSharding(mesh, xspec))
    solver = _cached(key, build)
    if with_aux:
        aux_sh = jax.device_put(aux_pad, NamedSharding(mesh, xspec))
        x_fin, aux_fin, iters, done = solver(cols, vals, x_sh, aux_sh)
        return ShardedFixpointResult(
            x=x_fin[:n_rows], iterations=int(iters[0]),
            converged=bool(done[0]), aux=aux_fin[:n_rows],
        )
    x_fin, iters, done = solver(cols, vals, x_sh)
    return ShardedFixpointResult(
        x=x_fin[:n_rows], iterations=int(iters[0]), converged=bool(done[0])
    )


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
    aux0: Optional[np.ndarray] = None,
    aux_update: Optional[Callable] = None,
) -> ShardedFixpointResult:
    """Whole fixpoint on-device across the mesh: while_loop inside
    shard_map, all-gather per iteration, psum'd convergence flag."""
    return _run_ell_fixpoint(
        mesh, op, x0, sr, halo=None, n_rows=n_rows, combine=combine,
        exact=exact, delta=delta, max_iter=max_iter, norm=norm,
        aux0=aux0, aux_update=aux_update,
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
    norm: bool = False,
    aux0: Optional[np.ndarray] = None,
    aux_update: Optional[Callable] = None,
) -> ShardedFixpointResult:
    """Fixpoint with per-iteration halo exchange: two ring ppermutes of the
    halo edges replace the all-gather — ICI traffic O(halo) per chip per
    iteration. Banded operands only (build_sharded_ell_halo). For the
    Pallas-kernel local compute with exchange/compute *overlap*, see
    parallel/sharded_band.py (mode="band"/"auto" on the wrappers)."""
    return _run_ell_fixpoint(
        mesh, op, x0, sr, halo=op.halo, n_rows=n_rows, combine=combine,
        exact=exact, delta=delta, max_iter=max_iter, norm=norm,
        aux0=aux0, aux_update=aux_update,
    )


def _fingerprint(x0: np.ndarray, op) -> str:
    """Problem fingerprint for checkpoint validation: shape of the operand,
    length and content-hash of x0 — refuses resuming a checkpoint written
    for a different matrix/root (ADVICE r1)."""
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(x0)).tobytes())
    shapes = tuple(
        tuple(a.shape) for a in jax.tree_util.tree_leaves(op)
        if hasattr(a, "shape")
    )
    return f"{len(x0)}|{shapes}|{h.hexdigest()}"


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
    keep_on_converged: bool = False,
    **solver_kw,
) -> ShardedFixpointResult:
    """Durable long multi-chip solves: run ``solver`` (sharded_fixpoint or
    sharded_fixpoint_halo) in ``every``-iteration chunks, writing (x, total
    iterations, problem fingerprint) to ``ckpt_path`` after each chunk
    (atomic rename) and resuming from an existing checkpoint on restart —
    the sharded counterpart of algorithms.fixpoint.run_fixpoint_checkpointed,
    per SURVEY §5's 'checkpointing is for long multi-host solves'.

    A checkpoint whose fingerprint doesn't match this (x0, operand) raises
    ValueError instead of silently truncating; the checkpoint is removed
    once the solve converges (pass keep_on_converged=True to keep it)."""
    import os

    if not ckpt_path.endswith(".npz"):
        ckpt_path += ".npz"
    x = np.asarray(x0)
    fp = _fingerprint(x0, op)
    total = 0
    if os.path.exists(ckpt_path):
        data = np.load(ckpt_path, allow_pickle=False)
        stored = str(data["fingerprint"]) if "fingerprint" in data else None
        if stored != fp:
            raise ValueError(
                f"checkpoint {ckpt_path} belongs to a different problem "
                f"(fingerprint {stored!r} != {fp!r}); remove it or use a "
                "different ckpt_path"
            )
        x = data["x"][: len(x0)]
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
            np.savez(f, x=x, iteration=total, fingerprint=fp)
        os.replace(tmp, ckpt_path)
    if converged and not keep_on_converged and os.path.exists(ckpt_path):
        os.remove(ckpt_path)
    return ShardedFixpointResult(
        x=jnp.asarray(x), iterations=total, converged=converged,
    )


# ----------------------------------------------------- algorithm wrappers


def _build_sharded_auto(coo: COO, sr: Semiring, n_shards: int,
                        mode: str = "auto"):
    """(operand, solver): the best TPU path the structure permits.

    Preference order for "auto": the Pallas band operand (roofline local
    compute + O(halo) ICI + exchange/compute overlap), then the Pallas
    sell2 operand (crossbar ragged kernel + all-gathered x — the
    power-law/scattered path, ~700× the ELL gather), then the halo-ELL
    gather fallback (O(halo) ICI, XLA-gather compute), then the all-gather
    ELL fallback (any structure). mode: "auto", "band" (require the Pallas
    band path — raises NotImplementedError otherwise), "sell" (require the
    Pallas sell2 path), "halo" (require neighbour-only exchange — raises
    ValueError otherwise), "gather". Combine with reorder="rcm" on the
    wrappers: RCM bandwidth reduction is what makes general matrices
    band/halo-eligible in the first place."""
    if mode not in ("auto", "band", "sell", "halo", "gather"):
        raise ValueError(f"unknown sharded mode {mode!r}")
    if mode in ("auto", "band"):
        try:
            op, _ = build_sharded_band(coo, sr, n_shards)
            return op, sharded_fixpoint_band
        except NotImplementedError:
            if mode == "band":
                raise
    if mode in ("auto", "sell"):
        try:
            op, _ = build_sharded_sell(coo, sr, n_shards)
            return op, sharded_fixpoint_sell
        except NotImplementedError:
            if mode == "sell":
                raise
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
    aux = None if res.aux is None else jnp.asarray(np.asarray(res.aux)[inv])
    return dataclasses.replace(
        res, x=jnp.asarray(np.asarray(res.x)[inv]), aux=aux
    )


def sharded_sssp(coo: COO, root: int, mesh: Optional[Mesh] = None,
                 max_iter: Optional[int] = None, mode: str = "auto",
                 reorder: Optional[str] = None,
                 return_solver: bool = False) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, root = _sharded_reorder_pre(coo, reorder, root)
    sr = MIN_PLUS
    op, solver = _build_sharded_auto(coo, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.full(n, FLT_MAX, np.float32)
    x0[root] = 0.0
    # default cap = n sweeps, matching apps.sssp and gold.sssp_gold so
    # non-converging inputs (negative cycles, e.g. matrix.mtx/matrix5.mtx)
    # still compare bit-for-bit with the single-device result
    def run():
        res = solver(
            mesh, op, x0, sr, n_rows=n,
            combine=combine_min,
            exact=True, max_iter=max_iter if max_iter is not None else n,
        )
        return _sharded_unpermute(res, inv)

    return run if return_solver else run()


def sharded_bfs(coo: COO, root: int, mesh: Optional[Mesh] = None,
                max_iter: Optional[int] = None, mode: str = "auto",
                reorder: Optional[str] = None,
                return_solver: bool = False) -> ShardedFixpointResult:
    """Sharded BFS: .x reachability and .aux int32 levels (-1 unreachable,
    0 root) — structurally identical to the single-device bfs output."""
    mesh = mesh or make_mesh()
    coo, inv, root = _sharded_reorder_pre(coo, reorder, root)
    sr = OR_AND
    op, solver = _build_sharded_auto(coo, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.zeros(n, bool)
    x0[root] = True
    levels0 = np.full(n, -1, np.int32)
    levels0[root] = 0
    def run():
        res = solver(
            mesh, op, x0, sr, n_rows=n,
            combine=combine_or,
            exact=True, max_iter=max_iter or n + 1,
            aux0=levels0, aux_update=bfs_level_stamp,
        )
        return _sharded_unpermute(res, inv)

    return run if return_solver else run()


def sharded_pagerank(coo: COO, damping: float = 0.85,
                     mesh: Optional[Mesh] = None, delta: float = 1e-6,
                     max_iter: int = 1000, mode: str = "auto",
                     reorder: Optional[str] = None,
                     return_solver: bool = False) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, _ = _sharded_reorder_pre(coo, reorder)
    sr = PLUS_TIMES
    damped = pagerank_normalise(coo, damping)
    op, solver = _build_sharded_auto(damped, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.full(n, 1.0 / n, np.float32)
    def run():
        res = solver(
            mesh, op, x0, sr, n_rows=n,
            combine=CombineAddConst(float((1.0 - damping) / n)),
            exact=False, delta=delta, max_iter=max_iter,
        )
        return _sharded_unpermute(res, inv)

    return run if return_solver else run()


def sharded_scc_forward(coo: COO, mesh: Optional[Mesh] = None,
                        max_iter: Optional[int] = None,
                        mode: str = "auto",
                        return_solver: bool = False) -> ShardedFixpointResult:
    """Forward max-label propagation across the mesh (the reference's scc
    pass); full SCC intersects with the transpose pass (sharded_scc)."""
    from sparseharness_tpu.formats.preprocess import scc_normalise
    from sparseharness_tpu.semiring import MAX_RIGHT

    mesh = mesh or make_mesh()
    sr = MAX_RIGHT
    op, solver = _build_sharded_auto(
        scc_normalise(coo), sr, mesh.devices.size, mode
    )
    n = coo.shape[0]
    x0 = np.arange(n, dtype=np.int32)
    def run():
        return solver(
            mesh, op, x0, sr, n_rows=n,
            combine=combine_max,
            exact=True, max_iter=max_iter or n + 1,
        )

    return run if return_solver else run()


def sharded_scc(coo: COO, mesh: Optional[Mesh] = None,
                max_iter: Optional[int] = None,
                mode: str = "auto") -> Tuple[np.ndarray, ShardedFixpointResult,
                                             ShardedFixpointResult]:
    """Full SCC on the mesh: forward ∧ backward max-label propagation,
    component ids canonicalized to the minimum member vertex — the sharded
    counterpart of algorithms.apps.scc (the reference's app/scc.cpp does
    forward only)."""
    from sparseharness_tpu.algorithms.apps import _relabel_components

    fwd = sharded_scc_forward(coo, mesh=mesh, max_iter=max_iter, mode=mode)
    bwd = sharded_scc_forward(coo.transpose(), mesh=mesh, max_iter=max_iter,
                              mode=mode)
    f = np.asarray(fwd.x, dtype=np.int64)
    b = np.asarray(bwd.x, dtype=np.int64)
    return _relabel_components(f * coo.shape[0] + b), fwd, bwd


def sharded_eigenvector(coo: COO, mesh: Optional[Mesh] = None,
                        delta: float = 1e-6,
                        max_iter: int = 1000, mode: str = "auto",
                        reorder: Optional[str] = None,
                        return_solver: bool = False) -> ShardedFixpointResult:
    mesh = mesh or make_mesh()
    coo, inv, _ = _sharded_reorder_pre(coo, reorder)
    sr = PLUS_TIMES
    op, solver = _build_sharded_auto(coo, sr, mesh.devices.size, mode)
    n = coo.shape[0]
    x0 = np.full(n, 1.0 / np.sqrt(n), np.float32)
    def run():
        res = solver(
            mesh, op, x0, sr, n_rows=n,
            combine=combine_keep_dp,
            exact=False, delta=delta, max_iter=max_iter, norm=True,
        )
        return _sharded_unpermute(res, inv)

    return run if return_solver else run()


# ------------------------------------------------- batched multi-source


def _build_sharded_spmm(coo: COO, sr: Semiring, n_shards: int, mode: str):
    """Operand + solver for the batched (n, m) SpMM fixpoint.

    "auto" prefers the Pallas tile-SpMM local compute (strip-streaming
    spmm_bsr_ell inside shard_map, all-gathered X — VERDICT r4 weak #4:
    the batched path previously always ran the XLA row-gather ELL), then
    the halo-ELL window (O(halo·m) ICI per step when the structure is
    banded enough for the tile layout to blow up but the window to be
    narrow — rare), then all-gather ELL."""
    if mode == "band":
        raise NotImplementedError(
            "mode='band' is single-source only; multi-source fixpoints run "
            "the tile/ELL SpMM paths (mode auto/tiles/halo/gather)"
        )
    if mode == "sell":
        raise NotImplementedError(
            "mode='sell' is single-source only; multi-source fixpoints run "
            "the tile/ELL SpMM paths (mode auto/tiles/halo/gather)"
        )
    if mode not in ("auto", "tiles", "halo", "gather"):
        raise ValueError(f"unknown sharded mode {mode!r}")
    if mode in ("auto", "tiles"):
        from sparseharness_tpu.parallel.sharded_spmm import (
            build_sharded_spmm_tiles, sharded_fixpoint_spmm_tiles,
        )

        try:
            op = build_sharded_spmm_tiles(coo, sr, n_shards)
            return op, sharded_fixpoint_spmm_tiles
        except NotImplementedError:
            if mode == "tiles":
                raise
    if mode in ("auto", "halo"):
        try:
            op, _ = build_sharded_ell_halo(coo, sr, n_shards)
            return op, sharded_fixpoint_halo
        except ValueError:
            if mode == "halo":
                raise
    op, _ = build_sharded_ell(coo, sr, n_shards)
    return op, sharded_fixpoint


def sharded_multi_sssp(coo: COO, roots, mesh: Optional[Mesh] = None,
                       max_iter: Optional[int] = None, mode: str = "auto",
                       reorder: Optional[str] = None,
                       return_solver: bool = False) -> ShardedFixpointResult:
    """Batched SSSP across the mesh: .x[:, j] == sharded_sssp(coo, roots[j]).x.

    One min-plus SpMM fixpoint over a row-sharded (n, m) distance block —
    the sharded counterpart of algorithms.apps.multi_sssp (m sources share
    each iteration's matrix pass and exchange)."""
    from sparseharness_tpu.algorithms.apps import _as_roots

    mesh = mesh or make_mesh()
    r = _as_roots(coo, roots)
    coo, inv, r = _sharded_reorder_pre(coo, reorder, r)
    sr = MIN_PLUS
    op, solver = _build_sharded_spmm(coo, sr, mesh.devices.size, mode)
    n, m = coo.shape[0], len(r)
    x0 = np.full((n, m), FLT_MAX, np.float32)
    x0[r, np.arange(m)] = 0.0
    def run():
        res = solver(
            mesh, op, x0, sr, n_rows=n,
            combine=combine_min,
            exact=True, max_iter=max_iter if max_iter is not None else n,
        )
        return _sharded_unpermute(res, inv)

    return run if return_solver else run()


def sharded_multi_bfs(coo: COO, roots, mesh: Optional[Mesh] = None,
                      max_iter: Optional[int] = None, mode: str = "auto",
                      reorder: Optional[str] = None,
                      return_solver: bool = False) -> ShardedFixpointResult:
    """Batched BFS across the mesh: .x[:, j] reachability and .aux[:, j]
    int32 levels from roots[j] — the sharded counterpart of
    algorithms.apps.multi_bfs."""
    from sparseharness_tpu.algorithms.apps import _as_roots

    mesh = mesh or make_mesh()
    r = _as_roots(coo, roots)
    coo, inv, r = _sharded_reorder_pre(coo, reorder, r)
    sr = OR_AND
    op, solver = _build_sharded_spmm(coo, sr, mesh.devices.size, mode)
    n, m = coo.shape[0], len(r)
    x0 = np.zeros((n, m), bool)
    x0[r, np.arange(m)] = True
    levels0 = np.full((n, m), -1, np.int32)
    levels0[r, np.arange(m)] = 0
    def run():
        res = solver(
            mesh, op, x0, sr, n_rows=n,
            combine=combine_or,
            exact=True, max_iter=max_iter or n + 1,
            aux0=levels0, aux_update=bfs_level_stamp,
        )
        return _sharded_unpermute(res, inv)

    return run if return_solver else run()

"""The application layer: one function per algorithm.

Replaces the reference's per-app driver binaries (app/spmv.cpp, app/sssp.cpp,
app/bfs.cpp, app/pr.cpp, app/scc.cpp, app/eigenvector.cpp). Each app is a
(semiring, initializer, step, convergence) quadruple solved by the shared
fixpoint driver; initializers mirror the reference's per-app vector
generators (app/sssp.cpp:180-209 root-distances, app/bfs.cpp:177-207
root-frontier, app/scc.cpp:179-195 vertex-id iota).

Algorithms use the monotone closure form ``x ← x ⊕ (A ⊗ x)`` (an implicit
⊗-identity self-loop), which the reference approximates through its β·y
term; the closure form is the standard linear-algebraic formulation and
matches the classical golds in gold/algorithms.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.formats.preprocess import pagerank_normalise, scc_normalise
from sparseharness_tpu.semiring import (
    Semiring, PLUS_TIMES, MIN_PLUS, OR_AND, MAX_RIGHT, MIN_RIGHT, MAX_MIN,
)
from sparseharness_tpu.ops import build_operand, build_operand_auto, spmv, Geometry
from sparseharness_tpu.ops.spmm import spmm
from sparseharness_tpu.algorithms.fixpoint import (
    FixpointResult, run_fixpoint, delta_converged, exact_converged,
)

FLT_MAX = float(np.finfo(np.float32).max)


def _build(coo: COO, sr: Semiring, variant: str, geometry: Geometry):
    """(resolved_variant, operand) — resolves variant="auto" through the
    structure-aware chain so every app accepts it, not just spmv."""
    if variant == "auto":
        return build_operand_auto(coo, sr, geometry)
    return variant, build_operand(coo, sr, variant, geometry)


def _fixpoint_solver(operand, step_of, x0, aux0=None, **kw):
    """Zero-arg solver over a pre-built operand, jitted ONCE.

    Two properties the benchmark harness depends on:

    - the operand rides as a traced jit *argument*: closing the step over
      it would bake its arrays into the HLO as literal constants —
      hundreds of MB for SuiteSparse-scale strips, which bloats the
      executable and exceeds the remote-compile request limit on tunneled
      TPU backends (the HTTP 413 that blocked the round-2 BASELINE
      fixpoint configs);
    - repeated calls reuse one jit wrapper (and the already-device-placed
      operand), so per-trial timing measures the on-device solve, not a
      rebuild + re-upload — the reference uploads buffers once in the
      Harness ctor (inc/harness.h:197) and times kernel executions.

    kw (convergence/max_iter/aux_update) are static and safe to close
    over."""
    if aux0 is not None:
        fn = jax.jit(lambda op, a, b: run_fixpoint(
            lambda x: step_of(op, x), a, aux0=b, **kw))
        return lambda: fn(operand, x0, aux0)
    fn = jax.jit(lambda op, a: run_fixpoint(
        lambda x: step_of(op, x), a, **kw))
    return lambda: fn(operand, x0)


def _jit_fixpoint(operand, step_of, x0, aux0=None, **kw):
    return _fixpoint_solver(operand, step_of, x0, aux0=aux0, **kw)()


def _solver_or_result(solve, post, return_solver: bool):
    """`post(solve())`, or the equivalent zero-arg callable when the
    caller wants a reusable solver (build/jit excluded from trials)."""
    def run():
        return post(solve())

    return run if return_solver else run()


def _require_square(coo: COO) -> None:
    # the reference's COMMON_MAIN_PREAMBLE rejects non-square matrices for
    # every app (inc/common.h:49-56)
    if coo.shape[0] != coo.shape[1]:
        raise ValueError(f"matrix must be square, got {coo.shape}")


def _require_root(coo: COO, root: int) -> None:
    # negative roots would silently wrap via Python indexing
    if not 0 <= root < coo.shape[0]:
        raise ValueError(f"root {root} out of range [0, {coo.shape[0]})")


def _reorder_pre(coo: COO, reorder, roots=None):
    """(coo', inv, roots') — symmetric-permutation preprocessing.

    reorder="rcm" routes general matrices onto the banded fast kernel
    (formats/reorder.py); the solve then runs entirely in permuted space
    and results are mapped back by :func:`_unpermute_result`. Identity
    when reorder is falsy."""
    if not reorder:
        return coo, None, roots
    if reorder != "rcm":
        raise ValueError(f"unknown reorder method {reorder!r} (try 'rcm')")
    from sparseharness_tpu.formats.reorder import (
        inverse_permutation, permute_coo, rcm_permutation,
    )

    perm = rcm_permutation(coo)
    inv = inverse_permutation(perm)
    if roots is not None:
        roots = (
            int(inv[roots]) if np.isscalar(roots) or np.ndim(roots) == 0
            else inv[np.asarray(roots)]
        )
    return permute_coo(coo, perm), inv, roots


def _unpermute_result(res: FixpointResult, inv) -> FixpointResult:
    """Map result vectors (axis 0 = node) back to original numbering."""
    if inv is None:
        return res
    x = jnp.asarray(np.asarray(res.x)[inv])
    aux = None if res.aux is None else jnp.asarray(np.asarray(res.aux)[inv])
    return res._replace(x=x, aux=aux)


def _relabel_components(labels: np.ndarray) -> np.ndarray:
    """Canonicalize per-node component labels to the minimum member index
    (numbering-independent, so reordered and direct runs agree)."""
    _, comp = np.unique(labels, return_inverse=True)
    rep = np.full(comp.max() + 1, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(rep, comp, np.arange(len(labels)))
    return rep[comp].astype(np.int32)


@dataclasses.dataclass(frozen=True)
class Problem:
    """A prepared (operand, config) pair — the ArgContainer analogue
    (inc/kernel_utils.h:18) with pytrees instead of byte marshalling."""

    operand: Any
    sr: Semiring
    variant: str
    n_rows: int
    x0: jax.Array
    y: Optional[jax.Array]
    alpha: Any
    beta: Any


# ------------------------------------------------------------------- spmv


def make_spmv_problem(
    coo: COO,
    sr: Semiring = PLUS_TIMES,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    x: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    alpha=None,
    beta=None,
    seed: int = 0,
) -> Problem:
    variant, operand = _build(coo, sr, variant, geometry)
    if x is None:
        # ConstXVectorGenerator analogue (inc/vector_generator.h:43) uses a
        # constant; random is the better default for correctness checking
        rng = np.random.default_rng(seed)
        if np.dtype(sr.dtype) == np.bool_:
            x = rng.random(coo.shape[1]) < 0.5
        else:
            x = rng.uniform(0.0, 1.0, coo.shape[1]).astype(np.dtype(sr.dtype))
    if y is None:
        y = np.full(coo.shape[0], sr.zero, dtype=np.dtype(sr.dtype))
    return Problem(
        operand=operand, sr=sr, variant=variant, n_rows=coo.shape[0],
        x0=jnp.asarray(x, dtype=sr.dtype), y=jnp.asarray(y, dtype=sr.dtype),
        alpha=sr.one if alpha is None else alpha,
        beta=sr.zero if beta is None else beta,
    )


def spmv_once(problem: Problem) -> jax.Array:
    """Single-shot y = (α ⊗ A⊗x) ⊕ (β ⊗ y) — app/spmv.cpp's benchmark op."""
    return spmv(
        problem.operand, problem.x0, problem.y,
        sr=problem.sr, variant=problem.variant, n_rows=problem.n_rows,
        alpha=problem.alpha, beta=problem.beta,
    )


@dataclasses.dataclass(frozen=True)
class FixpointComponents:
    """(step, x0, convergence, limit) — the pieces each app hands the shared
    driver; exposed so the harness can also drive them one host-stepped
    iteration at a time (per-iteration RAW_RESULT rows, app/sssp.cpp:122).
    ``unpermute``, when set, maps a final x back to original numbering
    (solves built with reorder="rcm")."""

    step: Any
    x0: jax.Array
    convergence: Any
    limit: int
    unpermute: Any = None


def fixpoint_components(
    algo: str,
    coo: COO,
    root: int = 0,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    delta: Optional[float] = None,
    max_iter: Optional[int] = None,
    damping: float = 0.85,
    reorder: Optional[str] = None,
) -> FixpointComponents:
    """Build the (step, x0, convergence, limit) quadruple for an algorithm."""
    _require_square(coo)
    if algo in ("sssp", "bfs"):
        _require_root(coo, root)
    if reorder and algo == "scc":
        raise ValueError("reorder is numbering-dependent for raw scc labels")
    coo, inv, root = _reorder_pre(coo, reorder, root)
    unpermute = (
        None if inv is None else (lambda x: np.asarray(x)[inv])
    )
    n = coo.shape[0]
    if algo == "sssp":
        sr = MIN_PLUS
        variant, operand = _build(coo, sr, variant, geometry)
        x0 = jnp.full((n,), FLT_MAX, jnp.float32).at[root].set(0.0)
        conv = (
            exact_converged if not delta else delta_converged(delta)
        )
        limit = max_iter if max_iter is not None else n

        def step(x):
            dp = spmv(operand, x, None, sr=sr, variant=variant, n_rows=n)
            return sr.add(x, dp)

        return FixpointComponents(step, x0, conv, limit, unpermute)
    if algo == "bfs":
        sr = OR_AND
        variant, operand = _build(coo, sr, variant, geometry)
        x0 = jnp.zeros((n,), jnp.bool_).at[root].set(True)
        limit = max_iter if max_iter is not None else n + 1

        def step(x):
            dp = spmv(operand, x, None, sr=sr, variant=variant, n_rows=n)
            return jnp.logical_or(x, dp)

        return FixpointComponents(step, x0, exact_converged, limit, unpermute)
    if algo == "pagerank":
        sr = PLUS_TIMES
        damped = pagerank_normalise(coo, damping)
        variant, operand = _build(damped, sr, variant, geometry)
        x0 = jnp.full((n,), 1.0 / n, jnp.float32)
        teleport = jnp.float32((1.0 - damping) / n)

        def step(x):
            dp = spmv(operand, x, None, sr=sr, variant=variant, n_rows=n)
            return dp + teleport

        return FixpointComponents(
            step, x0, delta_converged(delta if delta else 1e-6),
            max_iter if max_iter is not None else 1000, unpermute,
        )
    if algo == "scc":
        sr = MAX_RIGHT
        labelled = scc_normalise(coo)
        variant, operand = _build(labelled, sr, variant, geometry)
        x0 = jnp.arange(n, dtype=jnp.int32)
        limit = max_iter if max_iter is not None else n + 1

        def step(x):
            dp = spmv(operand, x, None, sr=sr, variant=variant, n_rows=n)
            return jnp.maximum(x, dp)

        return FixpointComponents(step, x0, exact_converged, limit, unpermute)
    if algo == "eigenvector":
        sr = PLUS_TIMES
        variant, operand = _build(coo, sr, variant, geometry)
        x0 = jnp.full((n,), 1.0 / np.sqrt(n), jnp.float32)

        def step(x):
            y = spmv(operand, x, None, sr=sr, variant=variant, n_rows=n)
            norm = jnp.linalg.norm(y)
            return jnp.where(norm > 0, y / norm, y)

        return FixpointComponents(
            step, x0, delta_converged(delta if delta else 1e-6),
            max_iter if max_iter is not None else 1000, unpermute,
        )
    raise KeyError(f"unknown fixpoint algorithm {algo!r}")


# ------------------------------------------------------------------- sssp


def sssp(
    coo: COO,
    root: int,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    delta: float = 0.0,
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """Single-source shortest paths via min-plus fixpoint
    (app/sssp.cpp: x0 = ∞ except root = 0, README.md:29-40).

    delta=0.0 iterates to the exact Bellman-Ford fixpoint (|Δ| < δ never
    fires spuriously since < is strict only for 0 when Δ==0 ⇒ uses ≤ via
    'no element changed'); pass delta>0 for early approximate stopping.
    reorder="rcm" solves in bandwidth-reduced space (same distances)."""
    _require_square(coo)
    _require_root(coo, root)
    coo, inv, root = _reorder_pre(coo, reorder, root)
    sr = MIN_PLUS
    variant, operand = _build(coo, sr, variant, geometry)
    n = coo.shape[0]
    x0 = jnp.full((n,), FLT_MAX, jnp.float32).at[root].set(0.0)
    conv = exact_converged if delta <= 0.0 else delta_converged(delta)
    # default cap = n sweeps, matching gold.sssp_gold so non-converging
    # inputs (negative cycles) still compare bit-for-bit
    limit = max_iter if max_iter is not None else n

    def step(op, x):
        dp = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        return sr.add(x, dp)  # closure: keep own distance

    solve = _fixpoint_solver(operand, step, x0, convergence=conv,
                             max_iter=limit)
    return _solver_or_result(
        solve, lambda r: _unpermute_result(r, inv), return_solver)


# ------------------------------------------------------------------- bfs


def bfs(
    coo: COO,
    root: int,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """BFS via or/and fixpoint (app/bfs.cpp: x0 = false except root).

    Returns reachability in .x and int32 levels in .aux (-1 unreachable,
    0 root) — the levels the reference's int-typed 'bool' kernels imply."""
    _require_square(coo)
    _require_root(coo, root)
    coo, inv, root = _reorder_pre(coo, reorder, root)
    sr = OR_AND
    variant, operand = _build(coo, sr, variant, geometry)
    n = coo.shape[0]
    x0 = jnp.zeros((n,), jnp.bool_).at[root].set(True)
    levels0 = jnp.full((n,), -1, jnp.int32).at[root].set(0)
    limit = max_iter if max_iter is not None else n + 1

    def step(op, x):
        dp = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        return jnp.logical_or(x, dp)

    def stamp(levels, x_old, x_new, it):
        newly = jnp.logical_and(x_new, jnp.logical_not(x_old))
        return jnp.where(newly, it + 1, levels)

    solve = _fixpoint_solver(operand, step, x0, aux0=levels0,
                             convergence=exact_converged, max_iter=limit,
                             aux_update=stamp)
    return _solver_or_result(
        solve, lambda r: _unpermute_result(r, inv), return_solver)


# --------------------------------------------------------------- pagerank


def pagerank(
    coo: COO,
    damping: float = 0.85,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    delta: float = 1e-6,
    max_iter: int = 1000,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """PageRank power iteration (app/pr.cpp: damping 0.85, x0 = 1/N,
    teleport β = (1−d)/N; matrix column-normalized+damped in preprocessing
    via pagerank_normalise, src/sparse_matrix.cpp:409)."""
    _require_square(coo)
    coo, inv, _ = _reorder_pre(coo, reorder)
    sr = PLUS_TIMES
    damped = pagerank_normalise(coo, damping)
    variant, operand = _build(damped, sr, variant, geometry)
    n = coo.shape[0]
    x0 = jnp.full((n,), 1.0 / n, jnp.float32)
    teleport = jnp.float32((1.0 - damping) / n)

    def step(op, x):
        dp = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        return dp + teleport

    solve = _fixpoint_solver(operand, step, x0,
                             convergence=delta_converged(delta),
                             max_iter=max_iter)
    return _solver_or_result(
        solve, lambda r: _unpermute_result(r, inv), return_solver)


# -------------------------------------------------------------------- scc


def scc(
    coo: COO,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
) -> Tuple[np.ndarray, FixpointResult, FixpointResult]:
    """Strongly connected components via forward ∧ backward max-label
    propagation. The reference's app/scc.cpp does only the forward pass
    (SURVEY quirk list); the intersection here completes the algorithm.

    Returns (component_ids, forward_fixpoint, backward_fixpoint).

    **Label scheme (changed in r1, by design):** component ids are
    canonicalized to the *minimum member vertex id* — NOT dense 0..k-1
    ids — so direct and reorder="rcm" runs agree bit-for-bit. Consumers
    needing dense contiguous ids should apply ``np.unique(labels,
    return_inverse=True)[1]`` themselves (ADVICE r1 #3)."""
    _require_square(coo)
    coo, inv, _ = _reorder_pre(coo, reorder)
    fwd = _label_propagate(coo, variant, geometry, max_iter)
    bwd = _label_propagate(coo.transpose(), variant, geometry, max_iter)
    f = np.asarray(fwd.x, dtype=np.int64)
    b = np.asarray(bwd.x, dtype=np.int64)
    pair = f * coo.shape[0] + b
    if inv is not None:
        pair = pair[inv]  # back to original vertex order
        fwd, bwd = _unpermute_result(fwd, inv), _unpermute_result(bwd, inv)
    return _relabel_components(pair), fwd, bwd


def _label_propagate(coo, variant, geometry, max_iter,
                     return_solver: bool = False) -> FixpointResult:
    sr = MAX_RIGHT
    labelled = scc_normalise(coo)
    variant, operand = _build(labelled, sr, variant, geometry)
    n = coo.shape[0]
    x0 = jnp.arange(n, dtype=jnp.int32)  # vertex-id iota (app/scc.cpp:179-195)
    limit = max_iter if max_iter is not None else n + 1

    def step(op, x):
        dp = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        return jnp.maximum(x, dp)  # keep own label

    solve = _fixpoint_solver(operand, step, x0,
                             convergence=exact_converged, max_iter=limit)
    return _solver_or_result(solve, lambda r: r, return_solver)


# ------------------------------------------------------------ eigenvector


def eigenvector(
    coo: COO,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    delta: float = 1e-6,
    max_iter: int = 1000,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> Tuple[FixpointResult, jax.Array]:
    """Dominant eigenvector by power iteration with L2 normalization.

    The reference's app/eigenvector.cpp is fully commented out and excluded
    from the build (CMakeLists.txt:51); this is the working implementation
    the north star asks for. Returns (fixpoint, rayleigh_eigenvalue)."""
    _require_square(coo)
    coo, inv, _ = _reorder_pre(coo, reorder)
    sr = PLUS_TIMES
    variant, operand = _build(coo, sr, variant, geometry)
    n = coo.shape[0]
    x0 = jnp.full((n,), 1.0 / np.sqrt(n), jnp.float32)

    def step(op, x):
        y = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        norm = jnp.linalg.norm(y)
        return jnp.where(norm > 0, y / norm, y)

    solve = _fixpoint_solver(operand, step, x0,
                             convergence=delta_converged(delta),
                             max_iter=max_iter)

    def post(res):
        ax = spmv(operand, res.x, None, sr=sr, variant=variant, n_rows=n)
        # Rayleigh quotient is permutation-invariant
        eigval = jnp.vdot(res.x, ax)
        return _unpermute_result(res, inv), eigval

    return _solver_or_result(solve, post, return_solver)


# ------------------------------------------------- additional algorithms
# (no counterpart apps in the reference — natural extensions of the same
# semiring-fixpoint machinery)


def connected_components(
    coo: COO,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """Undirected connected components via min-label propagation over the
    symmetrized pattern ((min, select) semiring): label[i] = min vertex id
    in i's component (in original numbering even under reorder)."""
    _require_square(coo)
    coo, inv, _ = _reorder_pre(coo, reorder)
    sr = MIN_RIGHT
    n = coo.shape[0]
    rows = np.concatenate([coo.rows, coo.cols])
    cols = np.concatenate([coo.cols, coo.rows])
    sym = COO(
        rows.astype(np.int32), cols.astype(np.int32),
        np.zeros(len(rows), np.int32), coo.shape,
    )
    variant, operand = _build(sym, sr, variant, geometry)
    x0 = jnp.arange(n, dtype=jnp.int32)
    limit = max_iter if max_iter is not None else n + 1

    def step(op, x):
        dp = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        return jnp.minimum(x, dp)

    solve = _fixpoint_solver(operand, step, x0,
                             convergence=exact_converged, max_iter=limit)

    def post(res):
        if inv is not None:
            res = res._replace(
                x=jnp.asarray(_relabel_components(np.asarray(res.x)[inv]))
            )
        return res

    return _solver_or_result(solve, post, return_solver)


def widest_path(
    coo: COO,
    root: int,
    variant: str = "ell",
    geometry: Geometry = Geometry(),
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """Bottleneck (widest) path widths from root via the (max, min)
    semiring: width[i] = max over paths of the minimum edge weight."""
    _require_square(coo)
    _require_root(coo, root)
    coo, inv, root = _reorder_pre(coo, reorder, root)
    sr = MAX_MIN
    variant, operand = _build(coo, sr, variant, geometry)
    n = coo.shape[0]
    lo = jnp.float32(-FLT_MAX)
    x0 = jnp.full((n,), lo, jnp.float32).at[root].set(jnp.float32(FLT_MAX))
    limit = max_iter if max_iter is not None else n

    def step(op, x):
        dp = spmv(op, x, None, sr=sr, variant=variant, n_rows=n)
        return jnp.maximum(x, dp)

    solve = _fixpoint_solver(operand, step, x0,
                             convergence=exact_converged, max_iter=limit)
    return _solver_or_result(
        solve, lambda r: _unpermute_result(r, inv), return_solver)


# --------------------------------------------- multi-source (SpMM-batched)
# The reference solves one source per process invocation (root is a single
# CLI flag, app/sssp.cpp:215). On TPU a block of sources is the natural
# unit: the per-iteration op becomes SpMM, the sparse operand streams once
# per 256-wide root tile instead of once per root, and the fixpoint runs
# until EVERY column converges (columns that finish early just stop
# changing — the extra ⊕ passes are no-ops by idempotence).


def _as_roots(coo: COO, roots) -> np.ndarray:
    r = np.asarray(roots, np.int64).reshape(-1)
    if r.size == 0:
        raise ValueError("need at least one root")
    for root in r:
        _require_root(coo, int(root))
    return r


def multi_sssp(
    coo: COO,
    roots,
    variant: str = "bsr_ell",
    geometry: Geometry = Geometry(),
    delta: float = 0.0,
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """Batched SSSP: result.x[:, j] == sssp(coo, roots[j]).x.

    One min-plus SpMM fixpoint over an (n, m) distance block — the
    tile-native kernel (ops/spmm_tiles.py) amortizes the matrix stream
    across all m sources per iteration."""
    _require_square(coo)
    r = _as_roots(coo, roots)
    coo, inv, r = _reorder_pre(coo, reorder, r)
    sr = MIN_PLUS
    variant, operand = _build(coo, sr, variant, geometry)
    n, m = coo.shape[0], len(r)
    x0 = jnp.full((n, m), FLT_MAX, jnp.float32).at[r, jnp.arange(m)].set(0.0)
    conv = exact_converged if delta <= 0.0 else delta_converged(delta)
    limit = max_iter if max_iter is not None else n

    def step(op, x):
        dp = spmm(op, x, sr=sr, variant=variant, n_rows=n)
        return sr.add(x, dp)  # closure: keep own distance

    solve = _fixpoint_solver(operand, step, x0, convergence=conv,
                             max_iter=limit)
    return _solver_or_result(
        solve, lambda r: _unpermute_result(r, inv), return_solver)


def multi_bfs(
    coo: COO,
    roots,
    variant: str = "bsr_ell",
    geometry: Geometry = Geometry(),
    max_iter: Optional[int] = None,
    reorder: Optional[str] = None,
    return_solver: bool = False,
) -> FixpointResult:
    """Batched BFS: .x[:, j] reachability and .aux[:, j] int32 levels from
    roots[j] (-1 unreachable) — one or/and SpMM fixpoint for all roots."""
    _require_square(coo)
    r = _as_roots(coo, roots)
    coo, inv, r = _reorder_pre(coo, reorder, r)
    sr = OR_AND
    variant, operand = _build(coo, sr, variant, geometry)
    n, m = coo.shape[0], len(r)
    cols_ix = jnp.arange(m)
    x0 = jnp.zeros((n, m), jnp.bool_).at[r, cols_ix].set(True)
    levels0 = jnp.full((n, m), -1, jnp.int32).at[r, cols_ix].set(0)
    limit = max_iter if max_iter is not None else n + 1

    def step(op, x):
        dp = spmm(op, x, sr=sr, variant=variant, n_rows=n)
        return jnp.logical_or(x, dp)

    def stamp(levels, x_old, x_new, it):
        newly = jnp.logical_and(x_new, jnp.logical_not(x_old))
        return jnp.where(newly, it + 1, levels)

    solve = _fixpoint_solver(operand, step, x0, aux0=levels0,
                             convergence=exact_converged, max_iter=limit,
                             aux_update=stamp)
    return _solver_or_result(
        solve, lambda r: _unpermute_result(r, inv), return_solver)

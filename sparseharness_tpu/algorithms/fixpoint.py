"""Iterate-to-fixpoint driver.

The reference's ``IterativeHarness`` (inc/harness.h:441) runs a host-side
do/while around each kernel launch: read the whole output vector back to the
host, compare against the input on the CPU, swap buffer pointers, re-launch
(app/sssp.cpp:112-153 — two host↔device crossings *per iteration*).

The TPU-native design keeps the entire fixpoint on device: a
``lax.while_loop`` whose carry threads the ping-pong state functionally and
whose convergence predicate is an on-device all-reduce — zero host round
trips, one compiled program for the whole solve. Under ``shard_map`` the same
predicate composes with a ``psum`` so multi-chip convergence needs no host
either (see parallel/).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp



class FixpointResult(NamedTuple):
    x: jax.Array           # the fixpoint vector
    iterations: jax.Array  # int32 — SpMV launches performed
    converged: jax.Array   # bool — False ⇒ stopped at max_iter
    aux: Optional[jax.Array] = None  # algorithm extra (e.g. BFS levels)


def delta_converged(delta: float):
    """|x_new − x| < delta everywhere — app/sssp.cpp:157-176 semantics
    (float semirings; FLT_MAX−FLT_MAX = 0 so 'both unreachable' converges)."""

    def pred(x_old, x_new):
        return jnp.all(jnp.abs(x_new - x_old) < delta)

    return pred


def exact_converged(x_old, x_new):
    """Bitwise x_new == x_old — app/bfs.cpp:154-174 / scc semantics."""
    return jnp.all(x_old == x_new)


def run_fixpoint(
    step_fn: Callable,
    x0: jax.Array,
    *,
    convergence: Callable,
    max_iter: int = 10_000,
    aux0: Optional[jax.Array] = None,
    aux_update: Optional[Callable] = None,
) -> FixpointResult:
    """Iterate ``x ← step_fn(x)`` until ``convergence(x, x_new)`` or max_iter.

    ``aux_update(aux, x_old, x_new, it)`` optionally threads a side array
    through the loop (e.g. BFS level stamping). Jit-safe: call under jax.jit.
    """
    use_aux = aux0 is not None
    if not use_aux:
        aux0 = jnp.zeros((1,), jnp.int32)  # placeholder leaf

    def cond(carry):
        _, _, it, done = carry[0], carry[1], carry[2], carry[3]
        return jnp.logical_and(~done, it < max_iter)

    def body(carry):
        x, aux, it, _ = carry
        x_new = step_fn(x)
        done = convergence(x, x_new)
        if use_aux and aux_update is not None:
            aux = aux_update(aux, x, x_new, it)
        return (x_new, aux, it + 1, done)

    x_fin, aux_fin, iters, done = jax.lax.while_loop(
        cond, body, (x0, aux0, jnp.int32(0), jnp.bool_(False))
    )
    return FixpointResult(
        x=x_fin,
        iterations=iters,
        converged=done,
        aux=aux_fin if use_aux else None,
    )


def make_stepped_step(step_fn: Callable, convergence: Callable):
    """One jitted ``x → (x_new, converged_flag)`` step. Build it once and
    pass it as ``compiled_step`` to several :func:`run_fixpoint_stepped`
    generators: a fresh ``jax.jit(lambda ...)`` per generator is a new
    cache key, so every trial would re-trace AND re-compile (the
    reference compiles once in its ctor, inc/harness.h:68)."""
    return jax.jit(lambda x: _step_with_flag(step_fn, convergence, x))


def run_fixpoint_stepped(
    step_fn: Callable,
    x0: jax.Array,
    *,
    convergence: Callable,
    max_iter: int,
    compiled_step=None,
):
    """Host-stepped variant mirroring the reference's per-iteration loop
    (one device launch + one convergence scalar readback per iteration).

    Used by the harness when per-iteration timing records are requested —
    the analogue of the reference's RAW_RESULT-per-iteration rows
    (app/sssp.cpp:122-126). Returns (x, per_iteration_list, converged).
    """
    import numpy as np

    one_step = compiled_step if compiled_step is not None else (
        make_stepped_step(step_fn, convergence))
    x = x0
    iters = 0
    converged = False
    while iters < max_iter and not converged:
        x_new, flag = one_step(x)
        converged = bool(np.asarray(flag))  # D2H forces true completion
        x = x_new
        iters += 1
        yield x, iters, converged


def _step_with_flag(step_fn, convergence, x):
    x_new = step_fn(x)
    return x_new, convergence(x, x_new)


def run_fixpoint_checkpointed(
    step_fn: Callable,
    x0: jax.Array,
    *,
    convergence: Callable,
    max_iter: int,
    ckpt_path: str,
    every: int = 100,
    aux0: Optional[jax.Array] = None,
    aux_update: Optional[Callable] = None,
) -> FixpointResult:
    """Long-running fixpoints with durable progress: solve in on-device
    chunks of ``every`` iterations, writing (x, iteration) to ``ckpt_path``
    after each chunk (atomic rename), and resume from an existing
    checkpoint on restart.

    The reference has no in-process checkpointing; its experiment layer
    resumes by filesystem convention (SURVEY §5) — this carries the same
    convention into the solver for multi-hour graph solves."""
    import os

    import numpy as np

    if not ckpt_path.endswith(".npz"):
        ckpt_path += ".npz"
    start = 0
    x = x0
    aux = aux0
    if os.path.exists(ckpt_path):
        data = np.load(ckpt_path)
        x = jnp.asarray(data["x"])
        start = int(data["iteration"])
        if "aux" in data and aux0 is not None:
            aux = jnp.asarray(data["aux"])

    use_aux = aux0 is not None
    if use_aux:
        chunk = jax.jit(
            lambda x, aux: run_fixpoint(
                step_fn, x, convergence=convergence, max_iter=every,
                aux0=aux, aux_update=aux_update,
            )
        )
    else:
        chunk = jax.jit(
            lambda x: run_fixpoint(
                step_fn, x, convergence=convergence, max_iter=every
            )
        )
    total = start
    converged = False
    while total < max_iter and not converged:
        res = chunk(x, aux) if use_aux else chunk(x)
        x = res.x
        if use_aux:
            aux = res.aux
        total += int(res.iterations)
        converged = bool(res.converged)
        tmp = ckpt_path[:-4] + ".tmp.npz"
        payload = {"x": np.asarray(x), "iteration": total}
        if use_aux:
            payload["aux"] = np.asarray(aux)
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, ckpt_path)
    return FixpointResult(
        x=x, iterations=jnp.int32(total), converged=jnp.bool_(converged),
        aux=aux,
    )

"""Weak-scaling measurement: 1 → N devices, problem size ∝ N.

BASELINE.md target: ≥70% weak-scaling efficiency from 1 host to N≥2.
Efficiency(N) = T(1 shard, base problem) / T(N shards, N× problem) — 1.0
means perfect scaling (each chip keeps doing the same work while the
convergence psum and x exchange ride ICI).

On this environment only one real chip is reachable, so efficiencies are
*validated* on the forced-multi-device CPU backend (mechanics, collectives,
partitioning) and *measured for real* whenever `jax.devices()` exposes more
than one accelerator — the code path is identical.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from sparseharness_tpu.formats.generate import random_graph_coo
from sparseharness_tpu.parallel.mesh import make_mesh
from sparseharness_tpu.parallel.sharded import build_sharded_ell
from sparseharness_tpu.semiring import Semiring, MIN_PLUS
from sparseharness_tpu.utils.logging import get_logger

log = get_logger("scaling")


@dataclasses.dataclass
class ScalePoint:
    n_devices: int
    rows: int
    nnz: int
    seconds_per_op: float
    efficiency: float  # vs the 1-device point


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def weak_scaling_spmv(
    base_rows: int = 1 << 14,
    avg_degree: float = 8.0,
    device_counts: Optional[List[int]] = None,
    sr: Semiring = MIN_PLUS,
    inner_iters: int = 8,
    matrix_fn: Callable = None,
    kernel: str = "ell",
) -> List[ScalePoint]:
    """Chained two-point SpMV timing per device count, rows ∝ devices.

    The default semiring is min_plus: its ⊕ is idempotent, so the chained
    body x ← A⊗x needs no magnitude control and the timed op is *exactly*
    the SpMV being scaled (the earlier plus_times body decayed dp by 1e-6
    each iteration to dodge overflow — VERDICT r1 weak #9).

    kernel="ell": all-gather + XLA-gather local dp (any structure).
    kernel="band": the production path — Pallas band local compute with
    edge ppermutes overlapped with the interior pallas_call
    (parallel/sharded_band.py); requires bandable structure, so the default
    matrix_fn switches to a banded generator."""
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    from sparseharness_tpu.parallel import fixcore
    from sparseharness_tpu.parallel.mesh import ROWS_AXIS
    from sparseharness_tpu.parallel.sharded import _local_dp, _place
    from sparseharness_tpu.parallel.sharded_band import (
        _band_local_dp, band_arrays, build_sharded_band,
    )

    if kernel not in ("ell", "band"):
        raise ValueError(f"unknown weak-scaling kernel {kernel!r}")
    if device_counts is None:
        avail = len(jax.devices())
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= avail]
    if matrix_fn is None:
        if kernel == "band":
            from sparseharness_tpu.formats.generate import banded_coo

            half = max(int(avg_degree) // 2, 1)
            matrix_fn = lambda n: banded_coo(n, half, seed=7)
        else:
            matrix_fn = lambda n: random_graph_coo(n, avg_degree, seed=7)

    points: List[ScalePoint] = []
    base_time = None
    for d in device_counts:
        n = base_rows * d
        coo = matrix_fn(n)
        mesh = make_mesh(d)
        rng = np.random.default_rng(3)

        if kernel == "band":
            op, chunk = build_sharded_band(coo, sr, d)
            r_pad = d * op.chunk
            x0 = jnp.asarray(
                np.pad(rng.uniform(0.1, 1.0, n).astype(np.float32),
                       (0, r_pad - n), constant_values=sr.zero)
            )

            arrays = band_arrays(op)
            local_dp = _band_local_dp(op, sr)

            def chained(k, arrays=arrays, local_dp=local_dp):
                @partial(
                    shard_map, mesh=mesh,
                    in_specs=(fixcore.row_specs(arrays), P(ROWS_AXIS)),
                    out_specs=P(ROWS_AXIS), check_vma=False,
                )
                def run(op_local, x_local):
                    def body(xl, _):
                        # the timed op is exactly the SpMV (edge ppermutes
                        # + the pre-split head/interior/tail pallas calls)
                        return local_dp(op_local, xl), None

                    xl, _ = jax.lax.scan(body, x_local, None, length=k)
                    return xl

                return jax.jit(lambda a, x: run(a, x))

            args = (fixcore.shard_operand(mesh, arrays),)
        else:
            op, chunk = build_sharded_ell(coo, sr, d)
            r_pad = d * chunk
            x0 = jnp.asarray(
                np.pad(rng.uniform(0.1, 1.0, n).astype(np.float32),
                       (0, r_pad - n), constant_values=sr.zero)
            )

            def chained(k):
                @partial(
                    shard_map, mesh=mesh,
                    in_specs=(P(ROWS_AXIS, None, None),
                              P(ROWS_AXIS, None, None), P(ROWS_AXIS)),
                    out_specs=P(ROWS_AXIS),
                )
                def run(cols, vals, x_local):
                    def body(xl, _):
                        x_full = jax.lax.all_gather(xl, ROWS_AXIS, tiled=True)
                        dp = _local_dp(cols[0], vals[0], x_full, sr)
                        return dp, None  # the timed op is exactly the SpMV

                    xl, _ = jax.lax.scan(body, x_local, None, length=k)
                    return xl

                return jax.jit(lambda c, v, x: run(c, v, x))

            op_placed = _place(mesh, op)
            args = (op_placed.cols, op_placed.vals)

        x_sh = jax.device_put(x0, NamedSharding(mesh, P(ROWS_AXIS)))
        f1 = chained(inner_iters)
        f2 = chained(2 * inner_iters)
        _sync(f1(*args, x_sh))
        _sync(f2(*args, x_sh))
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(f1(*args, x_sh))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _sync(f2(*args, x_sh))
            t2s.append(time.perf_counter() - t0)
        per = max((min(t2s) - min(t1s)) / inner_iters, 1e-9)
        if base_time is None:
            base_time = per
        points.append(
            ScalePoint(
                n_devices=d, rows=n, nnz=coo.nnz, seconds_per_op=per,
                efficiency=base_time / per,
            )
        )
        log.info("weak scaling d=%d: %.3f ms/op eff=%.2f", d, per * 1e3,
                 points[-1].efficiency)
    return points


def report(points: List[ScalePoint]) -> str:
    lines = ["devices  rows        nnz         ms/op    efficiency"]
    for p in points:
        lines.append(
            f"{p.n_devices:7d}  {p.rows:<10d}  {p.nnz:<10d}  "
            f"{p.seconds_per_op * 1e3:7.3f}  {p.efficiency:8.2f}"
        )
    return "\n".join(lines)

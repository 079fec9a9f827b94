#!/usr/bin/env python
"""Locate the fixpoint per-iteration overhead on chip.

results/fixpoint_tpu.json measures 12-21 ms/iteration for band-3 graphs
whose raw bsr_band SpMV costs ~1.2 ms (805 MB padded strips at ~700 GB/s).
This probe times, on the same operand, with identical chained two-point
methodology (CLAUDE.md):

  a) scan-of-K dependent dp calls (the benchmark harness's chain shape)
  b) scan-of-K full fixpoint steps (dp + fold + sr.add carry)
  c) while_loop-of-K fixpoint steps, convergence check live but never
     firing (run_fixpoint with max_iter=K on a non-converging input)
  d) while_loop-of-K with a trivial (non-pallas) body — loop overhead floor

If (c) >> (b) the while_loop itself (or its interaction with the pallas
custom-call) is the regression; if (b) >> (a) the per-iteration fold /
convergence epilogue is; if (a) is already slow the kernel itself behaves
differently on this band-3 shape than on the band-63 benchmark shape.

Writes results/fixpoint_diag_tpu.json. Run from /root/repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args):
    """Two-point chained timing: fn must take (K,) static and run K
    dependent iterations in ONE dispatch; returns per-iter seconds."""
    k1, k2 = 8, 24
    f1 = fn(k1)
    f2 = fn(k2)
    for f in (f1, f2):           # compile + warm, forced complete
        np.asarray(np.asarray(f(*args)).ravel()[:1])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(np.asarray(f1(*args)).ravel()[:1])
        t1 = time.perf_counter()
        np.asarray(np.asarray(f2(*args)).ravel()[:1])
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    print("backend:", jax.default_backend(), flush=True)

    from sparseharness_tpu.algorithms.fixpoint import (
        delta_converged, run_fixpoint,
    )
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.ops import build_operand, spmv
    from sparseharness_tpu.semiring import MIN_PLUS

    out = {"backend": jax.default_backend(), "cases": {}}
    FLT_MAX = np.float32(3.4028235e38)

    on_tpu = jax.default_backend() == "tpu"
    for band in (3, 63):
        n = 1 << 19 if on_tpu else 1 << 12
        g = banded_coo(n, band, seed=7)
        sr = MIN_PLUS
        op = build_operand(g, sr, "bsr_band")
        gb = op.strips.size * op.strips.dtype.itemsize / 1e9
        x0 = jnp.full((n,), FLT_MAX, jnp.float32).at[0].set(0.0)

        def step(op, x):
            dp = spmv(op, x, None, sr=sr, variant="bsr_band", n_rows=n)
            return sr.add(x, dp)

        def mk_scan_dp(K):
            def f(op, x):
                def body(c, _):
                    d = spmv(op, c, None, sr=sr, variant="bsr_band",
                             n_rows=n)
                    return d, ()
                r, _ = jax.lax.scan(body, x, None, length=K)
                return r
            return jax.jit(f)

        def mk_scan_step(K):
            def f(op, x):
                def body(c, _):
                    return step(op, c), ()
                r, _ = jax.lax.scan(body, x, None, length=K)
                return r
            return jax.jit(f)

        def mk_while(K):
            def f(op, x):
                return run_fixpoint(
                    lambda c: step(op, c), x,
                    convergence=delta_converged(0.0),  # never fires
                    max_iter=K,
                ).x
            return jax.jit(f)

        def mk_while_trivial(K):
            def f(op, x):
                return run_fixpoint(
                    lambda c: c * 1.0000001, x,
                    convergence=delta_converged(0.0),
                    max_iter=K,
                ).x
            return jax.jit(f)

        case = {"n": n, "band": band, "nnz": int(g.nnz),
                "strip_gb": round(gb, 3)}
        for name, mk in (("scan_dp", mk_scan_dp),
                         ("scan_step", mk_scan_step),
                         ("while_step", mk_while),
                         ("while_trivial", mk_while_trivial)):
            s = timed(mk, op, x0)
            case[name + "_ms"] = round(s * 1e3, 4)
            case[name + "_gbps"] = round(gb / s / 1.0, 1) if s > 0 else None
            print(f"band={band} {name}: {s*1e3:.3f} ms/iter "
                  f"({gb/s:.0f} GB/s strips)", flush=True)
        out["cases"][f"band{band}"] = case
        if on_tpu:
            with open("results/fixpoint_diag_tpu.json", "w") as f:
                json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

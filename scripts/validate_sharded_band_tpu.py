#!/usr/bin/env python
"""Chip evidence for VERDICT r1 'next' #1: the sharded band path's local
compute IS the Pallas band kernel.

Measures, on the real TPU, the same 512k-row banded workload as bench.py:

  plain    — ops.pallas_bsr_band via harness.benchmark_spmv (chained
             two-point timing, the honest TPU clock)
  sharded  — parallel.sharded_band's shard_map'd dp on a **1-device mesh**
             (ring ppermutes degenerate to self-copies; the local compute
             and the overlap split run exactly as on N chips), timed by the
             same two-point method with the scan *inside* the shard_map.

Done criterion (VERDICT r1): sharded-within-mesh throughput within ~10% of
the plain kernel. Writes results/sharded_band_1dev_tpu.json.

Run from /root/repo (PYTHONPATH breaks axon registration — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

# importable regardless of cwd (do NOT set PYTHONPATH — axon gotcha)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sparseharness_tpu.algorithms import make_spmv_problem
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.harness import BenchmarkConfig, benchmark_spmv
    from sparseharness_tpu.ops import Geometry
    from sparseharness_tpu.parallel import fixcore, make_mesh
    from sparseharness_tpu.parallel.mesh import ROWS_AXIS
    from sparseharness_tpu.parallel.sharded_band import (
        _band_local_dp, band_arrays, build_sharded_band,
    )
    from sparseharness_tpu.semiring import PLUS_TIMES

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 19 if on_tpu else 1 << 13
    band = 63
    # k=16: the 2k=32 chain is the same length as bench.py's plain chain;
    # scan-of-(shard_map + 3 pallas_calls) programs remote-compile very
    # slowly (~10+ min), so keep the longest chain at 32 — the (t_2k−t_k)
    # signal is ~17 ms against ~2-3 ms dispatch jitter
    k = 16 if on_tpu else 2
    trials = 6 if on_tpu else 2
    coo = banded_coo(n, band, seed=1)

    # ---- plain single-chip kernel (the BENCH_r01 flagship) -------------
    prob = make_spmv_problem(coo, variant="bsr_band",
                             geometry=Geometry(8, 128), seed=2)
    res = benchmark_spmv(
        prob, gold=None,
        config=BenchmarkConfig(trials=trials, inner_iters=2 * k),
        geometry=Geometry(8, 128), matrix_name=f"banded{n}", nnz=coo.nnz,
    )
    plain_ms = res.median_ns / 1e6
    plain_gnnz = coo.nnz / (res.median_ns) if res.median_ns else 0.0

    # ---- sharded band dp on a 1-device mesh ----------------------------
    mesh = make_mesh(1)
    sr = PLUS_TIMES
    op, chunk = build_sharded_band(coo, sr, 1)
    arrays = band_arrays(op)
    local_dp = _band_local_dp(op, sr)

    def chained(length):
        @partial(
            shard_map, mesh=mesh,
            in_specs=(fixcore.row_specs(arrays), P(ROWS_AXIS)),
            out_specs=P(ROWS_AXIS), check_vma=False,
        )
        def run(op_local, x_local):
            def body(xc, _):
                return local_dp(op_local, xc).astype(xc.dtype), None

            xf, _ = jax.lax.scan(body, x_local, None, length=length)
            return xf

        return jax.jit(run)

    f1, f2 = chained(k), chained(2 * k)
    arrs = fixcore.shard_operand(mesh, arrays)
    rng = np.random.default_rng(2)
    x_pad = np.zeros(chunk, np.float32)
    x_pad[:n] = rng.uniform(0.1, 1.0, n).astype(np.float32)
    x_sh = jax.device_put(jnp.asarray(x_pad),
                          NamedSharding(mesh, P(ROWS_AXIS)))

    def sync(a):
        np.asarray(a.ravel()[:1])

    sync(f1(arrs, x_sh))   # compile
    sync(f2(arrs, x_sh))
    t_ks, t_2ks = [], []
    for _ in range(trials):
        t0 = time.perf_counter(); sync(f1(arrs, x_sh))
        t_ks.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(f2(arrs, x_sh))
        t_2ks.append(time.perf_counter() - t0)
    t_ks.sort(); t_2ks.sort()
    per_op = float(np.median(
        [max((b - a) / k, 1e-9) for a, b in zip(t_ks, t_2ks)]
    ))
    shard_ms = per_op * 1e3
    shard_gnnz = coo.nnz / per_op / 1e9

    out = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "matrix": f"banded n={n} nnz={coo.nnz}",
        "plain_bsr_band": {"ms_per_op": round(plain_ms, 4),
                           "gnnz_per_s": round(plain_gnnz, 3)},
        "sharded_band_1dev": {"ms_per_op": round(shard_ms, 4),
                              "gnnz_per_s": round(shard_gnnz, 3)},
        "sharded_over_plain": round(shard_gnnz / plain_gnnz, 4)
        if plain_gnnz else 0.0,
    }
    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("results/sharded_band_1dev_tpu.json", "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

#!/usr/bin/env python
"""Timed overlap-split A/B on the chip (VERDICT r2 missing #4).

results/overlap_hlo_tpu.txt proves the *schedule*: the two edge-exchange
collective-permutes are issued before (and data-independent of) the
interior band pallas_call, so the TPU's async collectives run during it.
What was missing is a *timing* at a halo heavy enough to matter. One chip
can't time real ICI (the 1-device ppermutes are self-copies), so this
script measures the other half of the tradeoff — what the interior/
boundary split itself costs or saves vs a single full-window call — in
two regimes:

  small-halo  banded_coo band=63 (halo 128 rows, the bench workload):
              the split should be ~free (boundary is 2 of 4096 groups).
  heavy-halo  wide-reach rows: ~64 nnz/row scattered within +-8191
              columns (halo 8192 rows >= the 8k VERDICT asked for,
              max_window override). Here the boundary is half the groups
              and the window concat is 2x chunk — the regime where a pod
              actually needs the overlap, and where a split that cost
              much would have to be rethought.

A = overlap split on (as built); B = without_overlap_split(op) — one
full-window pallas_call per iteration that waits on both permutes.
Chained two-point timing inside the shard_map (the only honest TPU clock
here, CLAUDE.md). Writes results/overlap_ab_tpu.json.

Run from /root/repo (PYTHONPATH breaks axon registration — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wide_reach_coo(n: int, reach: int, per_row: int, seed: int):
    """~per_row nnz per row scattered within +-reach columns, with the
    window endpoints pinned so every group needs the full halo."""
    from sparseharness_tpu.formats.sparse import COO

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    offs = rng.integers(-reach, reach + 1, size=rows.size)
    # pin the extremes on every 128-row group so halo/k_win are uniform
    g0 = np.arange(0, n, 128, dtype=np.int64)
    rows = np.concatenate([rows, g0, g0])
    offs = np.concatenate([offs, np.full(g0.size, -reach),
                           np.full(g0.size, reach)])
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.uniform(0.1, 1.0, rows.size).astype(np.float32)
    return COO(rows.astype(np.int32), cols.astype(np.int32), vals, (n, n))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.parallel import fixcore, make_mesh
    from sparseharness_tpu.parallel.mesh import ROWS_AXIS
    from sparseharness_tpu.parallel.sharded_band import (
        _band_local_dp, band_arrays, build_sharded_band,
        without_overlap_split,
    )
    from sparseharness_tpu.semiring import PLUS_TIMES

    on_tpu = jax.default_backend() == "tpu"
    mesh = make_mesh(1)
    sr = PLUS_TIMES

    def measure(op, k, trials):
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
        chunk = op.chunk
        x_pad = rng.uniform(0.1, 1.0, chunk).astype(np.float32)
        x_sh = jax.device_put(jnp.asarray(x_pad),
                              NamedSharding(mesh, P(ROWS_AXIS)))

        def sync(a):
            np.asarray(a.ravel()[:1])

        sync(f1(arrs, x_sh))
        sync(f2(arrs, x_sh))
        # min-wall per chain length, then one two-point difference: the
        # earlier rank-paired median over 5 jittery axon walls at k=16
        # misread this case by ±40% in both directions (0.69 ms/op =
        # 1166 GB/s, above the HBM spec; scripts/probe_ab_clock.py
        # established min-wall two-point is stable to ~3% for k >= 32)
        w1 = w2 = np.inf
        for _ in range(trials):
            t0 = time.perf_counter(); sync(f1(arrs, x_sh))
            w1 = min(w1, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f2(arrs, x_sh))
            w2 = min(w2, time.perf_counter() - t0)
        per = max((w2 - w1) / k, 1e-9)
        # equivalence check on a SHORT chain: the k>=32 timing chains
        # overflow f32 (unnormalized plus_times feedback grows ~70x per
        # iteration on 127 nnz/row), and inf*0̄ padding turns both outputs
        # to nan — proving nothing. Two iterations stay finite.
        out = np.asarray(chained(2)(arrs, x_sh))
        return per, out

    results = {"backend": jax.default_backend(),
               "device": jax.devices()[0].device_kind, "cases": {}}

    cases = []
    if on_tpu:
        cases.append(("small_halo_band63",
                      banded_coo(1 << 19, 63, seed=1), 8, 64, 4))
        cases.append(("heavy_halo_8192",
                      wide_reach_coo(1 << 15, 8191, 64, seed=2), 192, 32, 4))
    else:
        cases.append(("small_halo_band5",
                      banded_coo(1 << 12, 5, seed=1), 8, 2, 2))
        cases.append(("heavy_halo_1024",
                      wide_reach_coo(1 << 12, 1023, 8, seed=2), 24, 2, 2))

    for name, coo, max_win, k, trials in cases:
        op, _ = build_sharded_band(coo, sr, 1, max_window=max_win)
        ng = op.chunk // op.bn
        split_ms, out_a = measure(op, k, trials)
        nosplit_ms, out_b = measure(without_overlap_split(op), k, trials)
        same = bool(np.allclose(out_a, out_b, rtol=1e-5, atol=1e-6))
        strip_bytes = sum(
            int(a.size) * a.dtype.itemsize
            for a in (op.strips_head, op.strips_int, op.strips_tail)
        )
        results["cases"][name] = {
            "rows": coo.shape[0], "nnz": coo.nnz,
            "halo_rows": op.halo, "k_win": op.k_win,
            "groups": ng, "interior_groups": [op.g_lo, op.g_hi],
            "strip_gb": round(strip_bytes / 1e9, 3),
            "split_ms_per_op": round(split_ms * 1e3, 4),
            "nosplit_ms_per_op": round(nosplit_ms * 1e3, 4),
            "split_over_nosplit": round(split_ms / nosplit_ms, 4)
            if nosplit_ms else 0.0,
            "outputs_match": same,
        }
        print(name, json.dumps(results["cases"][name]))

    print(json.dumps(results, indent=1))
    if on_tpu:
        with open("results/overlap_ab_tpu.json", "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

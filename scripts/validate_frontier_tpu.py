#!/usr/bin/env python
"""Chip evidence for VERDICT r2 'next' #3: the frontier path's local
compute is the Pallas sell2 kernel, and its per-iteration cost on a
1-device mesh is within ~2x of the corresponding non-frontier sharded
mode (mode="sell", dense all-gather exchange).

Both solvers run the SAME zipf graph to the SAME fixpoint. Two clocks,
both honest about what they include:

  marginal_ms_per_iter — two-point differential between a k1-capped and
      a k2-capped solve (prebuilt solvers via return_solver=True, so
      operand build/upload is excluded and the axon dispatch floor
      cancels in the min-wall difference). Measured on a CHAINED-cluster
      zipf graph: 64 power-law clusters strung on a path, diameter well
      past 96, so caps 32/96 both bind — a flat zipf blob converges in
      ~7 iterations, far too few to difference against ~100 ms of
      per-solve axon jitter (the first attempt read negative rates).
      Long-diameter + small frontiers is also the workload the frontier
      mode exists for; the flat blob is its worst case.
  solve_wall_ms — wall of one full converged solve on the prebuilt
      solver (includes the one-dispatch RPC floor, excludes build),
      on the original flat zipf graph, with its exchange compression.

The earlier committed artifact timed `sharded_sssp(...)` end-to-end per
call, so its 278-303 ms/iter was dominated by the per-call numpy operand
packing — a build-throughput number, not an iteration rate. Both graphs
gold-checked against sssp_gold.

Writes results/frontier_tpu.json. Run from /root/repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"

    from sparseharness_tpu.formats import power_law_coo
    from sparseharness_tpu.gold import sssp_gold
    from sparseharness_tpu.parallel import (
        frontier_sssp, make_mesh, sharded_sssp,
    )

    n = 200_000 if on_tpu else 4_000
    g = power_law_coo(n, 4 * n, alpha=1.5, seed=21)
    g = g.with_values(np.abs(g.vals) + 0.05)

    # chained clusters: C zipf blobs + path edges between neighbours —
    # diameter scales with C, frontiers stay cluster-sized
    C = 64 if on_tpu else 8
    m = n // C
    from sparseharness_tpu.formats.sparse import COO
    sub = power_law_coo(m, 4 * m, alpha=1.5, seed=22)
    rr, cc, vv = [], [], []
    for ci in range(C):
        rr.append(sub.rows.astype(np.int64) + ci * m)
        cc.append(sub.cols.astype(np.int64) + ci * m)
        vv.append(np.abs(sub.vals) + 0.05)
    link = np.arange(1, C, dtype=np.int64) * m
    # bidirectional bridge edges between consecutive clusters
    rr.append(link); cc.append(link - 1)
    rr.append(link - 1); cc.append(link)
    vv.append(np.full(link.size, 0.5, np.float32))
    vv.append(np.full(link.size, 0.5, np.float32))
    gch = COO(np.concatenate(rr).astype(np.int32),
              np.concatenate(cc).astype(np.int32),
              np.concatenate(vv).astype(np.float32), (C * m, C * m))

    mesh = make_mesh(1)
    root = 0
    cap = 64 if on_tpu else 16   # identical capped work for both paths
    k1, k2 = (32, 96) if on_tpu else (4, 8)

    def sync(res):
        np.asarray(np.asarray(res.x).ravel()[:1])
        return res

    def solve_wall(make_solver):
        # full converged solve on a PREBUILT solver (build excluded)
        solver = make_solver(cap)
        res = sync(solver())                 # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = sync(solver())
            walls.append(time.perf_counter() - t0)
        return res, float(np.median(walls))

    def marginal(make_solver):
        # min-wall two-point over caps that both bind on the chained
        # graph (diameter >> k2): per-solve fixed costs cancel
        s1, s2 = make_solver(k1), make_solver(k2)
        r1 = sync(s1())
        r2 = sync(s2())
        w1 = w2 = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); sync(s1())
            w1 = min(w1, time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(s2())
            w2 = min(w2, time.perf_counter() - t0)
        caps_ok = int(r1.iterations) == k1 and int(r2.iterations) == k2
        return (w2 - w1) / (k2 - k1), caps_ok, r2

    res_s, wall_s = solve_wall(lambda c: sharded_sssp(
        g, root, mesh=mesh, mode="sell", max_iter=c, return_solver=True))
    res_f, wall_f = solve_wall(lambda c: frontier_sssp(
        g, root, mesh=mesh, budget=4096, max_iter=c, return_solver=True))

    per_s, ok_caps_s, _ = marginal(lambda c: sharded_sssp(
        gch, root, mesh=mesh, mode="sell", max_iter=c, return_solver=True))
    per_f, ok_caps_f, rch_f = marginal(lambda c: frontier_sssp(
        gch, root, mesh=mesh, budget=4096, max_iter=c, return_solver=True))

    gold = sssp_gold(g, root, max_iter=cap)
    ok_s = bool(np.allclose(np.asarray(res_s.x), gold, rtol=1e-5))
    ok_f = bool(np.allclose(np.asarray(res_f.x), gold, rtol=1e-5))
    gold_ch = sssp_gold(gch, root, max_iter=k2)
    ok_ch = bool(np.allclose(np.asarray(rch_f.x), gold_ch, rtol=1e-5))

    out = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "graph": f"zipf n={n} nnz={g.nnz}",
        "chained_graph": f"{C}x zipf clusters n={C*m} nnz={gch.nnz}",
        "iterations": {"sell": res_s.iterations, "frontier": res_f.iterations},
        "gold_ok": {"sell": ok_s, "frontier": ok_f,
                    "frontier_chained_capped": ok_ch},
        "solve_wall_ms": {"sell": round(wall_s * 1e3, 3),
                          "frontier": round(wall_f * 1e3, 3)},
        "marginal_ms_per_iter": {"sell": round(per_s * 1e3, 3),
                                 "frontier": round(per_f * 1e3, 3)},
        "marginal_caps": [k1, k2],
        "marginal_caps_reached": {"sell": ok_caps_s, "frontier": ok_caps_f},
        "frontier_over_sell": round(per_f / per_s, 3) if per_s else None,
        "frontier_local": res_f.local,
        "exchange": {
            "sent_entries": res_f.sent_entries,
            "exchanged_bytes": res_f.exchanged_bytes(),
            "allgather_bytes": res_f.allgather_bytes(n),
            "dense_fallbacks": res_f.dense_fallbacks,
            "dense_phase_iters": res_f.dense_phase_iters,
        },
    }
    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("results/frontier_tpu.json", "w") as f:
            json.dump(out, f, indent=1)
    return 0 if ok_s and ok_f else 1


if __name__ == "__main__":
    sys.exit(main())

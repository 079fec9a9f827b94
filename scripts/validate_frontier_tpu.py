#!/usr/bin/env python
"""Chip evidence for VERDICT r2 'next' #3: the frontier path's local
compute is the Pallas sell2 kernel, and its per-iteration cost on a
1-device mesh is within ~2x of the corresponding non-frontier sharded
mode (mode="sell", dense all-gather exchange).

Both solvers run the SAME zipf graph to the SAME fixpoint; per-iteration
wall = solve wall / iterations on the second (compiled) call, result
synced via a 1-element np.asarray. The frontier path additionally
reports its measured exchange compression. Gold-checked against the
single-device BFS levels.

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
    mesh = make_mesh(1)
    root = 0
    cap = 64 if on_tpu else 16   # identical capped work for both paths

    def timed(fn):
        res = fn()                     # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = fn()
            np.asarray(np.asarray(res.x).ravel()[:1])
            walls.append(time.perf_counter() - t0)
        return res, float(np.median(walls))

    res_s, wall_s = timed(lambda: sharded_sssp(
        g, root, mesh=mesh, mode="sell", max_iter=cap))
    res_f, wall_f = timed(lambda: frontier_sssp(
        g, root, mesh=mesh, budget=4096, max_iter=cap))

    gold = sssp_gold(g, root, max_iter=cap)
    ok_s = bool(np.allclose(np.asarray(res_s.x), gold, rtol=1e-5))
    ok_f = bool(np.allclose(np.asarray(res_f.x), gold, rtol=1e-5))

    per_s = wall_s / max(res_s.iterations, 1)
    per_f = wall_f / max(res_f.iterations, 1)
    out = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "graph": f"zipf n={n} nnz={g.nnz}",
        "iterations": {"sell": res_s.iterations, "frontier": res_f.iterations},
        "gold_ok": {"sell": ok_s, "frontier": ok_f},
        "ms_per_iter": {"sell": round(per_s * 1e3, 3),
                        "frontier": round(per_f * 1e3, 3)},
        "frontier_over_sell": round(per_f / per_s, 3) if per_s else None,
        "frontier_local": res_f.local,
        "exchange": {
            "sent_entries": res_f.sent_entries,
            "exchanged_bytes": res_f.exchanged_bytes(),
            "allgather_bytes": res_f.allgather_bytes(n),
            "dense_fallbacks": res_f.dense_fallbacks,
        },
    }
    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("results/frontier_tpu.json", "w") as f:
            json.dump(out, f, indent=1)
    return 0 if ok_s and ok_f else 1


if __name__ == "__main__":
    sys.exit(main())

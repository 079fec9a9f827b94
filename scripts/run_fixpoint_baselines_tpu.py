#!/usr/bin/env python
"""BASELINE.json configs #3-#5 on the real chip: fixpoint solve rates.

Runs the three iterative workloads the north star names — BFS (or_and),
SSSP (min_plus), PageRank (plus_times + teleport fold) — on a
SuiteSparse-scale banded graph (512k rows) with the auto-selected Pallas
kernel, plus sharded PageRank on a 1-device mesh (the multi-chip program:
shard_map + psum convergence; N>1 chips are not reachable from this host,
the 8-virtual-device CPU suite covers the collective logic).

Each solve is one device dispatch (whole fixpoint inside lax.while_loop),
so wall time of a *second* call (compile excluded, result synced) over the
iteration count is an honest iterations/s figure — per-iteration work is
one semiring SpMV, so iters/s × nnz = effective Gnnz/s.

Writes results/fixpoint_tpu.json. Run from /root/repo.
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

    from sparseharness_tpu.algorithms import bfs, pagerank, sssp
    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.gold import (
        bfs_reach_gold, pagerank_gold, sssp_gold,
    )
    from sparseharness_tpu.parallel import make_mesh, sharded_pagerank

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 19 if on_tpu else 1 << 12
    g = banded_coo(n, 3, seed=7)          # band 3 → 7 nnz/row, diameter n/3
    # correctness gate on a small instance of the same structure
    gs = banded_coo(1 << 10, 3, seed=7)
    small = {
        "bfs": np.array_equal(np.asarray(bfs(gs, 0).x), bfs_reach_gold(gs, 0)),
        "sssp": bool(np.allclose(np.asarray(sssp(gs, 0).x),
                                 sssp_gold(gs, 0), rtol=1e-5)),
        "pagerank": bool(np.allclose(np.asarray(pagerank(gs).x),
                                     pagerank_gold(gs), atol=1e-5)),
    }

    out = {"backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "graph": f"banded n={n} nnz={g.nnz}",
           "gold_small": small, "solves": {}}

    # PageRank converges in tens of iterations on any structure; BFS/SSSP on
    # a pure band need O(n/band) — cap them so a solve is seconds, and rate
    # over the capped run (each capped iteration is identical work)
    cap = 512 if on_tpu else 32

    def rate(name, solver):
        # solver = prebuilt factory (return_solver=True): the timed call
        # reruns ONLY the jitted on-device fixpoint — operand build and
        # upload happen once, like the reference's Harness ctor
        solver()                   # compile + warm
        t0 = time.perf_counter()
        res = solver()
        np.asarray(np.asarray(res.x).ravel()[:1])
        dt = time.perf_counter() - t0
        iters = int(res.iterations)
        out["solves"][name] = {
            "iterations": iters,
            "wall_s": round(dt, 4),
            "iters_per_s": round(iters / dt, 2) if dt > 0 else 0.0,
            "effective_gnnz_per_s": round(iters / dt * g.nnz / 1e9, 3)
            if dt > 0 else 0.0,
            "converged": bool(res.converged),
        }

    rate("bfs_or_and",
         bfs(g, 0, variant="auto", max_iter=cap, return_solver=True))
    rate("sssp_min_plus",
         sssp(g, 0, variant="auto", max_iter=cap, return_solver=True))
    rate("pagerank",
         pagerank(g, variant="auto", max_iter=cap, return_solver=True))

    mesh = make_mesh(1)
    rate("sharded_pagerank_1dev",
         sharded_pagerank(g, mesh=mesh, max_iter=cap, return_solver=True))

    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("results/fixpoint_tpu.json", "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Experiment sweep driver — the scripts/experiments/run_all.sh analogue.

For each matrix × kernel variant × geometry: benchmark with gold check and
append results to a JSONL (and optional SQL) sink. Resumable by filesystem
convention like the reference's per-(matrix, kernel) result tarballs +
runstatus.txt (run_all.sh:90, :2): a (matrix, point) pair whose result file
already exists is skipped, so an interrupted sweep continues where it
stopped. Nonzero-failure points are recorded and the sweep moves on
(run_all.sh:80-85 semantics — no retries, log and continue).

Usage:
  python scripts/run_experiments.py --matrices m1.mtx m2.mtx \
      --outdir results/ [--variants bsr_fused ell] [--trials 5]
  python scripts/run_experiments.py --synthetic --outdir results/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--matrices", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true",
                   help="add banded/power-law/random synthetic workloads")
    p.add_argument("--variants", nargs="*", default=None)
    p.add_argument("--runfile", default=None,
                   help="reference-style runfile CSV: sweep its launch "
                        "geometries (mapped to block geometries) instead of "
                        "the default grid; applied to each --variants entry "
                        "(BASELINE config #2)")
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--inner-iters", type=int, default=1)
    p.add_argument("--reorder", default=None, choices=["rcm"],
                   help="apply RCM bandwidth reduction to each matrix "
                        "before the sweep (SpMV is permutation-equivalent); "
                        "result files are tagged '<matrix>+rcm' so they sit "
                        "beside the unreordered points — the remedy the "
                        "blocked-layout guards name for scattered structure")
    p.add_argument("--outdir", required=True)
    p.add_argument("--experiment-id", default="sweep")
    p.add_argument("--sql", action="store_true", help="also write .sql files")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (validation runs)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: axon remote-compiles cost 30-120s per
    # program; cached reruns are milliseconds (CLAUDE.md gotchas)
    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from sparseharness_tpu.formats import (
        read_mtx, banded_coo, power_law_coo, random_coo,
    )
    from sparseharness_tpu.gold import spmv_gold, spmv_abs_bound
    from sparseharness_tpu.algorithms import make_spmv_problem
    from sparseharness_tpu.harness import (
        BenchmarkConfig, benchmark_spmv, default_sweep, load_runfile,
        to_jsonl, to_sql,
    )

    os.makedirs(args.outdir, exist_ok=True)
    status_path = os.path.join(args.outdir, "runstatus.txt")

    matrices = {}
    for m in args.matrices:
        matrices[os.path.basename(m)] = read_mtx(m)
    if args.reorder == "rcm":
        from sparseharness_tpu.formats.reorder import bandwidth, reorder_rcm

        reordered = {}
        for name, coo in matrices.items():
            try:
                b0 = bandwidth(coo)
                rc, _ = reorder_rcm(coo)
            except ValueError as e:      # e.g. non-square matrix
                print(f"{name}: rcm skipped ({e}); sweeping unreordered")
                reordered[name] = coo
                continue
            print(f"{name}: rcm bandwidth {b0} -> {bandwidth(rc)}")
            reordered[name + "+rcm"] = rc
        matrices = reordered
    if args.synthetic:
        matrices["synthetic_banded"] = banded_coo(1 << 14, 15, seed=1)
        matrices["synthetic_power"] = power_law_coo(1 << 13, 1 << 16, seed=2)
        matrices["synthetic_random"] = random_coo(1 << 13, 1 << 13, 1 << 16, seed=3)
    if not matrices:
        p.error("no matrices: pass --matrices and/or --synthetic")

    if args.runfile:
        points = []
        for v in (args.variants or ["bsr_pallas"]):
            points.extend(load_runfile(args.runfile, v))
    else:
        points = default_sweep(args.variants)
    config = BenchmarkConfig(
        trials=args.trials, experiment_id=args.experiment_id,
        inner_iters=args.inner_iters,
    )

    n_done = n_skip = n_fail = 0
    with open(status_path, "a") as status:
        for mname, coo in matrices.items():
            gold = scale = None
            for pt in points:
                tag = f"{mname}__{pt.name().replace('@', '_')}"
                out_path = os.path.join(args.outdir, tag + ".jsonl")
                if os.path.exists(out_path):
                    n_skip += 1
                    continue
                try:
                    prob = make_spmv_problem(
                        coo, variant=pt.variant, geometry=pt.geometry, seed=11
                    )
                    if gold is None:
                        gold = spmv_gold(
                            coo, np.asarray(prob.x0), np.asarray(prob.y),
                            prob.sr,
                        )
                        # backward-error scale: cancellation-heavy inputs
                        # (1138_bus rows sum ≈ 0) need |A||x|-relative checks
                        scale = spmv_abs_bound(coo, np.asarray(prob.x0))
                    import dataclasses as _dc

                    cfg = config
                    if pt.geometry.value_dtype != "float32":
                        # reduced-precision storage vs f32 gold: bf16 has
                        # ~3 decimal digits; tolerance must match
                        cfg = _dc.replace(config, delta=max(config.delta, 2e-2))
                    res = benchmark_spmv(
                        prob, gold=gold, config=cfg, geometry=pt.geometry,
                        matrix_name=mname, nnz=coo.nnz, gold_scale=scale,
                    )
                except NotImplementedError as e:
                    status.write(f"SKIP {tag}: {e}\n")
                    n_skip += 1
                    continue
                except Exception as e:  # record and continue (run_all.sh:80)
                    status.write(f"FAIL {tag}: {e}\n")
                    traceback.print_exc()
                    n_fail += 1
                    continue
                with open(out_path, "w") as f:
                    for r in res.records:
                        f.write(to_jsonl(r) + "\n")
                if args.sql:
                    with open(out_path[:-6] + ".sql", "w") as f:
                        for r in res.records:
                            f.write(to_sql(r, "results") + "\n")
                status.write(f"DONE {tag}: {res.summary()}\n")
                print(f"{tag}: {res.summary()}")
                n_done += 1

    summary = {"done": n_done, "skipped": n_skip, "failed": n_fail}
    print(json.dumps(summary))
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

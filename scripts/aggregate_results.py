#!/usr/bin/env python
"""Aggregate experiment results — the gather_all.sh / analyse.sh /
best_kernel_for_matrix.sql analogue.

The reference greps PROFILING_DATUM and INSERT lines out of result files
and aggregates them in MySQL (scripts/experiments/postprocessing/*,
analysis/best_kernel_for_matrix.sql). Here results are already structured
JSONL (one file per matrix × sweep point, written by run_experiments.py);
this tool merges them, prints the best-kernel-per-matrix table, and can
emit a combined SQL dump for the reference's own pipeline.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("outdir", help="directory of run_experiments.py JSONLs")
    p.add_argument("--sql-dump", default=None,
                   help="write all records as SQL INSERTs here")
    p.add_argument("--table", default="results")
    args = p.parse_args()

    records = []
    for path in sorted(glob.glob(os.path.join(args.outdir, "*.jsonl"))):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    records.append(json.loads(line))
    if not records:
        print(f"no records under {args.outdir}", file=sys.stderr)
        return 1

    # best median per matrix among correct configurations
    med = [
        r for r in records
        if r["statistic"] == "MEDIAN_RESULT"
        and r["correctness"] in ("correct", "generally_correct", "not_checked")
    ]
    by_matrix = collections.defaultdict(list)
    for r in med:
        by_matrix[r["matrix"]].append(r)

    print(f"{'matrix':28s} {'best kernel':28s} {'ms':>9s} {'Gnnz/s':>8s} {'roofline':>9s}")
    sub_jitter = False
    for m, rs in sorted(by_matrix.items()):
        best = min(rs, key=lambda r: r["time_ns"])
        # bounded_only rides in the record since r5 (the runner marks any
        # row whose two-point diff collapsed below dispatch jitter even at
        # the escalated chain cap — an upper bound, not a measurement);
        # the frac>1.2 recompute keeps pre-r5 rows honest
        mark = " *" if (best.get("extra", {}).get("bounded_only")
                        or best["roofline_frac"] > 1.2) else ""
        sub_jitter = sub_jitter or bool(mark)
        print(
            f"{m:28s} {best['kernel'] + '@' + best['geometry']:28s} "
            f"{best['time_ns'] / 1e6:9.3f} {best['gnnz_per_s']:8.2f} "
            f"{best['roofline_frac'] * 100:8.1f}%{mark}"
        )
    if sub_jitter:
        print("  * two-point diff below dispatch jitter: per-op time for "
              "this tiny matrix is unresolved (upper bound only)")

    # correctness tally — the all_kernel_test.sh failure count analogue
    tally = collections.Counter(r["correctness"] for r in records)
    print("\ncorrectness tally:", dict(tally))

    if args.sql_dump:
        from sparseharness_tpu.harness.stats import BenchRecord, Statistic, to_sql
        from sparseharness_tpu.gold.check import Correctness

        with open(args.sql_dump, "w") as f:
            for r in records:
                rec = BenchRecord(
                    time_ns=r["time_ns"],
                    correctness=Correctness(r["correctness"]),
                    kernel=r["kernel"], geometry=r["geometry"],
                    trial=r["trial"], iteration=r["iteration"],
                    statistic=Statistic(r["statistic"]), matrix=r["matrix"],
                    experiment_id=r["experiment_id"], device=r["device"],
                    host=r["host"], nnz=r["nnz"],
                )
                f.write(to_sql(rec, args.table) + "\n")
        print(f"wrote {len(records)} SQL rows to {args.sql_dump}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

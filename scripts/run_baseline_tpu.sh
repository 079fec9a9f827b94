#!/usr/bin/env bash
# BASELINE.json reproduction — run from /root/repo on the TPU-attached host.
#
# Config #1: the five reference example matrices × the full default
#            variant×geometry sweep (gold-checked, 5 trials each).
# Config #2: the reference runfile.csv / runfile2.csv launch-geometry
#            sweeps mapped onto block geometries (harness/sweep.py:
#            load_runfile) for the Pallas BSR kernel.
# Config #1+rcm: the blocked Pallas variants again with RCM bandwidth
#            reduction applied first — the remedy the padding-blowup
#            guards name when scattered structure (matrix.mtx, matrix2)
#            refuses the blocked layouts.
#
# Results land in results/baseline_tpu/ as one JSONL (+ .sql) per
# (matrix, sweep point); interrupted runs resume (existing files skip).
# Aggregate with:  python scripts/aggregate_results.py results/baseline_tpu
set -euo pipefail
cd "$(dirname "$0")/.."

M=/root/reference/example
MATRICES="$M/matrix.mtx $M/matrix2.mtx $M/matrix3.mtx $M/matrix4.mtx $M/matrix5.mtx"

python scripts/run_experiments.py \
  --matrices $MATRICES \
  --outdir results/baseline_tpu --trials 5 --sql \
  --experiment-id baseline_config1 "$@"

python scripts/run_experiments.py \
  --matrices $MATRICES \
  --runfile "$M/runfile2.csv" --variants bsr_pallas \
  --outdir results/baseline_tpu --trials 5 --sql \
  --experiment-id baseline_config2 "$@"

python scripts/run_experiments.py \
  --matrices $MATRICES \
  --variants bsr_band bsr_fused bsr_ell bsr_pallas sell2 --reorder rcm \
  --outdir results/baseline_tpu --trials 5 --sql \
  --experiment-id baseline_config1_rcm "$@"

python scripts/aggregate_results.py results/baseline_tpu \
  | tee results/baseline_tpu/best_kernel_table.txt

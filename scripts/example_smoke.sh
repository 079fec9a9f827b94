#!/usr/bin/env bash
# Per-algorithm smoke runs — the scripts/example/*.sh analogue
# (reference: scripts/example/{spmv,sssp,bfs,pr,scc,eigenvector}.sh, pinned
# to the example/ matrices). Uses the reference examples when mounted, else
# generates a synthetic workload.
set -euo pipefail
cd "$(dirname "$0")/.."

MTX=${1:-/root/reference/example/matrix.mtx}
if [ ! -f "$MTX" ]; then
  MTX=$(mktemp /tmp/smoke_XXXX.mtx)
  python - "$MTX" <<'EOF'
import sys
from sparseharness_tpu.formats import random_graph_coo, write_mtx
write_mtx(sys.argv[1], random_graph_coo(500, 3.0, seed=1))
EOF
fi

run() { echo "== $*"; python -m sparseharness_tpu.cli.runner "$@"; }

# logic smoke runs on CPU by default (TPU remote compiles cost 30-120s per
# program and perf is bench.py's job); SMOKE_TPU=1 exercises the real chip
# with the persistent compile cache
python -c "
import os
import jax
if os.environ.get('SMOKE_TPU', '0') != '1':
    jax.config.update('jax_platforms', 'cpu')
else:
    jax.config.update('jax_compilation_cache_dir', '/tmp/sh_tpu_jax_cache')
from sparseharness_tpu.cli.main import spmv_main, sssp_main, bfs_main, pr_main, scc_main, eigenvector_main
import sys
m = '$MTX'
for name, fn, extra in [
    ('spmv', spmv_main, []),
    ('sssp', sssp_main, ['--root', '0']),
    ('bfs', bfs_main, ['--root', '0']),
    ('pagerank', pr_main, []),
    ('scc', scc_main, []),
    ('eigenvector', eigenvector_main, []),
]:
    print('==', name)
    rc = fn(['-m', m, '-n', '2'] + extra)
    assert rc == 0, name
print('ALL SMOKE OK')
"

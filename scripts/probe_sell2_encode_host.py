"""Host encode-throughput artifact: parse + sell2 encode rates on the
bench zipf workload (VERDICT r4 next #3 — the reference treats encode as a
first-class measured path, app/just_parser.cpp:69-94).

Writes results/sell2_encode_host.json. Measures steady state (best of N
after a warmup build: the first build pays one-time page-fault costs this
virtualized host charges at ~50 µs/page; fastmtx_tune_malloc keeps the
working set warm across builds, which is also how a production encode loop
behaves).

Run: python scripts/probe_sell2_encode_host.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARSEHARNESS_TPU_ENCODE_TIMINGS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sparseharness_tpu.formats import read_mtx, write_mtx  # noqa: E402
from sparseharness_tpu.formats.generate import power_law_coo  # noqa: E402
from sparseharness_tpu.ops import build_operand  # noqa: E402
from sparseharness_tpu.ops import pallas_sell2 as ps  # noqa: E402
from sparseharness_tpu.semiring import PLUS_TIMES  # noqa: E402

TRIALS = 5


def best_encode(coo, native: bool):
    os.environ["SPARSEHARNESS_TPU_NATIVE"] = "1" if native else "0"
    build_operand(coo, PLUS_TIMES, "sell2")  # warm (pages + imports)
    best, stages = 9e9, None
    for _ in range(TRIALS):
        ps.ENCODE_TIMINGS.clear()
        t0 = time.perf_counter()
        build_operand(coo, PLUS_TIMES, "sell2")
        dt = time.perf_counter() - t0
        if dt < best:
            best, stages = dt, dict(ps.ENCODE_TIMINGS)
    return best, stages


def main():
    # the bench.py ragged workload (bench.py:140-142)
    coo = power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13)

    # parse rate over the same matrix serialized to disk
    path = "/tmp/sell2_encode_probe.mtx"
    write_mtx(path, coo)
    read_mtx(path)  # warm
    t_parse = 9e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        read_mtx(path)
        t_parse = min(t_parse, time.perf_counter() - t0)

    t_native, stages = best_encode(coo, native=True)
    t_numpy, _ = best_encode(coo, native=False)

    out = {
        "matrix": f"zipf n={coo.shape[0]} nnz={coo.nnz}",
        "host": "cpu",
        "trials": TRIALS,
        "parse_s": round(t_parse, 3),
        "parse_mnnz_per_s": round(coo.nnz / t_parse / 1e6, 1),
        "sell2_encode_native_s": round(t_native, 3),
        "sell2_encode_native_mnnz_per_s": round(coo.nnz / t_native / 1e6, 2),
        "sell2_encode_numpy_s": round(t_numpy, 3),
        "sell2_encode_numpy_mnnz_per_s": round(coo.nnz / t_numpy / 1e6, 2),
        "speedup_native_vs_numpy": round(t_numpy / t_native, 2),
        "native_stages_s": {k: round(v, 4) for k, v in sorted(
            stages.items(), key=lambda kv: -kv[1])},
        "note": "r5 native encode core (sort_fold + heavy_split + per-slab "
                "phase A/B/fills in fast_mtx.cpp, 2-thread slab pool, "
                "bitset packer, malloc arena reuse); bit-identical to the "
                "NumPy path (tests/test_native.py, tests/test_sell2.py)",
    }
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "sell2_encode_host.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

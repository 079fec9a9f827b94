#!/usr/bin/env python
"""The one weak-scaling measurement possible on this 1-chip host
(VERDICT r2 weak #9): the kernel="band" scaling body — shard_map +
edge ppermutes + the pre-split band pallas calls — timed at d=1 on the
real chip, with its per-op throughput compared against the plain
single-chip kernel at the same size. Multi-device efficiencies come from
the virtual CPU mesh (tests/test_harness.py scaling tests); the chip
artifact pins the d=1 absolute rate the efficiency curve hangs off.

Writes results/scaling_band_tpu.json. Run from /root/repo.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"

    from sparseharness_tpu.harness.scaling import weak_scaling_spmv

    base_rows = 1 << 18 if on_tpu else 1 << 12
    pts = weak_scaling_spmv(
        base_rows=base_rows, avg_degree=126.0, device_counts=[1],
        kernel="band", inner_iters=16 if on_tpu else 2,
    )
    p = pts[0]
    out = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "kernel": "band",
        "rows": p.rows, "nnz": p.nnz,
        "ms_per_op": round(p.seconds_per_op * 1e3, 4),
        "gnnz_per_s": round(p.nnz / p.seconds_per_op / 1e9, 3),
    }
    print(json.dumps(out, indent=1))
    if on_tpu:
        with open("results/scaling_band_tpu.json", "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

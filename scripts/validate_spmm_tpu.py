"""SpMM chip evidence (VERDICT r4 weak #5: the 4.5 TFLOP/s band-SpMM
claim appeared in README/PARITY/ops/spmm.py with no committed artifact).

Measures on the real TPU, chained two-point clock:
- band MXU SpMM (ops/pallas_bsr_band.spmm_band) TFLOP/s at m ∈ {128, 256}
  on the bench banded workload (512k rows, 127 nnz/row);
- strip tile-SpMM (ops/spmm_tiles.spmm_bsr_ell) Gnnz/s at m ∈ {8, 128}
  on the 33.5M-nnz random-block workload, plus the min_plus (VPU) path;
- correctness of each measured point vs column-stacked SpMV golds on a
  small slice.

Writes results/spmm_tpu.json. Run from /root/repo on the TPU backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")

from sparseharness_tpu.formats import banded_coo, block_random_coo
from sparseharness_tpu.gold import spmv_gold
from sparseharness_tpu.ops import build_operand, spmm
from sparseharness_tpu.semiring import MIN_PLUS, PLUS_TIMES

report = {"backend": jax.default_backend(), "band_mxu": {}, "tiles": {}}


def chain_time(fn, x0, op, k1=8, k2=16, trials=5):
    # op rides as a jit ARGUMENT: closed-over operands embed as HLO
    # constants and a large operand blows the remote compile service's
    # request-size limit (HTTP 413) — r4 probe gotcha
    def chained(kk):
        def f(xc, opx):
            def body(c, _):
                return fn(opx, c), None
            out, _ = jax.lax.scan(body, xc, None, length=kk)
            return out
        return jax.jit(f)
    f1, f2 = chained(k1), chained(k2)
    np.asarray(f1(x0, op).ravel()[:1])
    np.asarray(f2(x0, op).ravel()[:1])
    w1, w2 = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(f1(x0, op).ravel()[:1])
        w1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(x0, op).ravel()[:1])
        w2.append(time.perf_counter() - t0)
    return (min(w2) - min(w1)) / (k2 - k1)


def gold_check(coo, op, variant_sr, m=4, sr=PLUS_TIMES):
    rng = np.random.default_rng(7)
    xb = rng.uniform(0.2, 1.0, (coo.shape[1], m)).astype(np.float32)
    if sr is MIN_PLUS:
        xb = xb * 10.0
    out = np.asarray(spmm(op, jnp.asarray(xb, sr.dtype), sr=sr,
                          n_rows=coo.shape[0]))
    gold = np.stack([
        spmv_gold(coo, xb[:, j], np.zeros(coo.shape[0], np.float32), sr)
        for j in range(m)
    ], axis=1)
    return bool(np.allclose(out, gold, rtol=2e-3, atol=1e-3))


rng = np.random.default_rng(0)

# ---- band MXU SpMM ----------------------------------------------------
n = 1 << 19
band = 63
coo = banded_coo(n, band, seed=1)
op = build_operand(coo, PLUS_TIMES, "bsr_band")
small = banded_coo(2048, 8, seed=2)
ok_band = gold_check(small, build_operand(small, PLUS_TIMES, "bsr_band"),
                     "bsr_band")
for m in (128, 256):
    xb = jnp.asarray(rng.uniform(0.2, 1.0, (n, m)).astype(np.float32))
    t = chain_time(
        lambda opx, xc: spmm(opx, xc, sr=PLUS_TIMES, n_rows=n), xb, op)
    flops = 2.0 * coo.nnz * m
    report["band_mxu"][f"m{m}"] = {
        "us_per_op": round(t * 1e6, 1),
        "tflop_per_s": round(flops / t / 1e12, 3),
        "gnnz_per_s": round(coo.nnz / t / 1e9, 2),
        "gold_small": ok_band,
    }
    print("band", m, report["band_mxu"][f"m{m}"], flush=True)

# ---- strip tile-SpMM --------------------------------------------------
nb = 131072
gb = block_random_coo(nb, blocks_per_row=2, bm=8, bn=128, seed=5)
opb = build_operand(gb, PLUS_TIMES, "bsr_ell")
smallb = block_random_coo(2048, 2, bm=8, bn=128, seed=3)
ok_tiles = gold_check(smallb, build_operand(smallb, PLUS_TIMES, "bsr_ell"),
                      "bsr_ell")
ok_tiles_mp = gold_check(
    smallb, build_operand(smallb, MIN_PLUS, "bsr_ell"), "bsr_ell",
    sr=MIN_PLUS)
for m in (8, 128):
    xb = jnp.asarray(rng.uniform(0.2, 1.0, (nb, m)).astype(np.float32))
    t = chain_time(lambda opx, xc: spmm(opx, xc, sr=PLUS_TIMES, n_rows=nb),
                   xb, opb)
    report["tiles"][f"plus_times_m{m}"] = {
        "us_per_op": round(t * 1e6, 1),
        "gnnz_per_s": round(gb.nnz / t / 1e9, 2),
        "tflop_per_s": round(2.0 * gb.nnz * m / t / 1e12, 3),
        "gold_small": ok_tiles,
    }
    print("tiles", m, report["tiles"][f"plus_times_m{m}"], flush=True)
opm = build_operand(gb, MIN_PLUS, "bsr_ell")
xb = jnp.asarray(rng.uniform(0.2, 1.0, (nb, 128)).astype(np.float32))
t = chain_time(lambda opx, xc: spmm(opx, xc, sr=MIN_PLUS, n_rows=nb),
               xb, opm)
report["tiles"]["min_plus_m128"] = {
    "us_per_op": round(t * 1e6, 1),
    "gnnz_per_s": round(gb.nnz / t / 1e9, 2),
    "gold_small": ok_tiles_mp,
}
print("tiles min_plus", report["tiles"]["min_plus_m128"], flush=True)

dst = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "spmm_tpu.json")
with open(dst, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report, indent=1))

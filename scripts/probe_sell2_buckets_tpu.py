"""Per-bucket sell2 panel-cost calibration on chip (VERDICT r4 next #2 /
weak #8): the roofline VPU ceiling charged EVERY panel a flat 16 tile-ops,
blending buckets — depth-0 single-tile panels (the majority on scattered
structure; that's why split_calls exists) run materially fewer crossbars
than depth-3 two-tile ones.

Method: build the bench zipf operand (split_calls buckets panels by
(depth-group, two_tiles) with has_hi riding the slab), then for each
bucket class present, construct TWO sliced operands that keep only that
bucket's calls — one full, one with every such call's panel count halved
(slab arrays row-sliced; all other calls dropped). The chained two-point
marginal between them is the pure per-panel cost of that bucket on the
real workload: x-prep, virtual-chunk gather, launch overheads and the
other buckets' absence all cancel.

The kernel op-mix model (crossbars C, transposes T per panel —
ops/pallas_sell2._panel_call):

  C(d, tt, hh) = 8 + 2·tt + (d + hh)·(1 + tt)
  T(hh)        = 4 + hh

A least-squares fit of marginal ≈ kc·C + kt·T over the measured buckets
gives the per-op costs that harness/roofline.py uses for an exact
per-layout ceiling. Writes results/sell2_buckets_tpu.json.

Run from /root/repo on the TPU backend.
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

from sparseharness_tpu.formats.generate import power_law_coo
from sparseharness_tpu.ops import build_operand
from sparseharness_tpu.ops.pallas_sell2 import (
    LANES, Sell2Operand, _SlabLayout, dp_sell2,
)
from sparseharness_tpu.semiring import PLUS_TIMES

sr = PLUS_TIMES


def bucket_of(lay: _SlabLayout):
    return (lay.depth, lay.two_tiles, lay.has_hi)


def keep_bucket(op: Sell2Operand, bucket, frac: float) -> Sell2Operand:
    """Operand with only `bucket`'s calls, each truncated to ceil(P·frac)
    panels (slab arrays row-sliced; other calls emptied, layouts kept so
    every row0 still emits an output tile)."""
    slabs, lays = [], []
    for slab, lay in zip(op.slabs, op.layouts):
        if slab is None or bucket_of(lay) != bucket or lay.panels == 0:
            slabs.append(None)
            lays.append(_SlabLayout(lay.row0, lay.rows, 0, lay.depth,
                                    lay.two_tiles, lay.has_hi))
            continue
        keep = max(1, int(np.ceil(lay.panels * frac)))
        slabs.append({
            "chunk": slab["chunk"][:keep],
            "wordA": slab["wordA"][: keep * LANES],
            "wordB": slab["wordB"][: keep * LANES],
            "vals": slab["vals"][: keep * LANES],
        })
        lays.append(_SlabLayout(lay.row0, lay.rows, keep, lay.depth,
                                lay.two_tiles, lay.has_hi))
    return Sell2Operand(
        slabs, tuple(lays), op.n_chunks, op.n_rows, op.base_pad,
        piece_owner=op.piece_owner, virt_blocks=op.virt_blocks)


def chain_time(op, x0, n, k1=32, k2=64, trials=5):
    def chained(kk):
        def f(xc, opx):
            def body(c, _):
                return dp_sell2(opx, c, sr, n_rows=n)[:n], None
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


def ops_model(d, tt, hh):
    c = 8 + 2 * int(tt) + (d + int(hh)) * (1 + int(tt))
    t = 4 + int(hh)
    return c, t


def main():
    report = {"backend": jax.default_backend(), "buckets": {}}
    coo = power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13)
    op = build_operand(coo, sr, "sell2")
    n = coo.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))

    # bucket census
    census = {}
    for lay in op.layouts:
        if lay.panels:
            b = bucket_of(lay)
            census[b] = census.get(b, 0) + lay.panels
    report["census"] = {str(k): v for k, v in sorted(census.items())}
    print("bucket census (depth, two_tiles, has_hi) -> panels:",
          report["census"], flush=True)

    rows = []
    for b, total in sorted(census.items(), key=lambda kv: -kv[1]):
        if total < 16:
            report["buckets"][str(b)] = {
                "panels": total, "skipped": "too few panels to resolve"}
            continue
        full = keep_bucket(op, b, 1.0)
        half = keep_bucket(op, b, 0.5)
        pf = sum(l.panels for l in full.layouts)
        ph = sum(l.panels for l in half.layouts)
        tf = chain_time(full, x, n)
        th = chain_time(half, x, n)
        marg = (tf - th) / (pf - ph)
        c, t = ops_model(*b)
        report["buckets"][str(b)] = {
            "panels": total, "panels_full": pf, "panels_half": ph,
            "us_full": round(tf * 1e6, 2), "us_half": round(th * 1e6, 2),
            "marginal_ns_per_panel": round(marg * 1e9, 1),
            "model_crossbars": c, "model_transposes": t,
        }
        rows.append((c, t, marg))
        print(b, report["buckets"][str(b)], flush=True)

    # least-squares fit marginal = kc*C + kt*T over measured buckets
    if len(rows) >= 2:
        A = np.array([[c, t] for c, t, _ in rows], np.float64)
        y = np.array([m for _, _, m in rows], np.float64)
        sol, res, _, _ = np.linalg.lstsq(A, y, rcond=None)
        pred = A @ sol
        report["fit"] = {
            "kc_ns_per_crossbar": round(float(sol[0]) * 1e9, 2),
            "kt_ns_per_transpose": round(float(sol[1]) * 1e9, 2),
            "max_rel_resid": round(float(
                np.max(np.abs(pred - y) / np.maximum(y, 1e-12))), 4),
            "note": "harness/roofline.py per-bucket ceiling constants "
                    "(VPU cycles: kc*0.94e9/cycle at 940 MHz)",
        }
        print("fit:", report["fit"], flush=True)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "sell2_buckets_tpu.json")
    with open(dst, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Chip-validate the sell2 ragged kernel: gold across all 7 semirings on a
power-law matrix, then chained-timing throughput vs the ell/coo_seg
fallbacks on a zipf matrix (α=1.5, ≥1M nnz) — the VERDICT r1 'missing #4'
done-criterion (≥10× ell). Writes results/sell2_tpu.json.

Run from /root/repo (axon backend needs cwd importability).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    print("backend:", jax.default_backend(), flush=True)

    from sparseharness_tpu.formats import power_law_coo
    from sparseharness_tpu.gold import spmv_gold, check_result, Correctness
    from sparseharness_tpu.gold.spmv import spmv_abs_bound
    from sparseharness_tpu.harness.runner import BenchmarkConfig, benchmark_spmv
    from sparseharness_tpu.algorithms.apps import make_spmv_problem
    from sparseharness_tpu.ops import Geometry, build_operand, spmv
    from sparseharness_tpu.semiring import REGISTRY, get_semiring

    report = {"backend": jax.default_backend(), "correctness": {},
              "throughput": {}}

    # ---- correctness: all semirings on a power-law matrix ---------------
    coo_f = power_law_coo(3000, 60_000, alpha=1.5, seed=11)
    rng = np.random.default_rng(12)
    for srname in sorted(REGISTRY):
        sr = get_semiring(srname)
        dt = np.dtype(sr.dtype)
        if dt == np.bool_:
            coo = coo_f.with_values((coo_f.vals != 0).astype(np.bool_))
            x = rng.random(coo.shape[1]) < 0.3
            y = rng.random(coo.shape[0]) < 0.3
        elif np.issubdtype(dt, np.integer):
            coo = coo_f.with_values((coo_f.vals * 50).astype(np.int32))
            x = rng.integers(0, 50, coo.shape[1]).astype(dt)
            y = rng.integers(0, 50, coo.shape[0]).astype(dt)
        else:
            coo = coo_f
            x = rng.uniform(0.1, 1.0, coo.shape[1]).astype(dt)
            y = rng.uniform(0.1, 1.0, coo.shape[0]).astype(dt)
        gold = spmv_gold(coo, x, y, sr)
        scale = (spmv_abs_bound(coo, x)
                 if sr.name in ("plus_times", "max_times") else None)
        op = build_operand(coo, sr, "sell2", Geometry())
        out = np.asarray(spmv(op, jnp.asarray(x), jnp.asarray(y), sr=sr,
                              variant="sell2", n_rows=coo.shape[0]))
        verdict = check_result(out, gold, delta=1e-4, scale=scale)
        report["correctness"][srname] = verdict.name
        print(f"sell2 × {srname}: {verdict.name}", flush=True)

    # ---- correctness of the virtual-chunk path on chip ------------------
    # wide scattered structure with sub-panel chunk segments: the builder
    # regroups them under synthetic xT tiles (Sell2Operand.virt_blocks)
    from sparseharness_tpu.formats.sparse import COO as _COO
    from sparseharness_tpu.ops.pallas_sell2 import CHUNK_COLS

    vr = np.random.default_rng(19)
    nv = 4096
    chv = np.repeat(np.arange(60), 64)
    bkv = np.repeat(np.tile(np.arange(4), 60), 16)
    vcoo = _COO(
        vr.integers(0, nv, chv.size).astype(np.int32),
        (chv * CHUNK_COLS + bkv * 128
         + vr.integers(0, 128, chv.size)).astype(np.int32),
        vr.uniform(0.1, 1.0, chv.size).astype(np.float32),
        (nv, 60 * CHUNK_COLS),
    )
    sr = get_semiring("plus_times")
    opv = build_operand(vcoo, sr, "sell2", Geometry())
    assert getattr(opv, "virt_blocks", None) is not None
    xv = vr.uniform(0.1, 1.0, vcoo.shape[1]).astype(np.float32)
    yv = vr.uniform(0.1, 1.0, vcoo.shape[0]).astype(np.float32)
    outv = np.asarray(spmv(opv, jnp.asarray(xv), jnp.asarray(yv), sr=sr,
                           variant="sell2", n_rows=nv))
    vv = check_result(outv, spmv_gold(vcoo, xv, yv, sr), delta=1e-4,
                      scale=spmv_abs_bound(vcoo, xv))
    report["correctness"]["plus_times@virtual_chunks"] = vv.name
    print(f"sell2 virtual-chunk path: {vv.name} "
          f"({opv.virt_blocks.shape[0]} vchunks)", flush=True)

    # ---- throughput: zipf α=1.5, ≥1M nnz --------------------------------
    big = power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13)
    print(f"zipf matrix: n={big.shape[0]} nnz={big.nnz}", flush=True)
    # inner_iters=1 → the runner sizes the chain to the operand
    # (_effective_inner_iters): the capped matrices need K≈128 for the
    # two-point signal to dwarf axon jitter — a fixed K=32 put the r3/r4
    # cap rows within the ~ms dispatch noise (±40% round-to-round)
    cfg = BenchmarkConfig(trials=5)
    for variant, geom in (
        ("sell2", Geometry()),
        ("sell2", Geometry(value_dtype="bfloat16")),
        ("ell", Geometry()),
        ("coo_seg", Geometry()),
    ):
        label = f"{variant}@{geom}"
        try:
            prob = make_spmv_problem(big, variant=variant, geometry=geom,
                                     seed=14)
            res = benchmark_spmv(prob, gold=None, config=cfg, geometry=geom,
                                 matrix_name="zipf500k", nnz=big.nnz)
            report["throughput"][label] = {
                "gnnz_per_s": res.gnnz_per_s,
                "roofline_frac": res.roofline_frac,
                "time_ns": res.median_ns,
            }
            print(f"{label}: {res.gnnz_per_s:.3f} Gnnz/s "
                  f"({res.roofline_frac*100:.1f}% roofline)", flush=True)
        except (NotImplementedError, MemoryError) as e:
            # ell legitimately cannot build this matrix: width = max row
            # length 267k ⇒ a 500 GB padded operand
            report["throughput"][label] = {"skipped": str(e)[:200]}
            print(f"{label}: skipped ({str(e)[:120]})", flush=True)
        with open("results/sell2_tpu.json", "w") as f:
            json.dump(report, f, indent=1)

    # ---- the ≥10×-ell criterion needs a matrix ell can even build. Two
    # caps: 512 shows sell2 on a near-full zipf tail; the ell/coo_seg
    # comparison itself runs at cap 128 / n=131072 (a cap-512 ell operand
    # is a 1 GB scalar-gather program that crashes the TPU worker) -------
    from sparseharness_tpu.formats.sparse import COO

    def cap_rows(coo, cap):
        lens = np.bincount(coo.rows, minlength=coo.shape[0])
        order = np.argsort(coo.rows, kind="stable")
        rank = np.arange(coo.nnz) - np.r_[0, np.cumsum(lens)][coo.rows[order]]
        keep = np.zeros(coo.nnz, bool)
        keep[order] = rank < cap
        return COO(coo.rows[keep], coo.cols[keep], coo.vals[keep], coo.shape)

    capped = cap_rows(power_law_coo(262_144, 2_400_000, alpha=1.5, seed=15),
                      512)
    print(f"capped zipf: n={capped.shape[0]} nnz={capped.nnz}", flush=True)
    report["capped"] = {"n": capped.shape[0], "nnz": int(capped.nnz)}
    prob = make_spmv_problem(capped, variant="sell2", seed=16)
    res = benchmark_spmv(prob, gold=None, config=cfg,
                         matrix_name="zipf262k_cap512", nnz=capped.nnz)
    report["throughput"]["capped/sell2"] = {
        "gnnz_per_s": res.gnnz_per_s, "roofline_frac": res.roofline_frac,
    }
    print(f"capped/sell2: {res.gnnz_per_s:.3f} Gnnz/s", flush=True)
    with open("results/sell2_tpu.json", "w") as f:
        json.dump(report, f, indent=1)

    c128 = cap_rows(power_law_coo(131_072, 1_200_000, alpha=1.5, seed=17),
                    128)
    print(f"cap128 zipf: n={c128.shape[0]} nnz={c128.nnz}", flush=True)
    report["cap128"] = {"n": c128.shape[0], "nnz": int(c128.nnz)}
    for variant in ("sell2", "ell", "coo_seg"):
        prob = make_spmv_problem(c128, variant=variant, seed=18)
        res = benchmark_spmv(prob, gold=None, config=cfg,
                             matrix_name="zipf131k_cap128", nnz=c128.nnz)
        report["cap128"][variant] = res.gnnz_per_s
        print(f"cap128/{variant}: {res.gnnz_per_s:.3f} Gnnz/s", flush=True)
        with open("results/sell2_tpu.json", "w") as f:
            json.dump(report, f, indent=1)

    el = report["cap128"].get("ell", 0.0)
    report["sell2_vs_ell"] = (report["cap128"]["sell2"] / el) if el else None
    print(f"sell2 vs ell (cap128 zipf): {report['sell2_vs_ell']}", flush=True)

    with open("results/sell2_tpu.json", "w") as f:
        json.dump(report, f, indent=1)
    ok = all(v == "CORRECT" for v in report["correctness"].values())
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""VERDICT r3 next #8: can bsr_fused's in-kernel x-block gather overlap
the strip stream, or is the 49%-of-roofline ceiling structural?

The Pallas pipeline already double-buffers the strip DMA against compute,
so the only overlap left to find would be gather-vs-multiply — but both
are VPU work in the same grid step. This probe times three variants of
the SAME kernel on chip (min-wall two-point chains):

  full    gather loop + strip multiply (production kernel)
  mult    strip multiply only (scratch read uninitialized)
  gather  gather loop only (dummy out write)

If t_full ≈ t_gather + t_mult the gather is serialized VPU work on the
critical path and no grid-axis restructuring can hide it (committing the
disproof). Also measures sell2 and bsr_ell on the same matrices for the
AUTO_CHAIN routing rationale. Writes results/fused_overlap_probe_tpu.json.

Run from /root/repo.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    print("backend:", jax.default_backend(), flush=True)

    from sparseharness_tpu.formats import block_random_coo, power_law_coo
    from sparseharness_tpu.formats.sparse import fold_duplicates, round_up
    from sparseharness_tpu.ops import Geometry, build_operand
    from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret
    from sparseharness_tpu.ops.pallas_bsr_fused import (
        _ROWS_PER_STEP_TARGET_BYTES, build_bsr_fused,
    )
    from sparseharness_tpu.ops.pallas_sell2 import dp_sell2
    from sparseharness_tpu.ops.pallas_bsr_ell import dp_bsr_ell
    from sparseharness_tpu.semiring import PLUS_TIMES

    sr = PLUS_TIMES

    def dp_fused_mode(op, x, mode):
        """dp_bsr_fused with the gather/multiply stages separable."""
        s, r_s, bm, kbn = op.strips.shape
        k = op.cols.shape[1] // r_s
        bn = kbn // k
        _, add, mul, reduce_, zero, _ = _carrier(sr)
        c_pad = round_up(max(x.shape[0], 1), bn)
        x_pad = jnp.pad(x, (0, c_pad - x.shape[0]))
        x2d = x_pad.reshape(-1, bn)
        rg = max(8, min(r_s, _ROWS_PER_STEP_TARGET_BYTES
                        // max(bm * kbn * 4, 1) // 8 * 8))
        while r_s % rg:
            rg -= 8
        grid = (r_s // rg,)

        def kernel(cols_ref, strip_ref, x_ref, out_ref, xt_ref):
            step = pl.program_id(0)
            base = step * rg * k
            if mode in ("full", "gather"):
                for kk in range(k):
                    def body(i8, carry, kk=kk):
                        rows = [
                            x_ref[pl.ds(
                                cols_ref[base + (i8 * 8 + j) * k + kk], 1), :]
                            for j in range(8)
                        ]
                        blk = jnp.concatenate(rows, axis=0)
                        dst = pl.multiple_of(i8 * 8, 8)
                        xt_ref[pl.ds(dst, 8), kk * bn:(kk + 1) * bn] = blk
                        return carry

                    jax.lax.fori_loop(0, rg // 8, body, 0)
            if mode in ("full", "mult"):
                xt = xt_ref[...][:, None, :]
                out_ref[...] = reduce_(mul(xt, strip_ref[...]), axis=-1)
            else:
                out_ref[...] = xt_ref[...][:, :bm]

        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((rg, bm, kbn), lambda i, c: (i, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rg, bm), lambda i, c: (i, 0)),
                scratch_shapes=[pltpu.VMEM((rg, kbn), x2d.dtype)],
            ),
            out_shape=jax.ShapeDtypeStruct((r_s, bm), x2d.dtype),
            interpret=_interpret(),
        )
        if s == 1:
            return call(op.cols[0], op.strips[0], x2d).reshape(-1)

        def body(_, slab):
            cols, st = slab
            return None, call(cols, st, x2d)

        _, outs = jax.lax.scan(body, None, (op.cols, op.strips))
        return outs.reshape(-1)

    def chain_time(fn, x, op, k1=32, k2=64, trials=5):
        # op rides as a jit ARGUMENT: closed-over operands embed as HLO
        # constants and a ≥400 MB operand blows the remote compile
        # service's request-size limit (HTTP 413)
        def chained(kk):
            def f(xc, opx):
                def body(c, _):
                    return fn(c, opx), None
                out, _ = jax.lax.scan(body, xc, None, length=kk)
                return out
            return jax.jit(f)
        f1, f2 = chained(k1), chained(k2)
        np.asarray(f1(x, op).ravel()[:1]); np.asarray(f2(x, op).ravel()[:1])
        w1, w2 = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(f1(x, op).ravel()[:1])
            w1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(x, op).ravel()[:1])
            w2.append(time.perf_counter() - t0)
        return (min(w2) - min(w1)) / (k2 - k1)

    report = {"backend": jax.default_backend()}
    n = 131_072
    # 2 dense (8,128) blocks per block-row = 33.5M nnz: big enough that
    # the strip stream dwarfs dispatch, small enough to build host-side
    gb = block_random_coo(n, blocks_per_row=2, bm=8, bn=128, seed=5)
    zipf = fold_duplicates(
        power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13),
        lambda a, b: a + b)
    print(f"block matrix: n={n} nnz={gb.nnz}; zipf nnz={zipf.nnz}",
          flush=True)

    rng = np.random.default_rng(2)
    xb = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    opf = build_bsr_fused(gb, sr)

    stage = {}
    for mode in ("full", "mult", "gather"):
        t = chain_time(lambda c, o, m=mode: dp_fused_mode(o, c, m)[:n],
                       xb, opf)
        stage[mode] = t
        print(f"bsr_fused[{mode}]: {t*1e6:.1f} us/op "
              f"{gb.nnz/t/1e9:.2f} Gnnz/s", flush=True)
    serial_sum = stage["mult"] + stage["gather"]
    report["stages_us"] = {m: round(v * 1e6, 2) for m, v in stage.items()}
    report["serial_sum_us"] = round(serial_sum * 1e6, 2)
    report["overlap_headroom"] = round(
        (serial_sum - stage["full"]) / stage["full"], 4)
    report["structural"] = bool(stage["full"] > 0.9 * serial_sum)
    print(f"full {stage['full']*1e6:.1f} vs gather+mult "
          f"{serial_sum*1e6:.1f} us -> structural={report['structural']}",
          flush=True)
    with open("results/fused_overlap_probe_tpu.json", "w") as fj:
        json.dump(report, fj, indent=1)

    # routing crossover: bsr_fused vs sell2 (+ bsr_ell) on both structures
    report["routing"] = {}
    for name, coo, x in (("block", gb, xb),
                         ("zipf", zipf, jnp.asarray(
                             rng.uniform(0.1, 1.0, zipf.shape[0])
                             .astype(np.float32)))):
        row = {}
        nr = coo.shape[0]
        for variant, dp in (
            ("bsr_fused", lambda op, c, nr=nr: dp_fused_mode(op, c, "full")),
            ("sell2", lambda op, c, nr=nr: dp_sell2(op, c, sr, n_rows=nr)),
            ("bsr_ell", lambda op, c, nr=nr: dp_bsr_ell(op, c, sr,
                                                        n_rows=nr)),
        ):
            try:
                op = (build_bsr_fused(coo, sr) if variant == "bsr_fused"
                      else build_operand(coo, sr, variant, Geometry()))
                t = chain_time(
                    lambda c, o, dp=dp, nr=nr: dp(o, c)[:nr], x, op)
                row[variant] = {"us_per_op": round(t * 1e6, 1),
                                "gnnz_per_s": round(coo.nnz / t / 1e9, 3)}
            except Exception as e:   # capability guards + runtime limits
                row[variant] = {"skipped": f"{type(e).__name__}: "
                                           f"{str(e)[:120]}"}
            print(f"{name}/{variant}: {row[variant]}", flush=True)
        report["routing"][name] = row
        with open("results/fused_overlap_probe_tpu.json", "w") as fj:
            json.dump(report, fj, indent=1)

    with open("results/fused_overlap_probe_tpu.json", "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""bsr_fused v3 probe: can the residual gather/multiply cost hide under
the strip DMA? r5 state: 245 us/op at 0.67 HBM frac on the 33.5M-nnz
random-block workload; the strip-DMA-only floor is ~181 us (0.90 frac).

Variants (same semantics, same operand):
  base  — production r5 kernel (unrolled gather then one wide reduce)
  pipe  — software-pipelined gather: step i gathers step i+1's x blocks
          into the other half of a double-buffered xt scratch while
          multiplying step i from the half filled last step (gather LSU
          work interleaves with multiply ALU work in one step's stream)
  kloop — multiply as K static slices (rg, bm, bn) reduce+accumulate
          instead of one (rg, bm, K*bn) wide reduce
  pipe2 — pipe + kloop

Writes results/fused_v3_probe_tpu.json. Run from /root/repo on TPU.
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats import block_random_coo
from sparseharness_tpu.formats.sparse import round_up
from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret
from sparseharness_tpu.ops.pallas_bsr_fused import (
    _ROWS_PER_STEP_TARGET_BYTES, build_bsr_fused,
)
from sparseharness_tpu.semiring import PLUS_TIMES

sr = PLUS_TIMES
_, add_, mul_, reduce_, zero_, _ = _carrier(sr)


def dp_variant(op, x, mode):
    s, r_s, bm, kbn = op.strips.shape
    k = op.cols.shape[1] // r_s
    bn = kbn // k
    c_pad = round_up(max(x.shape[0], 1), bn)
    x_pad = jnp.pad(x, (0, c_pad - x.shape[0]))
    x2d = x_pad.reshape(-1, bn)
    rg = max(8, min(r_s, _ROWS_PER_STEP_TARGET_BYTES
                    // max(bm * kbn * 4, 1) // 8 * 8))
    while r_s % rg:
        rg -= 8
    steps = r_s // rg
    grid = (steps,)
    pipe = mode in ("pipe", "pipe2")
    kloop = mode in ("kloop", "pipe2")

    def gather_into(cols_ref, x_ref, xt_ref, step, buf):
        base = step * rg * k
        for kk in range(k):
            rows = [
                x_ref[pl.ds(cols_ref[base + r * k + kk], 1), :]
                for r in range(rg)
            ]
            blk = jnp.concatenate(rows, axis=0)
            if buf is None:
                xt_ref[:, kk * bn:(kk + 1) * bn] = blk
            else:
                xt_ref[buf, :, kk * bn:(kk + 1) * bn] = blk

    def multiply(strip_ref, xt, out_ref):
        if kloop:
            acc = None
            for kk in range(k):
                part = reduce_(
                    mul_(xt[:, None, kk * bn:(kk + 1) * bn],
                         strip_ref[:, :, kk * bn:(kk + 1) * bn]),
                    axis=-1)
                acc = part if acc is None else add_(acc, part)
            out_ref[...] = acc
        else:
            out_ref[...] = reduce_(mul_(xt[:, None, :], strip_ref[...]),
                                   axis=-1)

    if not pipe:
        def kernel(cols_ref, strip_ref, x_ref, out_ref, xt_ref):
            step = pl.program_id(0)
            gather_into(cols_ref, x_ref, xt_ref, step, None)
            multiply(strip_ref, xt_ref[...], out_ref)

        scratch = [pltpu.VMEM((rg, kbn), x2d.dtype)]
    else:
        def kernel(cols_ref, strip_ref, x_ref, out_ref, xt_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                gather_into(cols_ref, x_ref, xt_ref, 0, 0)

            cur = step % 2
            # gather the NEXT step's blocks (clamped at the end) into the
            # other buffer — its LSU traffic interleaves with this step's
            # multiply ALU work
            nxt = jnp.minimum(step + 1, steps - 1)
            multiply(strip_ref, xt_ref[cur], out_ref)
            gather_into(cols_ref, x_ref, xt_ref, nxt, (step + 1) % 2)

        scratch = [pltpu.VMEM((2, rg, kbn), x2d.dtype)]

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
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((r_s, bm), x2d.dtype),
        interpret=_interpret(),
    )
    if s == 1:
        return call(op.cols[0], op.strips[0], x2d).reshape(-1)
    outs = [call(op.cols[i], op.strips[i], x2d) for i in range(s)]
    return jnp.stack(outs).reshape(-1)


def chain_time(fn, x, op, k1=32, k2=64, trials=5):
    def chained(kk):
        def f(xc, opx):
            def body(c, _):
                return fn(c, opx)[: len(xc)], None
            out, _ = jax.lax.scan(body, xc, None, length=kk)
            return out
        return jax.jit(f)
    f1, f2 = chained(k1), chained(k2)
    np.asarray(f1(x, op).ravel()[:1])
    np.asarray(f2(x, op).ravel()[:1])
    w1, w2 = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(f1(x, op).ravel()[:1])
        w1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f2(x, op).ravel()[:1])
        w2.append(time.perf_counter() - t0)
    return (min(w2) - min(w1)) / (k2 - k1)


def main():
    report = {"backend": jax.default_backend(), "modes": {}}
    n = 131072
    coo = block_random_coo(n, blocks_per_row=2, bm=8, bn=128, seed=5)
    op = build_bsr_fused(coo, sr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))
    ref = None
    for mode in ("base", "kloop", "pipe", "pipe2"):
        try:
            out = np.asarray(dp_variant(op, x, mode))[:n]
            ok = True if ref is None else bool(
                np.allclose(out, ref, rtol=1e-5, atol=1e-5))
            if ref is None:
                ref = out
            t = chain_time(lambda xc, o, m=mode: dp_variant(o, xc, m), x, op)
            report["modes"][mode] = {
                "us_per_op": round(t * 1e6, 2),
                "gnnz_per_s": round(coo.nnz / t / 1e9, 3),
                "hbm_frac": round(coo.nnz * 4 / t / 819e9, 4),
                "matches_base": ok,
            }
            print(mode, report["modes"][mode], flush=True)
        except Exception as e:  # noqa: BLE001 — survey probe
            report["modes"][mode] = {"error": f"{type(e).__name__}: {e}"[:250]}
            print(mode, "FAILED:", str(e)[:200], flush=True)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "fused_v3_probe_tpu.json")
    with open(dst, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

"""bsr_fused v2 design probe (VERDICT r4 next #1): which x-staging scheme
minimizes the gather critical path on real TPU?

r4 established (results/fused_overlap_probe_tpu.json): full 327 us vs
mult-only 237 us on the 33.5M-nnz blocked workload — the in-kernel gather
overlaps the strip DMA but still adds ~90 us of critical path. Candidate
stagings measured here, all producing the same xt scratch:

  base8    — current production: 8 dynamic (1,128) reads composed into one
             aligned (8,128) store
  base32   — same but 32 reads per composed (32,128) store (fewer loop
             iterations; tests whether per-iteration overhead dominates)
  baseU    — fully unrolled per kk: rg reads -> one (rg,128) store
  xbar2    — sell2-style 2-way crossbar staging: per 128-block index tile,
             take_along_axis from two prefetch-streamed xT chunk tiles +
             per-slot way select + transpose (only valid when each
             128-block group spans <=2 chunks -> measured on a CLUSTERED
             blocked workload; the random workload needs W=8)
  wideT    — one take_along_axis over the lane-concat of all chunk tiles
             (128, n_chunks*128): how does Mosaic lower a wide gather?

Writes results/fused_v2_probe_tpu.json. Run from /root/repo on TPU.
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


def clustered_block_coo(n, blocks_per_row=2, bm=8, bn=128, seed=0,
                        spread=96):
    """Blocked structure with chunk locality: each block-row's block-cols
    drawn within a +-spread window of its diagonal (the FEM/kernel6-like
    clustered case where a 128-block group spans <=2 chunks)."""
    rng = np.random.default_rng(seed)
    n_br = n // bm
    n_bc = n // bn
    br = np.repeat(np.arange(n_br, dtype=np.int64), blocks_per_row)
    center = (np.arange(n_br, dtype=np.int64) * n_bc) // n_br
    off = rng.integers(-spread, spread + 1,
                       size=(n_br, blocks_per_row))
    # distinct cols per row
    off.sort(axis=1)
    for j in range(1, blocks_per_row):
        off[:, j] = np.maximum(off[:, j], off[:, j - 1] + 1)
    bc = np.clip(center[:, None] + off, 0, n_bc - 1)
    for j in range(1, blocks_per_row):
        bc[:, j] = np.maximum(bc[:, j], bc[:, j - 1] + 1)
    bc = np.minimum(bc, n_bc - 1)
    bc = bc.reshape(-1)
    rr = (br[:, None] * bm + np.arange(bm)[None, :]).reshape(-1)
    rows = np.repeat(rr, bn)
    cc = (bc[:, None] * bn + np.arange(bn)[None, :])
    cols = np.tile(cc, (1, bm)).reshape(-1)
    vals = rng.uniform(0.1, 1.0, len(rows)).astype(np.float32)
    from sparseharness_tpu.formats.sparse import COO, fold_duplicates

    return fold_duplicates(
        COO(rows.astype(np.int32), cols.astype(np.int32), vals, (n, n)),
        np.add)


def dp_variant(op, x, mode):
    s, r_s, bm, kbn = op.strips.shape
    k = op.cols.shape[1] // r_s
    bn = kbn // k
    c_pad = round_up(max(x.shape[0], 1), bn)
    x_pad = jnp.pad(x, (0, c_pad - x.shape[0]))
    x2d = x_pad.reshape(-1, bn)
    n_xb = x2d.shape[0]
    rg = max(8, min(r_s, _ROWS_PER_STEP_TARGET_BYTES
                    // max(bm * kbn * 4, 1) // 8 * 8))
    while r_s % rg:
        rg -= 8
    grid = (r_s // rg,)

    def gather_base(cols_ref, x_ref, xt_ref, step, group):
        base = step * rg * k
        for kk in range(k):
            def body(i8, carry, kk=kk):
                rows = [
                    x_ref[pl.ds(cols_ref[base + (i8 * group + j) * k + kk],
                                1), :]
                    for j in range(group)
                ]
                blk = jnp.concatenate(rows, axis=0)
                dst = pl.multiple_of(i8 * group, 8)
                xt_ref[pl.ds(dst, group), kk * bn:(kk + 1) * bn] = blk
                return carry

            jax.lax.fori_loop(0, rg // group, body, 0)

    if mode in ("base8", "base32", "baseU"):
        group = {"base8": 8, "base32": 32, "baseU": rg}[mode]
        while rg % group:
            group //= 2

        def kernel(cols_ref, strip_ref, x_ref, out_ref, xt_ref):
            step = pl.program_id(0)
            gather_base(cols_ref, x_ref, xt_ref, step, group)
            xt = xt_ref[...][:, None, :]
            out_ref[...] = reduce_(mul_(xt, strip_ref[...]), axis=-1)

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

        def one(cols, st):
            return call(cols, st, x2d)

    elif mode == "wideT":
        # xT concat (bn, n_xb): block b is column b; one take_along_axis
        # per 128-block tile gathers across ALL chunks
        n_xb_pad = round_up(n_xb, 128)
        xt_all = jnp.pad(x2d, ((0, n_xb_pad - n_xb), (0, 0))).T  # (bn, B)
        bps = rg * k               # blocks per step
        n_tiles = -(-bps // 128)

        def kernel(widx_ref, strip_ref, xT_ref, out_ref, xt_ref):
            for t in range(n_tiles):
                idx = widx_ref[pl.ds(t * 128, 128), :]   # (128,128) i32
                g = jnp.take_along_axis(xT_ref[...], idx, axis=1)
                xt_ref[pl.ds(t * 128, 128), :] = g.T
            xt = xt_ref[...].reshape(rg, k * bn)[:, None, :]
            out_ref[...] = reduce_(mul_(xt, strip_ref[...]), axis=-1)

        # index tiles: widx[(step*n_tiles+t)*128 + l, s] = block id of
        # (k-major r-minor?) -> must match xt layout consumed by reshape:
        # xt rows are (r, k) row-major over the step => entry s of tile t
        # is block (row, slot) with flat = t*128+s, row = flat // k,
        # slot = flat % k
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((n_tiles * 128, 128),
                                 lambda i: (i, 0)),
                    pl.BlockSpec((rg, bm, kbn), lambda i: (i, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rg, bm), lambda i: (i, 0)),
                scratch_shapes=[pltpu.VMEM((n_tiles * 128, bn), x2d.dtype)],
            ),
            out_shape=jax.ShapeDtypeStruct((r_s, bm), x2d.dtype),
            interpret=_interpret(),
        )

        def one(cols, st):
            # build (steps*n_tiles*128, 128) replicated index tiles
            cols_np = cols  # (r_s*k,) device; do on host via np
            c = np.asarray(cols_np).reshape(r_s, k)
            steps = r_s // rg
            widx = np.zeros((steps * n_tiles * 128, 128), np.int32)
            for i in range(steps):
                flat = c[i * rg:(i + 1) * rg].reshape(-1)  # (rg*k,)
                flat = np.pad(flat, (0, n_tiles * 128 - len(flat)))
                block = flat.reshape(n_tiles, 128)
                widx[i * n_tiles * 128:(i + 1) * n_tiles * 128] = np.repeat(
                    block[:, None, :], 128, axis=1).reshape(-1, 128)
            return call(jnp.asarray(widx), st, xt_all)

    else:
        raise ValueError(mode)

    if s == 1:
        return one(op.cols[0], op.strips[0]).reshape(-1)

    outs = [one(op.cols[i], op.strips[i]) for i in range(s)]
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
    print(f"random-block matrix: n={n} nnz={coo.nnz}", flush=True)
    op = build_bsr_fused(coo, sr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.2, 1.0, n).astype(np.float32))

    # gold from the dense definition on a tiny slice is too slow; compare
    # modes against base8 output instead
    ref = None
    for mode in ("base8", "base32", "baseU", "wideT"):
        try:
            out = np.asarray(dp_variant(op, x, mode))[:n]
            if ref is None:
                ref = out
                ok = True
            else:
                ok = bool(np.allclose(out, ref, rtol=1e-5, atol=1e-5))
            t = chain_time(lambda xc, o, m=mode: dp_variant(o, xc, m), x, op)
            report["modes"][mode] = {
                "us_per_op": round(t * 1e6, 2),
                "gnnz_per_s": round(coo.nnz / t / 1e9, 3),
                "matches_base8": ok,
            }
            print(mode, report["modes"][mode], flush=True)
        except Exception as e:  # noqa: BLE001 — survey probe
            report["modes"][mode] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(mode, "FAILED:", str(e)[:200], flush=True)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "fused_v2_probe_tpu.json")
    with open(dst, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe 4: cost model for the sell2 ragged-kernel pipeline.

Measures, with synthetic (valid but meaningless) index data:
  a) staging kernel: per-sublane dynamic x row loads (8 per (8,128) tile)
  b) XLA 128-lane row gather (the staging alternative outside pallas)
  c) the fused per-panel pipeline: CB(phase A) + mul + T + 2 align CBs +
     tree statics + 2 route CBs + merge + T + accumulate
  d) i32 crossbar support check

Throughput is reported per stream slot (≈ per nonzero at ~70% packing).
Run from /root/repo (axon backend needs cwd importability).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    def two_point(f1, f2, k, args, label, slots):
        np.asarray(f1(*args).ravel()[:1])
        np.asarray(f2(*args).ravel()[:1])
        t1s, t2s = [], []
        for _ in range(5):
            t0 = time.perf_counter(); np.asarray(f1(*args).ravel()[:1])
            t1 = time.perf_counter(); np.asarray(f2(*args).ravel()[:1])
            t2 = time.perf_counter()
            t1s.append(t1 - t0); t2s.append(t2 - t1)
        t1s.sort(); t2s.sort()
        per = max((t2s[0] - t1s[0]) / k, 1e-9)
        print(f"{label}: {per*1e6:.2f} us/call, {slots/per/1e9:.2f} Gslot/s")
        return per

    XROWS = 512            # x (512,128) = 64k cols
    T = 4096               # stream sublanes (32 panels, 512k slots)
    P = T // 128

    x = rng.uniform(0.5, 1.5, (XROWS, 128)).astype(np.float32)
    blk = rng.integers(0, XROWS, (T,)).astype(np.int32)

    # ---------------- a) staging kernel: 8 dyn row loads per tile --------
    def stage_kernel(blk_ref, x_ref, o_ref):
        t = pl.program_id(0)
        rows = [x_ref[blk_ref[t * 8 + s], :] for s in range(8)]
        o_ref[...] = jnp.concatenate([r.reshape(1, 128) for r in rows], 0)

    def stage(blk_a, x_a):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // 8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, b: (i, 0)),
        )
        return pl.pallas_call(
            stage_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, 128), np.float32),
            interpret=not on_tpu,
        )(blk_a, x_a)

    def chain_stage(k):
        def f(blk_a, x_a):
            def body(c, _):
                s = stage(blk_a, x_a)
                return c + s[0, :1], None
            out, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32),
                                  None, length=k)
            return out
        return jax.jit(f)

    try:
        two_point(chain_stage(8), chain_stage(16), 8, (blk, x),
                  f"a) staging {T}x128", T * 128)
    except Exception as e:
        print("a) staging FAILED", type(e).__name__,
              str(e)[:200].replace("\n", " | "))

    # ---------------- b) XLA row gather ----------------------------------
    def xg(blk_a, x_a):
        return x_a[blk_a]

    def chain_xg(k):
        def f(blk_a, x_a):
            def body(c, _):
                s = xg(blk_a, x_a)
                return c + s[0, :1], None
            out, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32),
                                  None, length=k)
            return out
        return jax.jit(f)

    two_point(chain_xg(8), chain_xg(16), 8, (blk, x),
              f"b) XLA row gather {T}x128", T * 128)

    # ---------------- c) fused per-panel pipeline ------------------------
    lanesel = rng.integers(0, 128, (T, 128)).astype(np.int32)
    vals = rng.uniform(0.5, 1.5, (T, 128)).astype(np.float32)
    a1 = rng.integers(0, 128, (T, 128)).astype(np.int32)
    a2 = rng.integers(0, 128, (T, 128)).astype(np.int32)
    r1 = rng.integers(0, 256, (T, 128)).astype(np.int32) % 128
    r2 = rng.integers(0, 256, (T, 128)).astype(np.int32) % 128
    use1 = (rng.integers(0, 2, (T, 128)) != 0)
    slab_of_panel = np.zeros(P, np.int32)   # all panels hit one dp slab

    def panel_kernel(sop_ref, staged_ref, lane_ref, val_ref, a1_ref, a2_ref,
                     r1_ref, r2_ref, u1_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # phase A: crossbar + mul
        w = jnp.take_along_axis(staged_ref[...], lane_ref[...], axis=1)
        contrib = w * val_ref[...]
        # phase B: transpose to class-major
        tc = contrib.T
        z1 = jnp.take_along_axis(tc, a1_ref[...], axis=1)
        z2 = jnp.take_along_axis(tc, a2_ref[...], axis=1)
        # tree: level1 from (128,256) pairs
        t1a = z1.reshape(128, 64, 2).sum(-1)
        t1b = z2.reshape(128, 64, 2).sum(-1)
        t1 = jnp.concatenate([t1a, t1b], 1)            # (128,128)
        t2 = t1.reshape(128, 64, 2).sum(-1)            # (128,64)
        t3 = t2.reshape(128, 32, 2).sum(-1)
        t4 = t3.reshape(128, 16, 2).sum(-1)
        t5 = t4.reshape(128, 8, 2).sum(-1)
        t6 = t5.reshape(128, 4, 2).sum(-1)
        t7 = t6.reshape(128, 2, 2).sum(-1)
        tt1 = t1                                        # (128,128)
        tt2 = jnp.concatenate(
            [t2, t3, t4, t5, t6, t7,
             jnp.zeros((128, 2), t1.dtype)], 1)        # (128,128)
        q1 = jnp.take_along_axis(tt1, r1_ref[...], axis=1)
        q2 = jnp.take_along_axis(tt2, r2_ref[...], axis=1)
        q = jnp.where(u1_ref[...], q1, q2)
        o_ref[...] = o_ref[...] + q.T

    def pipeline(sop, staged, lane_a, val_a, a1_a, a2_a, r1_a, r2_a, u1_a):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P,),
            in_specs=[pl.BlockSpec((128, 128), lambda i, s: (i, 0))] * 8,
            out_specs=pl.BlockSpec((128, 128), lambda i, s: (s[i], 0)),
        )
        return pl.pallas_call(
            panel_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((128, 128), np.float32),
            interpret=not on_tpu,
        )(sop, staged, lane_a, val_a, a1_a, a2_a, r1_a, r2_a, u1_a)

    staged = x[blk]
    args = (slab_of_panel, staged, lanesel, vals, a1, a2, r1, r2, use1)

    def chain_pipe(k):
        def f(*a):
            def body(c, _):
                s = pipeline(*a)
                return c + s[0, :1], None
            out, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32),
                                  None, length=k)
            return out
        return jax.jit(f)

    try:
        per = two_point(chain_pipe(8), chain_pipe(16), 8, args,
                        f"c) fused pipeline {P} panels x 16k slots",
                        T * 128)
        print(f"   per panel: {per/P*1e6:.2f} us")
    except Exception as e:
        print("c) pipeline FAILED", type(e).__name__,
              str(e)[:300].replace("\n", " | "))

    # ---------------- d) i32 crossbar ------------------------------------
    xi = rng.integers(0, 1000, (128, 128)).astype(np.int32)
    ii = rng.integers(0, 128, (128, 128)).astype(np.int32)

    def k_i32(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    try:
        got = np.asarray(jax.jit(lambda a, b: pl.pallas_call(
            k_i32,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), np.int32),
            interpret=not on_tpu,
        )(a, b))(xi, ii))
        print("d) i32 crossbar: err",
              np.abs(got - np.take_along_axis(xi, ii, 1)).max())
    except Exception as e:
        print("d) i32 crossbar FAILED", type(e).__name__,
              str(e)[:200].replace("\n", " | "))


if __name__ == "__main__":
    main()

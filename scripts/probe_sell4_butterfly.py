#!/usr/bin/env python
"""Probe 6: the butterfly phase-B for sell2.

Probe 5 (scripts/probe_sell3_stages.py) showed the staging/phase-A/align
crossbars all compile and run on the chip, but the narrow-tile reduce tree
(reshape (128,k,2) + minor-axis reduce + concat of (128,64)..(128,2))
kills the TPU compile helper. This probe replaces the tree with a
7-level XOR butterfly that keeps every intermediate at (128,128):

  t_k[l, j] = add(t_{k-1}[l, j], t_{k-1}[l, j ^ 2^(k-1)])

After level k, lane j holds the ⊕ of its aligned 2^k block — uniformly,
for every lane. A run of width w=2^k aligned at offset f is complete at
level k, captured by `where(cap == k, t_k, final)`, and one route
crossbar per tile reads final[l, route_lane].

Checks numerics vs NumPy for f32-sum, f32-min, i32-max, then chained
two-point timing of the full panel pipeline (staging + phase A + align +
butterfly-7 + route + accumulate).
Run from /root/repo (axon backend needs cwd importability).
"""

import time

import numpy as np

LANES = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    P = 8
    K = 2
    xT = rng.uniform(0.5, 1.5, (K * 128, 128)).astype(np.float32)
    chunk_of_panel = (np.arange(P) % K).astype(np.int32)
    blkb = rng.integers(0, 128, (P, 128)).astype(np.int32)
    lanesel = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    vals = rng.uniform(0.5, 1.5, (P * 128, 128)).astype(np.float32)
    a1 = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    a2 = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    # capture levels 1..7 (0 = never) and routes
    cap1 = rng.integers(0, 8, (P * 128, 128)).astype(np.int32)
    cap2 = rng.integers(0, 8, (P * 128, 128)).astype(np.int32)
    route_lane = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    route_tile = rng.integers(0, 2, (P * 128, 128)).astype(np.int32)

    wordA = (a1 | (a2 << 7) | (cap1 << 14) | (cap2 << 17)).astype(np.int32)
    wordB = (lanesel | (route_lane << 7) | (route_tile << 14)
             | (np.repeat(blkb, 128, axis=0).reshape(P * 128, 128) << 22)
             ).astype(np.int32)

    def np_pipeline(red):
        if red == "sum":
            add = np.add
            z0 = np.float32(0)
        elif red == "min":
            add = np.minimum
            z0 = np.float32(np.inf)
        else:
            add = np.maximum
            z0 = np.int32(-2**31)
        out = np.full((128, 128), z0, np.float32 if red != "max" else np.int32)
        for p in range(P):
            xc = xT[chunk_of_panel[p] * 128:(chunk_of_panel[p] + 1) * 128]
            if red == "max":
                xc = (xc * 100).astype(np.int32)
            staged = xc[:, blkb[p]].T
            sl = slice(p * 128, (p + 1) * 128)
            w = np.take_along_axis(staged, lanesel[sl], axis=1)
            v = vals[sl] if red != "max" else (vals[sl] * 100).astype(np.int32)
            contrib = w * v if red == "sum" else (
                w + v if red == "min" else np.minimum(w, v))
            if red == "min":
                contrib = np.take_along_axis(staged, lanesel[sl], 1) + v
            tc = contrib.T
            t1 = np.take_along_axis(tc, a1[sl], axis=1)
            t2 = np.take_along_axis(tc, a2[sl], axis=1)
            f1 = np.full_like(t1, z0)
            f2 = np.full_like(t2, z0)
            for k in range(1, 8):
                idx = np.arange(128) ^ (1 << (k - 1))
                t1 = add(t1, t1[:, idx])
                t2 = add(t2, t2[:, idx])
                f1 = np.where(cap1[sl] == k, t1, f1)
                f2 = np.where(cap2[sl] == k, t2, f2)
            q1 = np.take_along_axis(f1, route_lane[sl], axis=1)
            q2 = np.take_along_axis(f2, route_lane[sl], axis=1)
            q = np.where(route_tile[sl] == 0, q1, q2)
            out = add(out, q.T)
        return out

    def make_kernel(red, depth=7):
        def kernel(cop_ref, xc_ref, wa_ref, wb_ref, val_ref, out_ref):
            p = pl.program_id(0)
            wb = wb_ref[...]
            wa = wa_ref[...]
            blk = (wb >> 22) & 127
            y = jnp.take_along_axis(xc_ref[...], blk, axis=1)
            staged = y.T
            sl = wb & 127
            w = jnp.take_along_axis(staged, sl, axis=1)
            v = val_ref[...]
            if red == "sum":
                contrib = w * v
                add = jnp.add
                z0 = jnp.float32(0)
            elif red == "min":
                contrib = w + v
                add = jnp.minimum
                z0 = jnp.float32(np.inf)
            else:
                contrib = jnp.minimum(w, v)
                add = jnp.maximum
                z0 = jnp.int32(-2**31)
            tc = contrib.T
            t1 = jnp.take_along_axis(tc, wa & 127, axis=1)
            t2 = jnp.take_along_axis(tc, (wa >> 7) & 127, axis=1)
            cap1 = (wa >> 14) & 7
            cap2 = (wa >> 17) & 7
            f1 = jnp.full_like(t1, z0)
            f2 = jnp.full_like(t2, z0)
            iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            for k in range(1, depth + 1):
                idx = iota ^ (1 << (k - 1))
                t1 = add(t1, jnp.take_along_axis(t1, idx, axis=1))
                t2 = add(t2, jnp.take_along_axis(t2, idx, axis=1))
                f1 = jnp.where(cap1 == k, t1, f1)
                f2 = jnp.where(cap2 == k, t2, f2)
            q1 = jnp.take_along_axis(f1, (wb >> 7) & 127, axis=1)
            q2 = jnp.take_along_axis(f2, (wb >> 7) & 127, axis=1)
            q = jnp.where(((wb >> 14) & 1) == 0, q1, q2)

            @pl.when(p == 0)
            def _():
                out_ref[...] = jnp.full_like(out_ref, z0)

            out_ref[...] = add(out_ref[...], q.T)

        return kernel

    def build(red, reps, depth=7):
        dt = np.int32 if red == "max" else np.float32
        xT_a = (xT * 100).astype(np.int32) if red == "max" else xT
        vals_a = (vals * 100).astype(np.int32) if red == "max" else vals

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda p, c: (c[p], 0)),
                pl.BlockSpec((128, 128), lambda p, c: (p, 0)),
                pl.BlockSpec((128, 128), lambda p, c: (p, 0)),
                pl.BlockSpec((128, 128), lambda p, c: (p, 0)),
            ],
            out_specs=pl.BlockSpec((128, 128), lambda p, c: (0, 0)),
        )
        call = pl.pallas_call(
            make_kernel(red, depth), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((128, 128), dt),
            interpret=not on_tpu,
        )

        def f(c, x, wa, wb, v):
            def body(carry, _):
                o = call(c, x, wa, wb, v)
                return carry + o[:1, :1].astype(jnp.float32), None
            out, _ = jax.lax.scan(
                body, jnp.zeros((1, 1), jnp.float32), None, length=reps)
            return out
        return jax.jit(f), (chunk_of_panel, xT_a, wordA, wordB, vals_a)

    # numerics
    for red in ("sum", "min", "max"):
        try:
            f1, args = build(red, 1)
            dt = np.int32 if red == "max" else np.float32
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(P,),
                in_specs=[
                    pl.BlockSpec((128, 128), lambda p, c: (c[p], 0)),
                    pl.BlockSpec((128, 128), lambda p, c: (p, 0)),
                    pl.BlockSpec((128, 128), lambda p, c: (p, 0)),
                    pl.BlockSpec((128, 128), lambda p, c: (p, 0)),
                ],
                out_specs=pl.BlockSpec((128, 128), lambda p, c: (0, 0)),
            )
            call = pl.pallas_call(
                make_kernel(red), grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((128, 128), dt),
                interpret=not on_tpu,
            )
            got = np.asarray(jax.jit(call)(*args))
            want = np_pipeline(red)
            if red == "sum":
                err = np.abs(got - want).max() / max(np.abs(want).max(), 1)
                print(f"butterfly {red}: rel err {err:.2e}")
            else:
                bad = int((got != want).sum())
                # float min: identical ops, expect exact
                print(f"butterfly {red}: mismatches {bad}")
        except Exception as e:
            print(f"butterfly {red}: FAILED {type(e).__name__}",
                  str(e)[:300].replace("\n", " | "))

    # chained two-point timing of the full pipeline (sum, depth 7 and 3)
    for depth in (7, 3):
        try:
            fa, args = build("sum", 16, depth)
            fb, _ = build("sum", 32, depth)
            np.asarray(fa(*args))
            np.asarray(fb(*args))
            t1s, t2s = [], []
            for _ in range(5):
                t0 = time.perf_counter(); np.asarray(fa(*args))
                t1 = time.perf_counter(); np.asarray(fb(*args))
                t2 = time.perf_counter()
                t1s.append(t1 - t0); t2s.append(t2 - t1)
            per = max((sorted(t2s)[0] - sorted(t1s)[0]) / 16, 1e-9)
            slots = P * 128 * 128
            print(f"pipeline depth={depth}: {per*1e6:.2f} us/call "
                  f"({per/P*1e6:.2f} us/panel), {slots/per/1e9:.2f} Gslot/s")
        except Exception as e:
            print(f"pipeline depth={depth} timing FAILED {type(e).__name__}",
                  str(e)[:200].replace("\n", " | "))


if __name__ == "__main__":
    main()

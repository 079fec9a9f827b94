#!/usr/bin/env python
"""Probe 5: bisect the sell2 panel pipeline (probe 4's stage c crashed the
compile helper) and validate the crossbar-staging redesign.

Stages, each compiled separately so a Mosaic crash names its op:
  1. staging by T-crossbar-T from a prefetch-indexed x chunk (no scalar
     row loads: y[l,s] = xT[l, blk[s]] then transpose)
  2. stage 1 + lane crossbar + mul  (phase A complete)
  3. stage 2 + transpose to class-major + two align crossbars
  4. stage 3 + the static reduce tree t1..t7 + concat
  5. stage 4 + two route crossbars + select + transpose + accumulate
     (the full panel kernel)
  6. stage 5 with i32 ops (max tree) — the int-semiring carrier
  7. stage 5 with min tree on f32 — the min_plus carrier

Every stage checks numerics against a NumPy model on synthetic data.
Run from /root/repo (axon backend needs cwd importability).
"""

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

    P = 4                    # panels
    K = 2                    # x chunks
    xT = rng.uniform(0.5, 1.5, (K * 128, 128)).astype(np.float32)
    # xT[k*128 + l, r] = x[k, r, l]; x rows live along lanes of xT
    chunk_of_panel = np.array([0, 0, 1, 1], np.int32)
    blkb = rng.integers(0, 128, (P, 128)).astype(np.int32)     # per sublane
    lanesel = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    vals = rng.uniform(0.5, 1.5, (P * 128, 128)).astype(np.float32)
    a1 = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    a2 = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    r1 = rng.integers(0, 128, (P * 128, 128)).astype(np.int32)
    r2 = rng.integers(0, 126, (P * 128, 128)).astype(np.int32)
    use1 = rng.integers(0, 2, (P * 128, 128)).astype(np.int32)

    # packed words: wordA = a1 | a2<<7 ; wordB = lanesel | r1<<7 | r2<<14
    # | use1<<21 | blkb<<22 (blkb replicated down sublanes)
    wordA = (a1 | (a2 << 7)).astype(np.int32)
    wordB = (lanesel | (r1 << 7) | (r2 << 14) | (use1 << 21)
             | (np.repeat(blkb, 128, axis=0).reshape(P * 128, 128) << 22)
             ).astype(np.int32)

    # ---------------- NumPy model --------------------------------------
    def np_model(stop_stage):
        outs = []
        for p in range(P):
            xc = xT[chunk_of_panel[p] * 128:(chunk_of_panel[p] + 1) * 128]
            # staged[s, l] = x[chunk, blkb[s], l] = xc[l, blkb[s]]
            staged = xc[:, blkb[p]].T
            if stop_stage == 1:
                outs.append(staged)
                continue
            sl = lanesel[p * 128:(p + 1) * 128]
            w = np.take_along_axis(staged, sl, axis=1)
            contrib = w * vals[p * 128:(p + 1) * 128]
            if stop_stage == 2:
                outs.append(contrib)
                continue
            tc = contrib.T
            z1 = np.take_along_axis(tc, a1[p * 128:(p + 1) * 128], axis=1)
            z2 = np.take_along_axis(tc, a2[p * 128:(p + 1) * 128], axis=1)
            if stop_stage == 3:
                outs.append(z1 + z2)
                continue
            t1 = np.concatenate(
                [z1.reshape(128, 64, 2).sum(-1),
                 z2.reshape(128, 64, 2).sum(-1)], 1)
            t2 = t1.reshape(128, 64, 2).sum(-1)
            t3 = t2.reshape(128, 32, 2).sum(-1)
            t4 = t3.reshape(128, 16, 2).sum(-1)
            t5 = t4.reshape(128, 8, 2).sum(-1)
            t6 = t5.reshape(128, 4, 2).sum(-1)
            t7 = t6.reshape(128, 2, 2).sum(-1)
            tt2 = np.concatenate(
                [t2, t3, t4, t5, t6, t7, np.zeros((128, 2), np.float32)], 1)
            if stop_stage == 4:
                outs.append(t1 + tt2)
                continue
            q1 = np.take_along_axis(t1, r1[p * 128:(p + 1) * 128], axis=1)
            q2 = np.take_along_axis(tt2, r2[p * 128:(p + 1) * 128], axis=1)
            q = np.where(use1[p * 128:(p + 1) * 128] == 1, q1, q2)
            outs.append(q.T)
        if stop_stage == 5:
            return np.sum(outs, 0)  # accumulate over panels (one out tile)
        return np.sum(outs, 0)

    # ---------------- kernels ------------------------------------------
    def make_kernel(stop_stage, red):
        def kernel(cop_ref, xc_ref, wa_ref, wb_ref, val_ref, out_ref):
            p = pl.program_id(0)
            wb = wb_ref[...]
            blk = (wb >> 22) & 127
            # staging: y[l, s] = xc[l, blk[s]] ; staged = y.T
            y = jnp.take_along_axis(xc_ref[...].astype(jnp.float32)
                                    if red != "i32" else xc_ref[...],
                                    blk, axis=1)
            staged = y.T
            if stop_stage == 1:
                acc = staged
            else:
                sl = wb & 127
                w = jnp.take_along_axis(staged, sl, axis=1)
                contrib = w * val_ref[...] if red != "i32" else jnp.minimum(
                    w, val_ref[...])
                if stop_stage == 2:
                    acc = contrib
                else:
                    wa = wa_ref[...]
                    tc = contrib.T
                    z1 = jnp.take_along_axis(tc, wa & 127, axis=1)
                    z2 = jnp.take_along_axis(tc, (wa >> 7) & 127, axis=1)
                    if stop_stage == 3:
                        acc = z1 + z2 if red != "i32" else jnp.maximum(z1, z2)
                    else:
                        if red == "sum":
                            r = lambda t: t.sum(-1)
                        elif red == "min":
                            r = lambda t: t.min(-1)
                        else:
                            r = lambda t: t.max(-1)
                        t1 = jnp.concatenate(
                            [r(z1.reshape(128, 64, 2)),
                             r(z2.reshape(128, 64, 2))], 1)
                        t2 = r(t1.reshape(128, 64, 2))
                        t3 = r(t2.reshape(128, 32, 2))
                        t4 = r(t3.reshape(128, 16, 2))
                        t5 = r(t4.reshape(128, 8, 2))
                        t6 = r(t5.reshape(128, 4, 2))
                        t7 = r(t6.reshape(128, 2, 2))
                        tt2 = jnp.concatenate(
                            [t2, t3, t4, t5, t6, t7,
                             jnp.zeros((128, 2), t1.dtype)], 1)
                        if stop_stage == 4:
                            acc = (t1 + tt2 if red == "sum"
                                   else jnp.maximum(t1, tt2))
                        else:
                            q1 = jnp.take_along_axis(
                                t1, (wb >> 7) & 127, axis=1)
                            q2 = jnp.take_along_axis(
                                tt2, (wb >> 14) & 127, axis=1)
                            q = jnp.where(((wb >> 21) & 1) == 1, q1, q2)
                            acc = q.T

            @pl.when(p == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            if red == "sum":
                out_ref[...] = out_ref[...] + acc
            elif red == "min":
                out_ref[...] = jnp.minimum(out_ref[...], acc)
            else:
                out_ref[...] = jnp.maximum(out_ref[...], acc)

        return kernel

    def run_stage(stop_stage, red="sum"):
        dt = np.int32 if red == "i32" else np.float32
        xT_a = xT.astype(dt) if red == "i32" else xT
        vals_a = vals.astype(dt) if red == "i32" else vals
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
        fn = pl.pallas_call(
            make_kernel(stop_stage, red), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((128, 128), dt),
            interpret=not on_tpu,
        )
        try:
            got = np.asarray(jax.jit(fn)(
                chunk_of_panel, xT_a, wordA, wordB, vals_a))
            if red == "sum":
                want = np_model(stop_stage)
                err = np.abs(got - want).max() / max(np.abs(want).max(), 1)
                print(f"stage {stop_stage} ({red}): rel err {err:.2e}")
            else:
                print(f"stage {stop_stage} ({red}): compiled+ran ok")
        except Exception as e:
            print(f"stage {stop_stage} ({red}): FAILED {type(e).__name__}",
                  str(e)[:300].replace("\n", " | "))

    for st in (1, 2, 3, 4, 5):
        run_stage(st, "sum")
    run_stage(5, "min")
    run_stage(5, "i32")


if __name__ == "__main__":
    main()

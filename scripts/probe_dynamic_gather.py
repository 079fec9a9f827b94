#!/usr/bin/env python
"""Probe tpu.dynamic_gather (jnp.take_along_axis inside Pallas) on the chip.

Measures whether Mosaic's vectorized VMEM gather is fast enough to anchor
the ragged/power-law kernel (ops/pallas_sell.py): correctness of axis-0 and
axis-1 forms, then chained-timing throughput in Gelem/s.

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

    R, L = (2048, 128) if on_tpu else (64, 128)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 1.0, (R, L)).astype(np.float32)
    idx0 = rng.integers(0, R, (R, L)).astype(np.int32)   # sublane gather
    idx1 = rng.integers(0, L, (R, L)).astype(np.int32)   # lane gather

    def k_axis0(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    def k_axis1(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    def call(kernel, xv, iv):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
            interpret=not on_tpu,
        )(xv, iv)

    # correctness
    for name, kern, idx, want in (
        ("axis0", k_axis0, idx0, np.take_along_axis(x, idx0, 0)),
        ("axis1", k_axis1, idx1, np.take_along_axis(x, idx1, 1)),
    ):
        try:
            got = np.asarray(jax.jit(
                lambda a, b, kern=kern: call(kern, a, b)
            )(x, idx))
            print(f"{name}: max err {np.abs(got - want).max():.2e}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue

    if not on_tpu:
        return

    # throughput: chained dependent gathers (feed output back as int idx)
    def chained(kern, k):
        def f(xv, iv):
            def body(ivc, _):
                g = call(kern, xv, ivc.astype(jnp.float32) % 1.0)  # dummy?
                return ivc, None
            # simpler dependency: gather x by idx, derive next idx from it
            def body2(carry, _):
                g = call(kern, xv, carry)
                nxt = (carry + g.astype(jnp.int32) + 1) % R
                return nxt, None
            out, _ = jax.lax.scan(body2, iv, None, length=k)
            return out
        return jax.jit(f)

    for name, kern, idx, mod in (("axis0", k_axis0, idx0, R),
                                 ("axis1", k_axis1, idx1, L)):
        try:
            f1 = chained(kern, 16)
            f2 = chained(kern, 32)
            r1 = f1(x, idx); np.asarray(r1.ravel()[:1])
            r2 = f2(x, idx); np.asarray(r2.ravel()[:1])
            ts = []
            for _ in range(4):
                t0 = time.perf_counter(); np.asarray(f1(x, idx).ravel()[:1])
                t1 = time.perf_counter(); np.asarray(f2(x, idx).ravel()[:1])
                t2 = time.perf_counter()
                ts.append(((t2 - t1) - (t1 - t0)) / 16)
            per = np.median(ts)
            gel = R * L / per / 1e9
            print(f"{name}: {per*1e6:.1f} us/gather-of-{R*L} = {gel:.2f} Gelem/s")
        except Exception as e:
            print(f"{name} timing: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

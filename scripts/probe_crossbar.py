#!/usr/bin/env python
"""Probe 3b: pure VPU cost of the within-sublane crossbar
(dynamic_gather axis=1, minor 128), transpose, and an add baseline.

Method: ONE pallas call runs K dependent iterations in an in-kernel
fori_loop over VMEM-resident data; per-op = (t_2K - t_K)/K. Dispatch and
DMA cancel entirely; this is the compute rate the sell kernel will see.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    T = 1024     # sublanes (1024x128 f32 = 512KB)
    K = 64

    val = jnp.asarray(rng.uniform(0.5, 1.5, (T, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (T, 128)).astype(np.int32))

    def make(kind, k):
        def kern(i_ref, v_ref, o_ref):
            iv = i_ref[...]

            def body(t, v):
                if kind == "xbar":
                    return jnp.take_along_axis(v, iv, axis=1) * 0.999
                if kind == "add":
                    return v * 0.999 + 0.001
                if kind == "xpose":
                    parts = [v[c * 128:(c + 1) * 128].T
                             for c in range(T // 128)]
                    return jnp.concatenate(parts) * 0.999
                raise AssertionError

            o_ref[...] = jax.lax.fori_loop(0, k, body, v_ref[...])

        return jax.jit(lambda i, v: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 128), np.float32),
        )(i, v))

    for kind in ("add", "xbar", "xpose"):
        try:
            f1, f2 = make(kind, K), make(kind, 2 * K)
            np.asarray(f1(idx, val).ravel()[:1])
            np.asarray(f2(idx, val).ravel()[:1])
            d = []
            for _ in range(6):
                t0 = time.perf_counter(); np.asarray(f1(idx, val).ravel()[:1])
                t1 = time.perf_counter(); np.asarray(f2(idx, val).ravel()[:1])
                t2 = time.perf_counter()
                d.append(((t2 - t1) - (t1 - t0)) / K)
            per = float(np.median(d))
            elems = T * 128
            print(f"{kind}: {per*1e6:.2f} us per (1024,128) op "
                  f"= {elems/per/1e9:.2f} Gelem/s")
        except Exception as e:
            print(f"{kind}: FAILED {type(e).__name__} "
                  + str(e)[:200].replace("\n", " | "))


if __name__ == "__main__":
    main()

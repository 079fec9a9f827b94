#!/usr/bin/env python
"""Probe 2: axis-0 retry with details, wide-minor axis-1, in-kernel
transpose, and honest chained throughput for the working forms."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    def call(kernel, out_shape, *args):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=not on_tpu,
        )(*args)

    # ---- 1. axis0, small and simple ------------------------------------
    R, L = 256, 128
    x = rng.uniform(0.1, 1.0, (R, L)).astype(np.float32)
    idx0 = rng.integers(0, R, (R, L)).astype(np.int32)

    def k_axis0(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    try:
        got = np.asarray(jax.jit(lambda a, b: call(
            k_axis0, jax.ShapeDtypeStruct((R, L), np.float32), a, b))(x, idx0))
        print("axis0 small: err", np.abs(got - np.take_along_axis(x, idx0, 0)).max())
    except Exception as e:
        print("axis0 small: FAILED", type(e).__name__, str(e)[:500].replace("\n", " | "))

    # ---- 2. axis1 with wide minor dim ----------------------------------
    for T in (512, 4096):
        xw = rng.uniform(0.1, 1.0, (128, T)).astype(np.float32)
        idxw = rng.integers(0, T, (128, T)).astype(np.int32)

        def k_axis1(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

        try:
            got = np.asarray(jax.jit(lambda a, b: call(
                k_axis1, jax.ShapeDtypeStruct((128, T), np.float32), a, b))(xw, idxw))
            print(f"axis1 (128,{T}): err",
                  np.abs(got - np.take_along_axis(xw, idxw, 1)).max())
        except Exception as e:
            print(f"axis1 (128,{T}): FAILED", type(e).__name__,
                  str(e)[:300].replace("\n", " | "))

    # ---- 3. in-kernel transpose (T,128)->(128,T) ------------------------
    T = 1024
    xt = rng.uniform(0.1, 1.0, (T, 128)).astype(np.float32)

    def k_tr(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    try:
        got = np.asarray(jax.jit(lambda a: call(
            k_tr, jax.ShapeDtypeStruct((128, T), np.float32), a))(xt))
        print("transpose in-kernel: err", np.abs(got - xt.T).max())
    except Exception as e:
        print("transpose in-kernel: FAILED", type(e).__name__,
              str(e)[:300].replace("\n", " | "))

    if not on_tpu:
        return

    # ---- 4. throughput of the working gather (chained, dependent) ------
    def bench(shape, axis, label):
        Rr, Ll = shape
        xv = rng.uniform(0.1, 1.0, shape).astype(np.float32)
        idx = rng.integers(0, shape[axis], shape).astype(np.int32)

        def kern(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=axis)

        def chained(k):
            def f(xv, idx):
                def body(c, _):
                    g = call(kern, jax.ShapeDtypeStruct(shape, np.float32),
                             c, idx)
                    return g + 1.0, None
                out, _ = jax.lax.scan(body, xv, None, length=k)
                return out
            return jax.jit(f)

        f1, f2 = chained(32), chained(64)
        np.asarray(f1(xv, idx).ravel()[:1]); np.asarray(f2(xv, idx).ravel()[:1])
        t1s, t2s = [], []
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f1(xv, idx).ravel()[:1])
            t1 = time.perf_counter(); np.asarray(f2(xv, idx).ravel()[:1])
            t2 = time.perf_counter()
            t1s.append(t1 - t0); t2s.append(t2 - t1)
        per = (min(t2s) - min(t1s)) / 32
        print(f"{label}: {per*1e6:.1f} us per gather of {Rr*Ll} elems "
              f"= {Rr*Ll/per/1e9:.2f} Gelem/s")

    try:
        bench((2048, 128), 1, "axis1 (2048,128)")
        bench((128, 2048), 1, "axis1 (128,2048)")
        bench((2048, 128), 0, "axis0 (2048,128)")
    except Exception as e:
        print("bench failed:", type(e).__name__, str(e)[:200].replace("\n", " | "))


if __name__ == "__main__":
    main()

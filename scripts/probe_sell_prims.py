#!/usr/bin/env python
"""Probe 3: the primitive set for the ragged-kernel redesign.

After probe 2 showed tpu.dynamic_gather is lane-crossbar-only on this
Mosaic build (axis=1, minor dim exactly 128; axis=0 fails with "Multiple
source vregs along gather dimension"), this probe pins down what IS
available to move data across sublanes inside a kernel:

1. axis-0 dynamic gather on a SINGLE vreg source (8,128)
2. dynamic scalar-indexed row load from a VMEM ref (x_ref[pl.ds(b,1), :])
   with unaligned b from SMEM
3. same but 8-aligned only
4. (128,128) transpose -> lane crossbar -> transpose (in-tile sublane
   permutation)
5. axis-1 crossbar under a grid (per-tile idx), the phase-A workhorse

Run from /root/repo (axon backend needs cwd importability).
"""

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

    def run(label, fn, *args, want=None):
        try:
            got = np.asarray(jax.jit(fn)(*args))
            if want is not None:
                print(f"{label}: err {np.abs(got - want).max()}")
            else:
                print(f"{label}: ok {got.shape}")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}",
                  str(e)[:160].replace("\n", " | "))

    def call(kernel, out_shape, *args, smem=0):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=not on_tpu,
        )(*args)

    # 1. single-vreg axis-0 gather
    x8 = rng.uniform(0.1, 1.0, (8, 128)).astype(np.float32)
    i8 = rng.integers(0, 8, (8, 128)).astype(np.int32)

    def k1(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    run("1 axis0 gather (8,128)",
        lambda a, b: call(k1, jax.ShapeDtypeStruct((8, 128), np.float32), a, b),
        x8, i8, want=np.take_along_axis(x8, i8, 0))

    # 1b. axis-0 gather (16,128) — expected FAIL (multi-vreg source)
    x16 = rng.uniform(0.1, 1.0, (16, 128)).astype(np.float32)
    i16 = rng.integers(0, 16, (16, 128)).astype(np.int32)
    run("1b axis0 gather (16,128)",
        lambda a, b: call(k1, jax.ShapeDtypeStruct((16, 128), np.float32), a, b),
        x16, i16, want=np.take_along_axis(x16, i16, 0))

    # 2. dynamic scalar-index row loads from VMEM (unaligned offsets)
    X = rng.uniform(0.1, 1.0, (64, 128)).astype(np.float32)
    bsel = np.array([3, 17, 9, 33, 2, 61, 40, 5], np.int32)

    def k2(b_ref, x_ref, o_ref):
        rows = [x_ref[b_ref[s], :] for s in range(8)]
        o_ref[...] = jnp.stack(rows)

    def f2(b, x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, b: (0, 0)),
        )
        return pl.pallas_call(
            k2, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), np.float32),
            interpret=not on_tpu,
        )(b, x)

    run("2 scalar-indexed row loads", f2, bsel, X, want=X[bsel])

    # 3. dynamic contiguous slice load, unaligned offset
    def k3(b_ref, x_ref, o_ref):
        o_ref[...] = x_ref[pl.ds(b_ref[0], 8), :]

    def f3(b, x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, b: (0, 0)),
        )
        return pl.pallas_call(
            k3, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), np.float32),
            interpret=not on_tpu,
        )(b, x)

    run("3 dyn slice load off=3", f3, np.array([3], np.int32), X,
        want=X[3:11])
    run("3b dyn slice load off=8", f3, np.array([8], np.int32), X,
        want=X[8:16])

    # 4. in-tile sublane permutation: transpose -> crossbar -> transpose
    perm = rng.permutation(128).astype(np.int32)
    Xt = rng.uniform(0.1, 1.0, (128, 128)).astype(np.float32)

    def k4(x_ref, p_ref, o_ref):
        xt = x_ref[...].T
        z = jnp.take_along_axis(xt, p_ref[...], axis=1)
        o_ref[...] = z.T

    pmat = np.broadcast_to(perm[None, :], (128, 128)).copy().astype(np.int32)
    run("4 sublane perm via T-crossbar-T",
        lambda a, b: call(k4, jax.ShapeDtypeStruct((128, 128), np.float32),
                          a, b),
        Xt, pmat, want=Xt[perm])

    # 5. crossbar under a grid (per-tile idx)
    T = 256
    Xs = rng.uniform(0.1, 1.0, (T, 128)).astype(np.float32)
    Is = rng.integers(0, 128, (T, 128)).astype(np.int32)

    def k5(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    def f5(a, b):
        return pl.pallas_call(
            k5,
            grid=(T // 8,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 128), np.float32),
            interpret=not on_tpu,
        )(a, b)

    run("5 crossbar under grid", f5, Xs, Is,
        want=np.take_along_axis(Xs, Is, 1))

    # 6. jnp.roll by dynamic per-kernel scalar (sublane rotate)
    def k6(b_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], b_ref[0], 0)

    def f6(b, x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, 128), lambda i, b: (0, 0)),
        )
        return pl.pallas_call(
            k6, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((64, 128), np.float32),
            interpret=not on_tpu,
        )(b, x)

    run("6 dynamic sublane roll", f6, np.array([5], np.int32), X,
        want=np.roll(X, 5, 0))


if __name__ == "__main__":
    main()

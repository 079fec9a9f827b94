#!/usr/bin/env python
"""Clock validation for the overlap A/B anomaly: the nosplit band63 case
measured 0.69 ms/op = 1166 GB/s of strip streaming — above the 819 GB/s
HBM spec, so either the two-point clock under-counts in this chain shape
or the strips are not actually streamed in full every iteration.

Prints absolute walls for K in {16, 32, 64, 128} chained iterations of the
nosplit sharded-band dp (one dispatch per K): if per-op is real, wall
should grow linearly at ~0.7 ms/iter beyond the dispatch floor; a
sub-linear tail means the long chain reveals the true steady-state rate.
Run from /root/repo on the TPU host.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sparseharness_tpu.formats import banded_coo
    from sparseharness_tpu.ops import build_operand, spmv
    from sparseharness_tpu.parallel import fixcore, make_mesh
    from sparseharness_tpu.parallel.mesh import ROWS_AXIS
    from sparseharness_tpu.parallel.sharded_band import (
        _band_local_dp, band_arrays, build_sharded_band,
        without_overlap_split,
    )
    from sparseharness_tpu.semiring import PLUS_TIMES

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 19 if on_tpu else 1 << 12
    coo = banded_coo(n, 63, seed=1)
    sr = PLUS_TIMES
    mesh = make_mesh(1)

    def chain_walls(tag, arrays, local_dp, chunk):
        def chained(length):
            @partial(
                shard_map, mesh=mesh,
                in_specs=(fixcore.row_specs(arrays), P(ROWS_AXIS)),
                out_specs=P(ROWS_AXIS), check_vma=False,
            )
            def run(op_local, x_local):
                def body(xc, _):
                    return local_dp(op_local, xc).astype(xc.dtype), None

                xf, _ = jax.lax.scan(body, x_local, None, length=length)
                return xf

            return jax.jit(run)

        arrs = fixcore.shard_operand(mesh, arrays)
        rng = np.random.default_rng(2)
        x_sh = jax.device_put(
            jnp.asarray(rng.uniform(0.1, 1.0, chunk).astype(np.float32)),
            NamedSharding(mesh, P(ROWS_AXIS)))

        ks = (16, 32, 64, 128) if on_tpu else (2, 4)
        fns = {k: chained(k) for k in ks}
        for k, f in fns.items():
            np.asarray(f(arrs, x_sh).ravel()[:1])   # compile+warm
        walls = {}
        for k, f in fns.items():
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(arrs, x_sh).ravel()[:1])
                best = min(best, time.perf_counter() - t0)
            walls[k] = best
            print(f"{tag} K={k}: wall {best*1e3:.2f} ms "
                  f"({best/k*1e3:.3f} ms/iter raw)", flush=True)
        ks_l = list(ks)
        for a, b in zip(ks_l, ks_l[1:]):
            per = (walls[b] - walls[a]) / (b - a)
            print(f"{tag} two-point {a}->{b}: {per*1e3:.3f} ms/iter",
                  flush=True)

    op, chunk = build_sharded_band(coo, sr, 1)
    nos = without_overlap_split(op)
    chain_walls("nosplit", band_arrays(nos), _band_local_dp(nos, sr), chunk)
    chain_walls("split", band_arrays(op), _band_local_dp(op, sr), chunk)

    # plain (non-sharded) kernel on the same matrix, same chain shape
    pop = build_operand(coo, sr, "bsr_band")

    def plain_chained(length):
        def run(pop, x):
            def body(xc, _):
                d = spmv(pop, xc, None, sr=sr, variant="bsr_band", n_rows=n)
                return d.astype(xc.dtype), None

            xf, _ = jax.lax.scan(body, x, None, length=length)
            return xf

        return jax.jit(run)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    ks = (16, 32, 64) if on_tpu else (2, 4)
    fns = {k: plain_chained(k) for k in ks}
    for k, f in fns.items():
        np.asarray(f(pop, x).ravel()[:1])
    walls = {}
    for k, f in fns.items():
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(pop, x).ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
        print(f"plain K={k}: wall {best*1e3:.2f} ms "
              f"({best/k*1e3:.3f} ms/iter raw)", flush=True)
    ks_l = list(ks)
    for a, b in zip(ks_l, ks_l[1:]):
        per = (walls[b] - walls[a]) / (b - a)
        print(f"plain two-point {a}->{b}: {per*1e3:.3f} ms/iter", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Decompose sell2 SpMV time on chip: panel sweep vs x-side prep (xT build
+ virtual-chunk gather) vs fixed overhead, using min-wall two-point chains
(Δ=32, memory: tpu-clock-traps). Run from /root/repo.

Writes results/sell2_components_tpu.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, k1=32, k2=64, trials=5):
    """min-wall two-point per-op seconds for fn chained k times."""
    import jax

    def chained(k):
        def f(*a):
            def body(c, _):
                return fn(c, *a[1:]), None
            out, _ = jax.lax.scan(body, a[0], None, length=k)
            return out
        return jax.jit(f)

    f1, f2 = chained(k1), chained(k2)
    r = f1(*args); np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    r = f2(*args); np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    w1, w2 = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        r = f1(*args); np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        w1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = f2(*args); np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
        w2.append(time.perf_counter() - t0)
    return (min(w2) - min(w1)) / (k2 - k1)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    print("backend:", jax.default_backend(), flush=True)

    from sparseharness_tpu.formats import power_law_coo
    from sparseharness_tpu.formats.sparse import fold_duplicates
    from sparseharness_tpu.ops.pallas_sell2 import (
        CHUNK_COLS, LANES, build_sell2, dp_sell2,
    )
    from sparseharness_tpu.semiring import PLUS_TIMES

    big = power_law_coo(500_000, 2_000_000, alpha=1.5, seed=13)
    coo = fold_duplicates(big, lambda a, b: a + b)
    n = coo.shape[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    report = {"backend": jax.default_backend(), "nnz": int(coo.nnz)}

    variants = {
        "virt": build_sell2(coo, PLUS_TIMES, virtual_chunks=True),
        "novirt": build_sell2(coo, PLUS_TIMES, virtual_chunks=False),
    }
    for name, op in variants.items():
        panels = sum(l.panels for l in op.layouts)
        nv = 0 if op.virt_blocks is None else int(op.virt_blocks.shape[0])

        def dp_fn(xc, op=op):
            d = dp_sell2(op, xc, PLUS_TIMES, n_rows=n)
            return d[:n]

        t = chain_time(dp_fn, (x,))
        report[name] = {
            "panels": panels, "vchunk_tiles": nv, "us_per_op": t * 1e6,
            "us_per_panel": t * 1e6 / panels,
            "gnnz_per_s": coo.nnz / t / 1e9,
        }
        print(f"{name}: panels={panels} vtiles={nv} "
              f"{t*1e6:.1f} us/op  {coo.nnz/t/1e9:.3f} Gnnz/s", flush=True)

    # x-side prep alone: xT build + virt gather, chained via a scalar dep
    op = variants["virt"]
    c_pad = op.n_chunks * CHUNK_COLS

    def prep(xc):
        x_pad = jnp.pad(xc, (0, c_pad - xc.shape[0]))
        xT = x_pad.reshape(op.n_chunks, LANES, LANES).transpose(0, 2, 1)
        xT = xT.reshape(op.n_chunks * LANES, LANES)
        xb = x_pad.reshape(-1, LANES)
        vt = xb[op.virt_blocks]
        xT = jnp.concatenate([xT, vt.transpose(0, 2, 1).reshape(-1, LANES)])
        # scalar dependency so scan can chain it
        return xc + xT[0, 0] * 1e-30

    t = chain_time(prep, (x,))
    report["prep"] = {"us_per_op": t * 1e6}
    print(f"x-prep (xT + virt gather): {t*1e6:.1f} us/op", flush=True)

    # virt gather alone
    def gather_only(xc):
        x_pad = jnp.pad(xc, (0, c_pad - xc.shape[0]))
        xb = x_pad.reshape(-1, LANES)
        vt = xb[op.virt_blocks]
        return xc + vt[0, 0, 0] * 1e-30

    t = chain_time(gather_only, (x,))
    report["virt_gather"] = {"us_per_op": t * 1e6}
    print(f"virt gather alone: {t*1e6:.1f} us/op", flush=True)

    with open("results/sell2_components_tpu.json", "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

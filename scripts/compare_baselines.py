#!/usr/bin/env python
"""Comparative baseline runner — the run_gunrock_experiment.sh analogue
(reference: scripts/experiments/run_gunrock_experiment.sh compares against
the Gunrock GPU framework; here the available comparisons are torch CPU
sparse CSR and the NumPy gold).

Prints one line per backend: ms/op and Gnnz/s on the same matrix.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--matrix", default=None, help=".mtx (default: synthetic banded)")
    p.add_argument("-n", type=int, default=1 << 17)
    p.add_argument("--band", type=int, default=63)
    p.add_argument("--trials", type=int, default=5)
    args = p.parse_args()

    from sparseharness_tpu.formats import read_mtx, banded_coo

    coo = read_mtx(args.matrix) if args.matrix else banded_coo(args.n, args.band, seed=1)
    n, nnz = coo.shape[0], coo.nnz
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 1.0, coo.shape[1]).astype(np.float32)
    print(f"matrix: {coo.shape} nnz={nnz}")

    def report(name, seconds):
        print(f"{name:24s} {seconds * 1e3:9.3f} ms/op  {nnz / seconds / 1e9:8.2f} Gnnz/s")

    # ---- NumPy gold (scalar path) -------------------------------------
    from sparseharness_tpu.gold import spmv_gold
    from sparseharness_tpu.semiring import PLUS_TIMES

    t0 = time.perf_counter()
    spmv_gold(coo, x, np.zeros(n, np.float32), PLUS_TIMES)
    report("numpy gold (CPU)", time.perf_counter() - t0)

    # ---- torch sparse CSR (CPU) ---------------------------------------
    try:
        import torch

        csr = coo.to_csr()
        A = torch.sparse_csr_tensor(
            torch.from_numpy(csr.indptr.astype(np.int64)),
            torch.from_numpy(csr.indices.astype(np.int64)),
            torch.from_numpy(csr.data.astype(np.float32)),
            size=coo.shape,
        )
        xt = torch.from_numpy(x).unsqueeze(1)
        A @ xt  # warm
        best = min(
            _timed(lambda: A @ xt) for _ in range(args.trials)
        )
        report("torch sparse CSR (CPU)", best)
    except Exception as e:  # torch optional
        print(f"torch baseline unavailable: {e}")

    # ---- this framework on the default jax backend --------------------
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sh_tpu_jax_cache")
    from sparseharness_tpu.ops import build_operand_auto, spmv

    variant, op = build_operand_auto(coo, PLUS_TIMES)
    k1, k2 = 16, 48
    xj = jnp.asarray(x)

    def chain(k):
        def f(op, xv):
            def body(xv, _):
                dp = spmv(op, xv, None, sr=PLUS_TIMES, variant=variant, n_rows=n)
                return dp * 1e-6, None

            xv, _ = jax.lax.scan(body, xv, None, length=k)
            return xv[:4]

        return jax.jit(f)

    f1, f2 = chain(k1), chain(k2)
    np.asarray(f1(op, xj)); np.asarray(f2(op, xj))
    t1 = min(_timed(lambda: np.asarray(f1(op, xj))) for _ in range(3))
    t2 = min(_timed(lambda: np.asarray(f2(op, xj))) for _ in range(3))
    report(
        f"sparseharness_tpu[{variant}] ({jax.default_backend()})",
        max((t2 - t1) / (k2 - k1), 1e-9),
    )
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())

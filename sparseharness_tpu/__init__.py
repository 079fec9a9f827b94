"""sparseharness_tpu — a TPU-native semiring sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AdamBrouwersHarries/sparseharness (an OpenCL semiring-SpMV benchmarking
harness driving graph algorithms to fixpoint; see /root/reference):

- MatrixMarket loading + sparse format construction (``formats``)
  — reference: src/sparse_matrix.cpp, src/mmio.cpp
- First-class semirings (``semiring``)
  — reference: semiring ops embedded in example/*/kernel*.json OpenCL sources
- NumPy gold references + correctness checking (``gold``)
  — reference: inc/spmv_gold.h, inc/harness.h:113 (check_result)
- TPU kernels: jnp/XLA and Pallas SpMV variants (``ops``)
  — reference: the Lift-generated OpenCL kernel corpus (example/kernel*.json)
- Fixpoint iteration driver (``algorithms.fixpoint``)
  — reference: inc/harness.h:441 (IterativeHarness), app/sssp.cpp:112
- Graph algorithms: spmv/sssp/bfs/pagerank/scc/eigenvector (``algorithms``)
  — reference: app/*.cpp
- Benchmark harness: trials, timeout ratchet, stats, sweeps (``harness``)
  — reference: inc/harness.h:84 (benchmark), inc/sql_stat.h, inc/run.h
- Multi-chip/multi-host execution over a jax Mesh (``parallel``)
  — new scope (the reference is single-device); BASELINE.json north star
- Tracing, logging, config (``utils``)
  — reference: inc/csds_timer.h, inc/util/Logger.h, inc/options.h
"""

__version__ = "0.1.0"

from sparseharness_tpu.semiring import (  # noqa: F401
    Semiring,
    PLUS_TIMES,
    MIN_PLUS,
    OR_AND,
    MAX_MIN,
    MAX_RIGHT,
    get_semiring,
)

from sparseharness_tpu.algorithms.fixpoint import (  # noqa: F401
    FixpointResult,
    run_fixpoint,
    delta_converged,
    exact_converged,
)
from sparseharness_tpu.algorithms.apps import (  # noqa: F401
    Problem,
    make_spmv_problem,
    spmv_once,
    sssp,
    bfs,
    pagerank,
    scc,
    eigenvector,
    connected_components,
    widest_path,
    multi_sssp,
    multi_bfs,
)

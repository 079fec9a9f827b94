from sparseharness_tpu.gold.spmv import spmv_gold, spmv_gold_reference_quirk, spmv_abs_bound  # noqa: F401
from sparseharness_tpu.gold.check import (  # noqa: F401
    Correctness,
    check_result,
)
from sparseharness_tpu.gold.algorithms import (  # noqa: F401
    sssp_gold,
    bfs_levels_gold,
    bfs_reach_gold,
    pagerank_gold,
    scc_labels_gold,
    eigenvector_gold,
    connected_components_gold,
    widest_path_gold,
)

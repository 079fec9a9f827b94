from sparseharness_tpu.formats.mtx import read_mtx, write_mtx, MtxHeader  # noqa: F401
from sparseharness_tpu.formats.sparse import (  # noqa: F401
    COO,
    CSR,
    ELL,
    BSR,
    coo_from_arrays,
    round_up,
)
from sparseharness_tpu.formats.generate import (  # noqa: F401
    random_coo,
    random_graph_coo,
    banded_coo,
    power_law_coo,
    chained_power_law_coo,
    block_random_coo,
)
from sparseharness_tpu.formats.preprocess import (  # noqa: F401
    pagerank_normalise,
    scc_normalise,
)
from sparseharness_tpu.formats.reorder import (  # noqa: F401
    bandwidth,
    inverse_permutation,
    permute_coo,
    rcm_permutation,
    reorder_rcm,
)

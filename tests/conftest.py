"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference tests kernels without real hardware by running under the
Oclgrind OpenCL simulator (scripts/example/spmv.sh:21). The TPU-native
analogue is the JAX CPU backend with a forced multi-device host platform
(SURVEY §4): Pallas kernels run in interpret mode (selected automatically by
ops.pallas_bsr when the backend isn't TPU) and sharding logic runs on 8
virtual devices.

NOTE: this environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel); jax.config.update at import time overrides it.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if os.environ.get("SPARSEHARNESS_TPU_TESTS_ON_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_EXAMPLES = "/root/reference/example"


def reference_matrix_path(name: str):
    p = os.path.join(REFERENCE_EXAMPLES, name)
    return p if os.path.exists(p) else None


@pytest.fixture(scope="session")
def matrix_mtx():
    """HB/1138_bus — the reference's canonical workload, or a synthetic
    stand-in when the reference tree isn't mounted."""
    p = reference_matrix_path("matrix.mtx")
    from sparseharness_tpu.formats import read_mtx, random_coo

    if p:
        return read_mtx(p)
    return random_coo(1138, 1138, 2596, seed=7)


@pytest.fixture(scope="session")
def small_graph():
    from sparseharness_tpu.formats import random_graph_coo

    return random_graph_coo(200, 3.0, seed=1)

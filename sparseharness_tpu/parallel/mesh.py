"""Device mesh construction.

New scope relative to the reference (which drives exactly one OpenCL device
per process — inc/harness.h:50-81; its -p/-d flags only *select* the device,
inc/common.h:9-12). Scaling here follows the JAX SPMD recipe: build a Mesh,
annotate shardings, let XLA insert ICI collectives (BASELINE.json north
star; SURVEY §2 'Parallelism strategies').

The canonical mesh for semiring SpMV is 1-D over axis ``"rows"``: matrix
rows block-partitioned per chip (the DP/SP analogue), x replicated or
ring-exchanged (the TP analogue), convergence psum per fixpoint iteration.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


ROWS_AXIS = "rows"


def device_count() -> int:
    return len(jax.devices())


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: jax.distributed.initialize with explicit or
    env-discovered topology. No-op when single-process (the common case in
    this environment); on a pod slice each host calls this before building
    the mesh and jax.devices() then spans all hosts (ICI within a slice,
    DCN across — SURVEY §5 'Distributed communication backend')."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = ROWS_AXIS,
) -> Mesh:
    """1-D mesh over the row-partition axis. ``n_devices`` defaults to all
    local devices; pass a smaller count to sub-slice."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))

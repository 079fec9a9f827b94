"""GSPMD (auto-sharding) path: annotate shardings, let XLA partition.

The lower-effort alternative to parallel/sharded.py's explicit shard_map:
place the padded-ELL operand row-sharded and x replicated, jit the existing
single-chip spmv, and XLA's SPMD partitioner inserts the collectives. Good
for single-shot SpMV and as a cross-check of the manual SPMD path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.ops import build_operand, spmv, Geometry
from sparseharness_tpu.ops.jnp_ops import EllOperand
from sparseharness_tpu.parallel.mesh import ROWS_AXIS
from sparseharness_tpu.semiring import Semiring


def shard_operand_rows(op: EllOperand, mesh: Mesh) -> EllOperand:
    sh = NamedSharding(mesh, P(ROWS_AXIS, None))
    return EllOperand(
        cols=jax.device_put(op.cols, sh), vals=jax.device_put(op.vals, sh)
    )


def auto_sharded_spmv(
    mesh: Mesh,
    coo: COO,
    sr: Semiring,
    x,
    y=None,
    alpha=None,
    beta=None,
):
    """Build a rows-divisible ELL operand, shard it, and run the ordinary
    spmv under jit — XLA partitions the gather/reduce and all-gathers x."""
    d = mesh.devices.size
    geometry = Geometry(block_m=8 * d, block_n=128)  # rows divisible by D
    op = build_operand(coo, sr, "ell", geometry)
    op = shard_operand_rows(op, mesh)
    x = jax.device_put(jnp.asarray(x, sr.dtype), NamedSharding(mesh, P()))
    if y is not None:
        y = jnp.asarray(y, sr.dtype)

    f = jax.jit(
        lambda op, x, y: spmv(
            op, x, y, sr=sr, variant="ell", n_rows=coo.shape[0],
            alpha=alpha, beta=beta,
        )
    )
    return f(op, x, y)

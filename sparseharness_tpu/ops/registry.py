"""Kernel-variant registry and the public spmv entry point.

The reference selects a kernel by loading a JSON descriptor whose
``properties`` name a schedule (outerMap/innerMap/splitSize/chunkSize —
src/kernel_config.cpp:20-38) and whose ``source`` is compiled at runtime
(inc/harness.h:63-73). Here a *variant* is a named (builder, apply) pair and
a :class:`Geometry` carries the tile/block shape knobs — the analogue of the
reference's runfile NDRange sweep axis (inc/run.h:9, example/runfile2.csv).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from sparseharness_tpu.formats.sparse import COO
from sparseharness_tpu.semiring import Semiring
from sparseharness_tpu.ops import dia
from sparseharness_tpu.ops import jnp_ops
from sparseharness_tpu.ops import pallas_bsr
from sparseharness_tpu.ops import pallas_bsr_ell
from sparseharness_tpu.ops import pallas_bsr_fused
from sparseharness_tpu.ops import pallas_bsr_band
from sparseharness_tpu.ops import pallas_sell
from sparseharness_tpu.ops import pallas_sell2


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Block-shape sweep point (the runfile Run analogue, inc/run.h:9).

    block_m/block_n: tile shape for blocked variants (BSR) and the
    row/width padding multiples for ELL. value_dtype: storage dtype for
    matrix values ("float32" or "bfloat16" — bf16 halves HBM bytes/nnz;
    kernels upcast to f32 for the semiring ops). Hashable+static so it
    can key jit caches.
    """

    block_m: int = 8
    block_n: int = 128
    value_dtype: str = "float32"

    def __str__(self) -> str:
        s = f"{self.block_m}x{self.block_n}"
        if self.value_dtype != "float32":
            s += f"@{self.value_dtype}"
        return s


@dataclasses.dataclass(frozen=True)
class KernelVariant:
    name: str
    build: Callable[[COO, Semiring, Geometry], Any]
    dp: Callable[..., jax.Array]  # (operand, x, sr, *, n_rows) → ⊕-reduced row dps
    description: str = ""
    supports: Optional[Callable[[Semiring], bool]] = None

    def supports_semiring(self, sr: Semiring) -> bool:
        return self.supports is None or self.supports(sr)


VARIANTS: Dict[str, KernelVariant] = {}


def register_variant(v: KernelVariant) -> KernelVariant:
    VARIANTS[v.name] = v
    return v


def get_variant(name: str) -> KernelVariant:
    try:
        return VARIANTS[name]
    except KeyError:
        raise KeyError(f"unknown kernel variant {name!r}; known: {sorted(VARIANTS)}") from None


# ------------------------------------------------------------------ public


#: structure-aware fallback chain for variant="auto": the streaming band
#: kernel when the window is affine, the fused gather kernel when the
#: structure blocks well and x fits VMEM, the all-crossbar sell2 kernel
#: for ragged/power-law rows (chip-validated; no VMEM cap on x), the
#: pre-gathered strips otherwise, ELL as the universal fallback
AUTO_CHAIN = ("bsr_band", "bsr_fused", "sell2", "bsr_ell", "ell")


def _check_init_enabled() -> bool:
    import os

    return os.environ.get("SPARSEHARNESS_TPU_CHECK_INIT", "0") == "1"


def build_operand(coo: COO, sr: Semiring, variant: str = "ell",
                  geometry: Geometry = Geometry()):
    op = get_variant(variant).build(coo, sr, geometry)
    if _check_init_enabled():
        from sparseharness_tpu.ops.verify import verify_operand_initialized

        verify_operand_initialized(coo, sr, op, variant)
    return op


def build_operand_auto(coo: COO, sr: Semiring,
                       geometry: Geometry = Geometry()):
    """(variant_name, operand) for the first buildable AUTO_CHAIN entry."""
    last = None
    for name in AUTO_CHAIN:
        try:
            op = get_variant(name).build(coo, sr, geometry)
        except NotImplementedError as e:
            last = e
            continue
        if _check_init_enabled():
            from sparseharness_tpu.ops.verify import (
                verify_operand_initialized,
            )

            verify_operand_initialized(coo, sr, op, name)
        return name, op
    raise NotImplementedError(f"no variant in {AUTO_CHAIN} applies: {last}")


def spmv(
    operand,
    x: jax.Array,
    y: Optional[jax.Array] = None,
    *,
    sr: Semiring,
    variant: str = "ell",
    n_rows: int,
    alpha=None,
    beta=None,
) -> jax.Array:
    """y_out[:n_rows] = (α ⊗ (⊕_j A[i,j] ⊗ x[j])) ⊕ (β ⊗ y[i]).

    Jit-friendly: wrap in jax.jit with static `sr`, `variant`, `n_rows`
    (they are closed-over/hashable); `operand`, `x`, `y` are pytrees of
    arrays.
    """
    dp = get_variant(variant).dp(operand, x, sr, n_rows=n_rows)[:n_rows]
    if y is not None:
        y = y[:n_rows]
    return jnp_ops.fold_dp(dp, y, sr, alpha, beta)


def jit_spmv(sr: Semiring, variant: str, n_rows: int, alpha=None, beta=None,
             donate_y: bool = False):
    """Returns a jitted fn(operand, x, y) specialized to the static config."""

    def f(operand, x, y):
        return spmv(
            operand, x, y, sr=sr, variant=variant, n_rows=n_rows,
            alpha=alpha, beta=beta,
        )

    donate = (2,) if donate_y else ()
    return jax.jit(f, donate_argnums=donate)


# ------------------------------------------------------------- adapters


def _dp_ell(op, x, sr, *, n_rows):
    return jnp_ops.dp_ell(op, x, sr)


def _dp_coo(op, x, sr, *, n_rows):
    return jnp_ops.dp_coo_seg(op, x, sr, num_rows=n_rows)


def _dp_dense(op, x, sr, *, n_rows):
    return jnp_ops.dp_dense(op, x, sr)


def _dp_bsr(op, x, sr, *, n_rows):
    return pallas_bsr.dp_bsr(op, x, sr, n_rows=n_rows)


register_variant(
    KernelVariant(
        name="ell",
        build=lambda coo, sr, g: jnp_ops.build_ell(
            coo, sr, width_multiple=g.block_n, row_multiple=g.block_m
        ),
        dp=_dp_ell,
        description=(
            "Padded-ELL gather + lane reduce (VPU); maps the reference's "
            "dense-schedule kernel family swrg-slcl-* (example/kernel.json)"
        ),
    )
)

register_variant(
    KernelVariant(
        name="coo_seg",
        build=lambda coo, sr, g: jnp_ops.build_coo_seg(coo, sr),
        dp=_dp_coo,
        description=(
            "Row-sorted segmented ⊕ over COO; maps the ragged 'rsa' family "
            "glb-sdp-rsa (example/kernel5.json) — no padding blow-up on "
            "power-law rows"
        ),
    )
)

register_variant(
    KernelVariant(
        name="dense",
        build=lambda coo, sr, g: jnp_ops.build_dense(
            coo, sr, row_multiple=g.block_m, col_multiple=g.block_n
        ),
        dp=_dp_dense,
        description="Densified operand (MXU for plus_times); roofline foil",
    )
)

def _dp_bsr_ell(op, x, sr, *, n_rows):
    return pallas_bsr_ell.dp_bsr_ell(op, x, sr, n_rows=n_rows)


def _dp_dia(op, x, sr, *, n_rows):
    return dia.dp_dia(op, x, sr, n_rows=n_rows)


def _dp_bsr_fused(op, x, sr, *, n_rows):
    return pallas_bsr_fused.dp_bsr_fused(op, x, sr, n_rows=n_rows)


def _dp_bsr_band(op, x, sr, *, n_rows):
    return pallas_bsr_band.dp_bsr_band(op, x, sr, n_rows=n_rows)


def _dp_sell(op, x, sr, *, n_rows):
    return pallas_sell.dp_sell(op, x, sr, n_rows=n_rows)


register_variant(
    KernelVariant(
        name="bsr_band",
        build=lambda coo, sr, g: pallas_bsr_band.build_bsr_band(
            coo, sr, bm=g.block_m, bn=g.block_n, value_dtype=g.value_dtype
        ),
        dp=_dp_bsr_band,
        description=(
            "Gen-4 Pallas block-banded kernel: affine x windows (no gather, "
            "no scalar prefetch) - pure streaming for banded/stencil "
            "structure; falls back if the window is not affine"
        ),
    )
)


register_variant(
    KernelVariant(
        name="sell",
        build=lambda coo, sr, g: pallas_sell.build_sell(coo, sr),
        dp=_dp_sell,
        description=(
            "Gen-5 ragged kernel (DEBUG/REFERENCE variant — use sell2: "
            "this design rides multi-vreg sublane dynamic_gather, which "
            "the production Mosaic build rejects, so it runs in interpret "
            "mode only; BENCH_r03.json gate_skipped records the guard). "
            "Kept as the design record that motivated sell2's all-crossbar "
            "pipeline; superseded by sell2 on every axis"
        ),
    )
)


def _dp_sell2(op, x, sr, *, n_rows):
    return pallas_sell2.dp_sell2(op, x, sr, n_rows=n_rows)


register_variant(
    KernelVariant(
        name="sell2",
        build=lambda coo, sr, g: pallas_sell2.build_sell2(
            coo, sr, value_dtype=g.value_dtype
        ),
        dp=_dp_sell2,
        description=(
            "Gen-6 ragged/power-law kernel (the reference's rsa family, "
            "example/kernel5.json), chip-validated: all-crossbar panel "
            "pipeline — T-crossbar-T x staging from 16K-col chunks, lane-"
            "crossbar phase A, XOR-butterfly row reduce with capture/route "
            "crossbars; 3 words/slot HBM traffic, no VMEM cap on x"
        ),
    )
)


register_variant(
    KernelVariant(
        name="bsr_fused",
        build=lambda coo, sr, g: pallas_bsr_fused.build_bsr_fused(
            coo, sr, bm=g.block_m, bn=g.block_n, value_dtype=g.value_dtype
        ),
        dp=_dp_bsr_fused,
        description=(
            "Gen-3 Pallas BSR: x resident in VMEM, in-kernel block gather "
            "from scalar-prefetched cols; tiles are the only large HBM "
            "stream (x must fit VMEM)"
        ),
    )
)


register_variant(
    KernelVariant(
        name="dia",
        build=lambda coo, sr, g: dia.build_dia(coo, sr),
        dp=_dp_dia,
        description=(
            "Diagonal layout (DEBUG/REFERENCE variant — auto routes banded "
            "structure to bsr_band instead): statically shifted XLA slices "
            "of x, zero gathers, ~11% of peak. A Pallas exact-DIA kernel "
            "would halve bsr_band's streamed bytes but pays one VPU lane-"
            "rotate per diagonal per 16K rows, which the measured crossbar "
            "rate puts below bsr_band for every window that fits it "
            "(scripts/probe_crossbar_ceiling.py, "
            "results/crossbar_ceiling_tpu.json)"
        ),
    )
)


register_variant(
    KernelVariant(
        name="bsr_ell",
        build=lambda coo, sr, g: pallas_bsr_ell.build_bsr_ell(
            coo, sr, bm=g.block_m, bn=g.block_n, value_dtype=g.value_dtype
        ),
        dp=_dp_bsr_ell,
        description=(
            "Gen-2 Pallas BSR: ELL-of-tiles layout, pre-gathered x blocks, "
            "static streaming pipeline (no scalar prefetch); the fixed-"
            "schedule family (splitSize/chunkSize, example/kernel3.json)"
        ),
    )
)

register_variant(
    KernelVariant(
        name="bsr_pallas",
        build=lambda coo, sr, g: pallas_bsr.build_bsr(
            coo, sr, bm=g.block_m, bn=g.block_n
        ),
        dp=_dp_bsr,
        description=(
            "Pallas block-sparse-row kernel: scalar-prefetched tile-column "
            "ids steer x-block selection, dense (bm,bn) tiles ride "
            "VPU/MXU; maps the blocked/chunked family "
            "(example/kernel6.json chunkSize)"
        ),
    )
)

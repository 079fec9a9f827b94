"""Speed-of-light (HBM-bandwidth roofline) model per kernel variant.

Semiring SpMV is bandwidth-bound on every TPU generation (a ⊗ and a ⊕ per
nonzero against ≥8 bytes of operand traffic), so the meaningful roofline is
bytes-moved / HBM bandwidth, and the headline metric is nnz/s as a fraction
of that bound — BASELINE.md's "≥80 % of HBM-bandwidth-bound nnz/s per chip".
Non-arithmetic semirings (min/max/or) never touch the MXU; FLOP/s is
reported but nnz/s-vs-roofline is the honest number (SURVEY §7 hard part 3).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

# peak HBM bandwidth per chip, bytes/s (public spec sheets)
_HBM_BW = {
    "TPU v2": 700e9,
    "TPU v3": 900e9,
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,   # v5e
    "TPU v5e": 819e9,
    "TPU v5": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,  # v6e / Trillium
    "TPU v6e": 1640e9,
    "cpu": 50e9,            # nominal host DRAM, for interpret-mode runs
}


def device_hbm_bandwidth(device: Optional[jax.Device] = None) -> float:
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for key, bw in _HBM_BW.items():
        if kind.startswith(key):
            return bw
    return _HBM_BW["cpu"] if device.platform == "cpu" else 819e9


def variant_bytes(variant: str, operand, x_bytes: int, out_bytes: int) -> int:
    """Minimum HBM traffic for one SpMV with this operand.

    Blocked Pallas kernels (bsr_*): every operand array once + x once + the
    output once (their x accesses are VMEM-resident block DMAs, so one HBM
    pass of x is the true floor). Pure-XLA gather variants are charged their
    *gather traffic* instead of one x pass — XLA's elementwise gather on TPU
    fetches per element with no VMEM reuse (CLAUDE.md 'Environment gotchas'),
    so the honest floor reads one x element per operand slot (``ell``) or
    per nonzero plus the segment read-modify-write (``coo_seg``). Without
    this, those variants' roofline_frac was computed against a model the
    kernel cannot possibly meet (VERDICT r1 weak #4)."""
    leaves = [
        a for a in jax.tree_util.tree_leaves(operand) if hasattr(a, "shape")
    ]
    operand_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize for a in leaves
    )
    itemsize = max((a.dtype.itemsize for a in leaves), default=4)
    if variant == "ell":
        # cols/vals are (R_pad, W_pad): one x element gathered per slot
        slots = max(int(np.prod(a.shape)) for a in leaves)
        return operand_bytes + slots * itemsize + out_bytes
    if variant == "coo_seg":
        # one x element per nonzero + the segment reduction's dp
        # read-modify-write per nonzero
        nnz_pad = max(int(a.shape[0]) for a in leaves)
        return operand_bytes + 2 * nnz_pad * itemsize + out_bytes
    if variant == "sell2":
        # the per-chunk transposed xT is materialized by XLA each SpMV
        # (read x + write xT) before the kernel streams it: 3 x passes
        return operand_bytes + 3 * x_bytes + out_bytes
    return operand_bytes + x_bytes + out_bytes


# VPU tile-op ceiling for the crossbar-pipeline ragged kernels. A (128,128)
# lane crossbar retires in ~50 VPU cycles on v5e (CLAUDE.md 'Measured
# ceilings'; scripts/probe_crossbar_ceiling.py), and one sell2 panel is
# ~16 crossbar-class tile-ops (results/crossbar_ceiling_tpu.json
# model_tile_ops_per_panel), so the kernel's speed-of-light is
# ~16·50 cycles/panel at the ~940 MHz VPU clock regardless of how little
# HBM traffic it moves. Without this term the ragged path is judged
# against a bytes-only model it cannot possibly meet: sell2's 0.16
# HBM-frac on the zipf bench reads as failure when the kernel is within
# ~2x of its crossbar-bound floor (VERDICT r3 weak #3). Only v5e is
# measured; other generations reuse the constant as a nominal figure.
_PANEL_TILE_OPS = 16
_CROSSBAR_CYCLES = 50
_VPU_HZ = 940e6
_PANEL_FLOOR_S = _PANEL_TILE_OPS * _CROSSBAR_CYCLES / _VPU_HZ

# ---- per-bucket sell2 panel model (r5, VERDICT r4 weak #8) ------------
# The flat 16-op constant blended buckets: depth-0 single-tile panels run
# materially fewer crossbars than depth-3 two-tile ones. Op counts read
# off the kernel structure (ops/pallas_sell2._panel_call):
#   crossbars  C(d, tt, hh) = 8 + 2·tt + (d + hh)·(1 + tt)
#   transposes T(hh)        = 4 + hh
# Per-op FLOOR costs: a crossbar at the measured 50-cycle v5e rate (the
# r4 basis) and a transpose at the standalone transpose/crossbar ratio
# 2268/600 ≈ 3.78× (results/crossbar_ceiling_tpu.json) — transposes are
# multi-step shuffles, not 50-cycle ops, which is where the flat model
# undercounted. Chip calibration (scripts/probe_sell2_buckets_tpu.py,
# results/sell2_buckets_tpu.json — pure-bucket panel marginals via
# operand bucket slicing, so x-prep/virt-gather/launch costs cancel):
# the dominant (depth 4, 1-tile, lo-route) bucket runs at ~93% of this
# floor; butterfly depth measures ~free (+4 ns/level — the adds pipeline
# behind the crossbars), so deep-bucket floors are conservative; the
# hi-route and two-tile data paths measure ~0.9–1.0 µs/panel against
# ~0.5 µs modeled — the remaining attribution gap (selects/concat are
# uncounted). v5e only; other generations reuse as nominal figures.
_SELL2_XBAR_S: Optional[float] = _CROSSBAR_CYCLES / _VPU_HZ       # 53 ns
_SELL2_TRANSPOSE_S: Optional[float] = 3.78 * _CROSSBAR_CYCLES / _VPU_HZ


def sell2_panel_ops(depth: int, two_tiles: bool, has_hi: bool):
    """(crossbars, transposes) one panel of this bucket executes."""
    tt = 1 if two_tiles else 0
    hh = 1 if has_hi else 0
    return 8 + 2 * tt + (depth + hh) * (1 + tt), 4 + hh


def _sell2_panel_seconds(lay) -> float:
    c, t = sell2_panel_ops(lay.depth, lay.two_tiles, lay.has_hi)
    if _SELL2_XBAR_S is None or _SELL2_TRANSPOSE_S is None:
        # uncalibrated fallback: the r4 flat model
        return _PANEL_FLOOR_S
    return c * _SELL2_XBAR_S + t * _SELL2_TRANSPOSE_S


def variant_vpu_seconds(variant: str, operand,
                        device: Optional[jax.Device] = None) -> float:
    """Minimum VPU time for one SpMV, 0.0 for non-crossbar-bound variants
    (their ceiling is pure HBM traffic)."""
    if device is None:
        device = jax.devices()[0]
    if not getattr(device, "device_kind", "").startswith("TPU"):
        return 0.0   # interpret-mode runs: no VPU model
    if variant in ("sell", "sell2") and hasattr(operand, "layouts"):
        return sum(
            lay.panels * _sell2_panel_seconds(lay)
            for lay in operand.layouts
        )
    return 0.0


def roofline_seconds(variant: str, operand, x_bytes: int, out_bytes: int,
                     device: Optional[jax.Device] = None) -> float:
    """Speed-of-light seconds for one SpMV: the larger of the HBM-traffic
    bound and the VPU tile-op bound (= the slower of the two ceilings —
    frac-of-min(HBM, VPU) in rate terms, VERDICT r3 next #2)."""
    hbm = variant_bytes(
        variant, operand, x_bytes, out_bytes) / device_hbm_bandwidth(device)
    return max(hbm, variant_vpu_seconds(variant, operand, device))

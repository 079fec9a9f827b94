"""Gen-4 Pallas kernel for block-banded matrices: affine x windows, no gather.

For matrices whose nonzeros sit within a fixed-width window around an
affine-in-row position (banded systems, stencils, block tridiagonals — and
the bench's banded workload), the x-block needed by a group of block-rows
is a *statically predictable* slice: group g (= bn/bm consecutive
block-rows = one x-block worth of rows) reads x blocks
[base(g), base(g)+K) with base(g) = clamp(g + c0). The kernel therefore
does one dynamic-but-affine sublane slice of the VMEM-resident x per group
— zero per-row gathers, zero scalar prefetch — and the strip stream is the
only HBM traffic. This is the pure-streaming end of the variant family
(the DIA idea lifted to BSR block granularity).

Build detects the structure (window offset c0 and width K from the data)
and raises NotImplementedError when the matrix doesn't fit (K would exceed
MAX_WINDOW_BLOCKS), so sweeps fall back to bsr_fused/bsr_ell.

Two execution paths, picked by x's footprint:

- **resident** (x ≤ ~6 MB of VMEM): whole x lives in VMEM, groups are
  batched ~1 MB of strip traffic per grid step, the window is a dynamic
  sublane slice — the validated 90%-of-HBM-roofline path;
- **windowed** (any x): one group per grid step, and the K window blocks
  arrive as K single-block BlockSpecs whose index maps compute
  clamp(g + c0) + k — x streams from HBM like the strips do, so there is
  no VMEM cap on the problem size (x traffic is 1/(bn) of strip traffic,
  noise on the roofline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparseharness_tpu.formats.sparse import COO, fold_duplicates, round_up
from sparseharness_tpu.semiring import Semiring
from sparseharness_tpu.ops.pallas_bsr import _carrier, _interpret, _np_fold_for

MAX_WINDOW_BLOCKS = 8
_TARGET_STEP_BYTES = 1024 * 1024
#: x footprint above which dp switches from VMEM-resident x to streamed
#: affine windows (HBM x, no size cap)
X_RESIDENT_BYTES = 6 * 1024 * 1024
#: one row-group's full-window strip block above which the window is
#: k-chunked across a second grid axis (double-buffered blocks must stay
#: well under the 16 MB scoped-VMEM limit)
_MAX_GROUP_BYTES = 3 * 1024 * 1024


@jax.tree_util.register_pytree_node_class
class BsrBandOperand:
    """strips (R_blocks, bm, K·bn): slot k ↔ x block base(g)+k. The static
    window parameters ride as pytree aux data so they key jit caches."""

    def __init__(self, strips: jax.Array, c0: int, k_win: int, n_cols: int):
        self.strips = strips
        self.c0 = int(c0)
        self.k_win = int(k_win)
        self.n_cols = int(n_cols)

    def tree_flatten(self):
        return (self.strips,), (self.c0, self.k_win, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def build_bsr_band(coo: COO, sr: Semiring, bm: int = 8, bn: int = 128,
                   value_dtype: str = "float32") -> BsrBandOperand:
    if bn % bm != 0:
        raise NotImplementedError("bsr_band requires bn % bm == 0")
    gs = bn // bm  # block-rows per x-block-aligned group
    n, c = coo.shape
    dtype, _, _, _, zero, as_int = _carrier(sr)
    coo = fold_duplicates(coo, _np_fold_for(sr, as_int))
    c_blocks = round_up(max(c, 1), bn) // bn
    n_block_rows = round_up(max(n, 1), bm) // bm
    n_groups = round_up(n_block_rows, gs) // gs

    g_of = (coo.rows // bm) // gs
    bc = coo.cols // bn
    # per-group column-block span
    min_bc = np.full(n_groups, np.iinfo(np.int32).max, np.int64)
    max_bc = np.full(n_groups, -1, np.int64)
    np.minimum.at(min_bc, g_of, bc)
    np.maximum.at(max_bc, g_of, bc)
    occupied = max_bc >= 0
    if not occupied.any():
        raise NotImplementedError("empty matrix; use another variant")
    # window offset: make base(g) = clamp(g + c0) cover [min_bc, max_bc]
    c0 = int(np.min((min_bc - np.arange(n_groups))[occupied]))
    base = np.clip(np.arange(n_groups) + c0, 0, None)
    k_win = int(np.max((max_bc - base + 1)[occupied]))
    if k_win > MAX_WINDOW_BLOCKS:
        raise NotImplementedError(
            f"window of {k_win} x-blocks exceeds {MAX_WINDOW_BLOCKS}: "
            "matrix is not banded enough for bsr_band"
        )
    base = np.clip(base, 0, max(c_blocks - k_win, 0))
    if np.any(bc < base[g_of]) or np.any(bc >= base[g_of] + k_win):
        # clamping at the right edge pushed some entries out of window
        k_win += int(np.max(bc - (base[g_of] + k_win - 1)).clip(0))
        if k_win > MAX_WINDOW_BLOCKS:
            raise NotImplementedError("edge clamping exceeds window limit")
        base = np.clip(np.arange(n_groups) + c0, 0, max(c_blocks - k_win, 0))
        if np.any(bc < base[g_of]) or np.any(bc >= base[g_of] + k_win):
            raise NotImplementedError("window structure not affine enough")

    r_rows = n_groups * gs  # padded block rows (gs multiple)
    strips = np.full((r_rows, bm, k_win * bn), zero, dtype=np.dtype(sr.dtype) if not as_int else np.int32)
    vals = coo.vals if not as_int else (coo.vals != 0).astype(np.int32)
    br = coo.rows // bm
    slot = bc - base[g_of]
    lane = slot * bn + coo.cols % bn
    strips[br, coo.rows % bm, lane] = vals.astype(strips.dtype)

    store_dtype = dtype
    if value_dtype == "bfloat16" and not as_int and np.issubdtype(
        np.dtype(sr.dtype), np.floating
    ):
        store_dtype = jnp.bfloat16
    return BsrBandOperand(
        strips=jnp.asarray(strips, dtype=store_dtype),
        c0=c0, k_win=k_win, n_cols=c,
    )


def dp_bsr_band(op: BsrBandOperand, x: jax.Array, sr: Semiring, *,
                n_rows: int, windowed: bool = None) -> jax.Array:
    """⊕-reduced row dot-products over the padded row space.

    `windowed=None` picks the path by x's VMEM footprint; tests force each
    path explicitly to cover both on small shapes.
    """
    r_rows, bm, kbn = op.strips.shape
    k = op.k_win
    bn = kbn // k
    gs = bn // bm
    dtype, add, mul, reduce_, zero, as_int = _carrier(sr)
    # windowed path indexes x in whole blocks up to base+k: keep ≥ k blocks
    c_pad = max(round_up(max(x.shape[0], 1), bn), k * bn)
    c_blocks = c_pad // bn
    x_pad = jnp.pad(
        x.astype(sr.dtype), (0, c_pad - x.shape[0]),
        constant_values=jnp.asarray(sr.zero, sr.dtype),
    )
    x2d = x_pad.reshape(c_blocks, bn)
    if as_int:
        x2d = x2d.astype(jnp.int32)
    strips = op.strips
    # one group's full-window strip block; beyond ~3 MB the resident
    # path's double-buffered DMA exceeds the 16 MB scoped-VMEM limit
    # (wide max_window overrides from the sharded band path), so such
    # windows take the streamed path, which k-chunks the window
    group_bytes = gs * bm * kbn * strips.dtype.itemsize
    if windowed is None:
        windowed = (x2d.size * x2d.dtype.itemsize > X_RESIDENT_BYTES
                    or group_bytes > _MAX_GROUP_BYTES)
    if windowed:
        return _dp_windowed(op, x2d, sr, c_blocks=c_blocks, as_int=as_int)
    upcast = strips.dtype == jnp.bfloat16

    # groups per grid step, sized for ~1MB strip traffic per step
    bytes_per_group = gs * bm * kbn * strips.dtype.itemsize
    gps = max(1, min(_TARGET_STEP_BYTES // max(bytes_per_group, 1),
                     r_rows // gs))
    n_groups = r_rows // gs
    while n_groups % gps:
        gps -= 1
    rg = gps * gs
    grid = (r_rows // rg,)
    c0 = op.c0
    max_base = max(c_blocks - k, 0)

    def kernel(strip_ref, x_ref, out_ref):
        i = pl.program_id(0)
        for g in range(gps):  # static groups within the step
            gg = i * gps + g
            w0 = jnp.clip(gg + c0, 0, max_base)
            xwin = x_ref[pl.ds(w0, k), :]          # (k, bn) affine slice
            st = strip_ref[g * gs:(g + 1) * gs]    # (gs, bm, k*bn)
            if upcast:
                st = st.astype(jnp.float32)
            acc = None
            for kk in range(k):  # static slots
                part = mul(
                    xwin[kk][None, None, :], st[:, :, kk * bn:(kk + 1) * bn]
                )
                acc = part if acc is None else add(acc, part)
            out_ref[g * gs:(g + 1) * gs] = reduce_(acc, axis=-1)  # (gs, bm)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rg, bm, kbn), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole x2d resident
        ],
        out_specs=pl.BlockSpec((rg, bm), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_rows, bm), x2d.dtype),
        interpret=_interpret(),
    )(strips, x2d)
    dp = out.reshape(-1)
    if as_int:
        dp = dp > 0
    return dp


def _dp_windowed(op: BsrBandOperand, x2d: jax.Array, sr: Semiring, *,
                 c_blocks: int, as_int: bool) -> jax.Array:
    """Streamed-x band SpMV: no VMEM residency requirement on x.

    gps groups per grid step; each group's K window blocks arrive as K
    single-block BlockSpecs with affine index maps clamp(i·gps + g + c0) + k,
    so x streams from HBM exactly like the strips. Mosaic needs the
    last-two block dims to be (8·a, 128·b) or equal to the array dims, so x
    rides as (c_blocks, 8, bn) with the block replicated across the 8
    sublanes — an 8× copy of x, which is ≤ 8·gps·K/(gs·bm·K·bn) of the
    strip bytes per step (noise), and keeps the window fetch a plain block
    DMA instead of a manual semaphore pipeline. Steps are sized toward the
    resident path's ~1 MB strip traffic, capped at 32 window specs.
    """
    r_rows, bm, kbn = op.strips.shape
    k = op.k_win
    bn = kbn // k
    gs = bn // bm
    _, add, mul, reduce_, _, _ = _carrier(sr)
    strips = op.strips
    upcast = strips.dtype == jnp.bfloat16
    n_groups = r_rows // gs
    c0 = op.c0
    max_base = max(c_blocks - k, 0)
    x3d = jnp.broadcast_to(x2d[:, None, :], (c_blocks, 8, bn))

    # window chunk: kc slots per grid step, accumulated into the revisited
    # out block across the minor grid axis. kc divides k so the grid is
    # uniform (a divisor small enough always exists: a single slot is
    # gs·bm·bn ≤ 64 KB). Also bounds the per-step x window specs (≤ 32).
    item = strips.dtype.itemsize
    kc = k
    while (gs * bm * kc * bn * item > _MAX_GROUP_BYTES or kc > 32):
        kc -= 1
        while k % kc:
            kc -= 1
    n_chunks = k // kc

    bytes_per_group = gs * bm * kc * bn * item
    gps = max(1, min(_TARGET_STEP_BYTES // max(bytes_per_group, 1),
                     max(32 // kc, 1), n_groups))
    while n_groups % gps:
        gps -= 1
    rg = gps * gs

    def kernel(strip_ref, *refs):
        xw_refs, out_ref = refs[:-1], refs[-1]
        j = pl.program_id(1)
        for g in range(gps):  # static groups within the step
            st = strip_ref[g * gs:(g + 1) * gs]  # (gs, bm, kc·bn)
            if upcast:
                st = st.astype(jnp.float32)
            acc = None
            for kk in range(kc):  # static slots within the chunk
                part = mul(
                    xw_refs[g * kc + kk][0, 0, :][None, None, :],
                    st[:, :, kk * bn:(kk + 1) * bn],
                )
                acc = part if acc is None else add(acc, part)
            red = reduce_(acc, axis=-1)  # (gs, bm)
            sl = slice(g * gs, (g + 1) * gs)
            if n_chunks == 1:
                out_ref[sl] = red
            else:
                @pl.when(j == 0)
                def _init():
                    out_ref[sl] = red

                @pl.when(j > 0)
                def _accum():
                    out_ref[sl] = add(out_ref[sl], red)

    def _xmap(g, kk):
        return lambda i, j: (
            jnp.clip(i * gps + g + c0, 0, max_base) + j * kc + kk, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n_groups // gps, n_chunks),
        in_specs=[pl.BlockSpec((rg, bm, kc * bn), lambda i, j: (i, 0, j))]
        + [pl.BlockSpec((1, 8, bn), _xmap(g, kk))
           for g in range(gps) for kk in range(kc)],
        out_specs=pl.BlockSpec((rg, bm), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_rows, bm), x2d.dtype),
        interpret=_interpret(),
    )(strips, *([x3d] * (gps * kc)))
    dp = out.reshape(-1)
    if as_int:
        dp = dp > 0
    return dp


def spmm_band(op: BsrBandOperand, x_block: jax.Array, *, n_rows: int,
              tm: int = 128) -> jax.Array:
    """MXU block-sparse SpMM for the band layout: Y = A @ X.

    Each grid step multiplies a group's dense strip (gs·bm, K·bn) by its
    affine X window (K·bn, tm) with MXU dots — the FLOPs live on the
    systolic array and the strips stream once per X column-tile. plus_times
    only (MXU is a (+,×) engine); other semirings go through ops.spmm's
    column map. X: (n_cols, m); returns (n_rows, m) float32.
    """
    r_rows, bm, kbn = op.strips.shape
    k = op.k_win
    bn = kbn // k
    gs = bn // bm
    n_groups = r_rows // gs
    m = x_block.shape[1]
    m_pad = round_up(max(m, 1), tm)
    c_pad = round_up(max(x_block.shape[0], 1), bn)
    c_blocks = c_pad // bn
    xp = jnp.pad(
        x_block.astype(jnp.float32),
        ((0, c_pad - x_block.shape[0]), (0, m_pad - m)),
    )
    x3d = xp.reshape(c_blocks, bn, m_pad)
    strips = op.strips  # f32 or bf16 — MXU takes both, f32 accumulation
    c0 = op.c0
    max_base = max(c_blocks - k, 0)

    def kernel(strip_ref, *refs):
        xw_refs, out_ref = refs[:-1], refs[-1]
        st = strip_ref[...]  # (gs, bm, K·bn)
        acc = None
        # HIGHEST = 3-pass bf16 decomposition ≈ true f32 matmul; the MXU
        # default single pass is bf16-precision and fails f32 gold checks.
        # bf16-stored strips skip the extra passes (inputs are bf16 anyway).
        prec = (
            jax.lax.Precision.DEFAULT
            if strips.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        for kk in range(k):
            a = st[:, :, kk * bn:(kk + 1) * bn].reshape(gs * bm, bn)
            part = jnp.dot(
                a, xw_refs[kk][0], preferred_element_type=jnp.float32,
                precision=prec,
            )  # (gs·bm, tm) on the MXU
            acc = part if acc is None else acc + part
        out_ref[...] = acc

    # index maps are in *block* units, so the K window slots ride as K
    # single-block specs at consecutive block indices (a k-sized block dim
    # would stride by k, not 1)
    def _xmap(kk):
        return lambda g, j: (jnp.clip(g + c0, 0, max_base) + kk, 0, j)

    out = pl.pallas_call(
        kernel,
        grid=(n_groups, m_pad // tm),
        in_specs=[pl.BlockSpec((gs, bm, kbn), lambda g, j: (g, 0, 0))]
        + [pl.BlockSpec((1, bn, tm), _xmap(kk)) for kk in range(k)],
        out_specs=pl.BlockSpec((gs * bm, tm), lambda g, j: (g, j)),
        out_shape=jax.ShapeDtypeStruct((r_rows * bm, m_pad), jnp.float32),
        interpret=_interpret(),
    )(strips, *([x3d] * k))
    return out[:n_rows, :m]

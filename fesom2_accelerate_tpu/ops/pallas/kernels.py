"""Pallas TPU kernels for the FCT-ALE chain.

Every irregular mesh access is a **one-hot contraction on the MXU** against a
VMEM-resident window of the source array (see plan.py for the windowing).
Gathers select columns of a level-major slab; scatters use the transposed
one-hot so the edge->node accumulation (the reference's atomicAdd hot spot,
kernels/fct_ale_b1_horizontal.cu:24-27) is a deterministic matmul sum.

Windowing: each tile reads J consecutive 128-wide blocks of the source
(plan.py), sized to the tile's actual index span.  The contraction AND the
one-hot construction cost are linear in window width, so two refinements
matter beyond fine block granularity:

* **split endpoint windows**: edges are canonically oriented n0 < n1 and
  sorted by n0 (mesh/topology.py), so the edges *starting* in a node tile
  are index-contiguous (narrow window ~3*tile) while only the edges
  *ending* there spread over the mesh bandwidth.  Scatters and endpoint
  gathers therefore run as two groups with independent windows instead of
  one union window — ~1.4x less one-hot work.
* **stage fusion**: the elementwise stages (a1, b1-vertical, b2,
  b3-vertical, stage c epilogues) run inside the neighboring gather/scatter
  kernel on the same tiles, so their intermediates never round-trip HBM.
  The whole vlimit=1 chain is FOUR kernels:

  K1 bounds:  a1 + a2 + a3        (fused node-neighbor reduction)
  K2 limit:   b1v + b1h + b2      (split-window scatter + Zalesak factors)
  K3 b3h:     b3-horizontal       (split-window endpoint gathers)
  K4 update:  b3v + c             (split-window scatter + solution update)

Layouts inside kernels:
* level-major slabs ``[Lp, W]`` / stacked pairs ``[2*Lp, W]`` (max/min or
  plus/minus stacked on the sublane axis so one contraction serves both);
* one-hot matrices built in-kernel from index rows via ``broadcasted_iota``
  compares — nothing index-shaped ever round-trips to HBM;
* ``k``-major column layout for multi-gathers, so per-k slices are
  contiguous lanes and reductions need no lane reshape.

All kernels are f32 (the TPU perf dtype); the f64 correctness gate runs on
the XLA path against the numpy oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fesom2_accelerate_tpu.ops.pallas.plan import BLOCK

_BIG = 1e30
_CHUNK = 1024  # window chunk for one-hot contractions (bounds VMEM use)

# Mosaic's default scoped-VMEM cap is 16 MiB; the unrolled window-chunk
# pipelines exceed it at CORE2 window sizes.  v5e has 128 MiB of physical
# VMEM — raise the cap rather than shrinking tiles.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

_INTERPRET = False


def set_interpret(on: bool) -> None:
    """Process-wide plain-interpret switch for ALL FCT-ALE pallas calls.

    Used on CPU hosts where ``pltpu.force_tpu_interpret_mode`` cannot run:
    the TPU-sim's per-device callbacks deadlock under MULTI-PROCESS
    shard_map (observed: 2-process gloo workers hang in the first step),
    while plain ``interpret=True`` lowers to pure JAX ops that compile and
    partition like any other program."""
    global _INTERPRET
    _INTERPRET = on


def pallas_call(*args, **kw):
    """pl.pallas_call honoring :func:`set_interpret`."""
    if _INTERPRET:
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)


def _lcol(ref):
    """Read a [1, C, 1] tile-column block -> [C, 1]."""
    return ref[0]


def _row_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 0)


def _col_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 1)


def _concat(refs):
    """Concatenate J window-block refs into one [R, J*BLOCK] VMEM slab."""
    if len(refs) == 1:
        return refs[0][:]
    return jnp.concatenate([r[:] for r in refs], axis=1)


def _concat_col(refs):
    """Concatenate J [BLOCK, 1] column refs into [J*BLOCK, 1]."""
    if len(refs) == 1:
        return refs[0][:]
    return jnp.concatenate([r[:] for r in refs], axis=0)


def _split3(x):
    """Exact 3-way bf16 decomposition of an f32 array: x = hi + mid + lo.

    Each component is exactly representable in bf16, so a DEFAULT-precision
    MXU contraction against a 0/1 one-hot is EXACT per term: Mosaic's
    default f32 dot is a single lossy bf16 pass, its HIGH precision is
    unsupported, and HIGHEST explodes compile time — this explicit split
    compiles as fast as default and restores exactness.  Components stay
    f32 (NOT bf16): 16-bit operands force Mosaic vreg relayouts that cost
    far more than they save (measured 3x slower on b3h)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    mid = (x - hi).astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi - mid
    return (hi, mid, lo)


def _gather_segments(slab, neutral=None, chunk=_CHUNK):
    """Split a window slab [R, W] into chunk segments with base offsets.

    Returns a list of (segment, base).  neutral=(top, bottom, Lp) appends a
    BLOCK-wide column block at base W holding the reduction-neutral values
    (rows < Lp: top; else bottom) selected by the sentinel index."""
    W = slab.shape[1]
    chunk = min(W, chunk)
    segs = []
    for c0 in range(0, W, chunk):
        cw = min(chunk, W - c0)
        segs.append((slab[:, c0:c0 + cw], c0))
    if neutral is not None:
        top, bottom, Lp = neutral
        R = slab.shape[0]
        extra = jnp.where(_row_iota((R, BLOCK)) < Lp, top, bottom)
        segs.append((extra, W))
    return segs


def _gather_dot(slab, lidx_col, C, neutral=None, chunk=_CHUNK):
    """Gather columns from a window slab: one one-hot per chunk, three exact
    bf16-split contractions per chunk -> [R, C]."""
    acc = None
    for seg, base in _gather_segments(slab, neutral, chunk):
        ch = seg.shape[1]
        ohT = ((_col_iota((C, ch)) + base) == lidx_col).astype(jnp.float32)
        for part in _split3(seg):
            g = jax.lax.dot_general(
                part, ohT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = g if acc is None else acc + g
    return acc


_SCATTER_CHUNK = 512


def _scatter_dot(adf, ids, nw, t0, TN, Lp, split_pm: bool,
                 chunk=_SCATTER_CHUNK):
    """Scatter window flux columns into TN targets -> [R, TN].

    adf [Lp, W]; ids [W, 1] global target ids (-1 pad); nw [1, W] active
    level counts.  split_pm=True contracts the stacked [max(0,F); max(0,-F)]
    (R = 2*Lp, for b1h's plus/minus split); False contracts F directly
    (R = Lp, for stage c's signed sum)."""
    W = adf.shape[1]
    chunk = min(W, chunk)
    acc = None
    for c0 in range(0, W, chunk):
        cw = min(chunk, W - c0)
        cols = _col_iota((cw, TN)) + t0
        sl = slice(c0, c0 + cw)
        emask = _row_iota((Lp, cw)) < nw[:, sl]
        F = jnp.where(emask, adf[:, sl], 0.0)
        if split_pm:
            F = jnp.concatenate(
                [jnp.maximum(F, 0.0), jnp.maximum(-F, 0.0)], axis=0
            )
        A = (ids[sl, :] == cols).astype(jnp.float32)
        for part in _split3(F):
            g = jnp.dot(part, A, preferred_element_type=jnp.float32)
            acc = g if acc is None else acc + g
    return acc


def _win_specs(rows, J, col, n=1):
    """n*J BlockSpecs for J-block windowed [rows, BLOCK] inputs.

    The scalar-prefetch array wb is [T, 2]; ``col`` selects which window
    group's first block to use."""
    specs = []
    for _ in range(n):
        for j in range(J):
            specs.append(pl.BlockSpec(
                (rows, BLOCK), lambda i, wb, j=j, c=col: (0, wb[i, c] + j)
            ))
    return specs


def _win_specs_col(J, col, n=1):
    """Same for sublane-major [BLOCK, 1] windowed inputs."""
    specs = []
    for _ in range(n):
        for j in range(J):
            specs.append(pl.BlockSpec(
                (BLOCK, 1), lambda i, wb, j=j, c=col: (wb[i, c] + j, 0)
            ))
    return specs


def _tile_spec(shape):
    """BlockSpec for a per-tile [rows, TN] block (lane-tiled)."""
    return pl.BlockSpec(shape, lambda i, wb: (0, i))


def _vertical_shift_rows(arr, Lp, up_fill, dn_fill):
    """(arr shifted down by one row with up_fill, shifted up with dn_fill)."""
    up = jnp.concatenate(
        [jnp.full((1, arr.shape[1]), up_fill, jnp.float32), arr[:Lp - 1]],
        axis=0,
    )
    dn = jnp.concatenate(
        [arr[1:Lp], jnp.full((1, arr.shape[1]), dn_fill, jnp.float32)],
        axis=0,
    )
    return up, dn


# --------------------------------------------------------------------------
# K1 bounds: a1 + fused a2+a3 (vlimit=1).  a1 (reference src/reference.cpp:
# 306-319) runs on the window and tile in-kernel; the a2+a3 element-cluster
# reduce collapses to a node-neighbor max over incident edges (see
# stages._cluster_reduce_via_edges for the identity; reference
# src/reference.cpp:321-392).  Per-neighbor level bounds enter as a
# step-matrix contraction: P[z, c] = BIG * (z >= lev_c).
# --------------------------------------------------------------------------


def _gather_bounded(lo_refs, ttf_refs, lidx_ref, lev_ref, C, Lp,
                    chunk=_CHUNK):
    """Gather level-bounded a1 max/min at C neighbor slots -> [2Lp, C].

    a1 runs on the window in-kernel (no masking needed: values beyond a
    neighbor's active depth are excluded by the level-bound penalty
    P[z, c] = BIG where z >= lev_c, built as a step-matrix contraction;
    invalid slots carry lev 0 -> fully masked, and their gather is 0 via
    the sentinel index)."""
    lo_w = _concat(lo_refs)
    tt_w = _concat(ttf_refs)
    slab = jnp.concatenate(
        [jnp.maximum(lo_w, tt_w), jnp.minimum(lo_w, tt_w)], axis=0
    )
    g = _gather_dot(slab, _lcol(lidx_ref), C, chunk=chunk)
    lev = _lcol(lev_ref)  # [C, 1]
    ohL = (_col_iota((C, Lp)) == lev).astype(jnp.float32)  # [C, Lp]
    zstep = (_row_iota((Lp, Lp)) >= _col_iota((Lp, Lp))).astype(jnp.float32)
    P = jax.lax.dot_general(
        zstep * _BIG, ohL, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Lp, C]
    return jnp.concatenate([g[:Lp] - P, g[Lp:] + P], axis=0)


def _bounds_epilogue_vals(acc_max, acc_min, lo_t, tt_t, active, z, nlev,
                          Lp, vlimit):
    """Shared K1 tail: 3-level vertical window over the cluster bounds and
    the final ``fct_ttf_max/min = bounds - fct_LO`` (reference
    src/reference.cpp:353-392; vlimit 2/3 per docs/refactoring.md:113-148).
    Returns (ttmax, ttmin) values so fused callers can consume in-kernel."""
    plain = (z == 0) | (z >= nlev - 2)
    if vlimit == 1:
        # 3-level window over the cluster bounds (src/reference.cpp:353-392)
        up_max, dn_max = _vertical_shift_rows(acc_max, Lp, -_BIG, -_BIG)
        up_min, dn_min = _vertical_shift_rows(acc_min, Lp, _BIG, _BIG)
        wmax = jnp.maximum(jnp.maximum(up_max, acc_max), dn_max)
        wmin = jnp.minimum(jnp.minimum(up_min, acc_min), dn_min)
        sel_max = jnp.where(plain, acc_max, wmax)
        sel_min = jnp.where(plain, acc_min, wmin)
    else:
        # vlimit 2/3: both vertical windows taken over a1's fct_ttf_max
        # (docs/refactoring.md:113-148, faithful to Fortran lines 121/141),
        # combined with the cluster bounds by widening (2) / narrowing (3)
        a1_max = jnp.where(active, jnp.maximum(lo_t, tt_t), 0.0)
        up_m, dn_m = _vertical_shift_rows(a1_max, Lp, -_BIG, -_BIG)
        wmax = jnp.maximum(jnp.maximum(up_m, a1_max), dn_m)
        up_n, dn_n = _vertical_shift_rows(a1_max, Lp, _BIG, _BIG)
        wmin = jnp.minimum(jnp.minimum(up_n, a1_max), dn_n)
        if vlimit == 2:
            cmax = jnp.maximum(acc_max, wmax)
            cmin = jnp.minimum(acc_min, wmin)
        else:
            cmax = jnp.minimum(acc_max, wmax)
            cmin = jnp.maximum(acc_min, wmin)
        sel_max = jnp.where(plain, acc_max, cmax)
        sel_min = jnp.where(plain, acc_min, cmin)
    return (jnp.where(active, sel_max - lo_t, 0.0),
            jnp.where(active, sel_min - lo_t, 0.0))


def _bounds_epilogue(out_ref, acc_max, acc_min, lo_t, tt_t, active, z, nlev,
                     Lp, vlimit):
    tmax, tmin = _bounds_epilogue_vals(acc_max, acc_min, lo_t, tt_t, active,
                                       z, nlev, Lp, vlimit)
    out_ref[:Lp] = tmax
    out_ref[Lp:] = tmin


def _bounds_kernel(wb_ref, lidx_lo_ref, lev_lo_ref, lidx_hi_ref, lev_hi_ref,
                   nlev_ref, lo_t_ref, ttf_t_ref, *refs,
                   Lp, TN, K1, K2, J1, J2, vlimit, chunk):
    o = 0
    LO_lo = refs[o:o + J1]; o += J1
    TT_lo = refs[o:o + J1]; o += J1
    LO_hi = refs[o:o + J2]; o += J2
    TT_hi = refs[o:o + J2]; o += J2
    out_ref = refs[o]

    g1 = _gather_bounded(LO_lo, TT_lo, lidx_lo_ref, lev_lo_ref, K1 * TN, Lp,
                         chunk)
    g2 = _gather_bounded(LO_hi, TT_hi, lidx_hi_ref, lev_hi_ref, K2 * TN, Lp,
                         chunk)

    z = _row_iota((Lp, TN))
    nlev = nlev_ref[:]
    active = z < (nlev - 1)
    lo_t = lo_t_ref[:]
    tt_t = ttf_t_ref[:]
    acc_max = jnp.where(active, jnp.maximum(lo_t, tt_t), -_BIG)
    acc_min = jnp.where(active, jnp.minimum(lo_t, tt_t), _BIG)
    for g, K in ((g1, K1), (g2, K2)):
        for k in range(K):
            sl = slice(k * TN, (k + 1) * TN)
            acc_max = jnp.maximum(acc_max, g[:Lp, sl])
            acc_min = jnp.minimum(acc_min, g[Lp:, sl])

    _bounds_epilogue(out_ref, acc_max, acc_min, lo_t, tt_t, active, z, nlev,
                     Lp, vlimit)


def bounds_pallas(fct_LO_pad, ttf_pad, lidx_lo, lev_lo, lidx_hi, lev_hi,
                  wb2, nlev_nod_row, *, tile, nblocks_lo, nblocks_hi,
                  K_lo, K_hi, vlimit=1, chunk=_CHUNK):
    """fct_LO/ttf [Lp, Np] -> fct_ttf stacked [2Lp, Np] (a1+a2+a3, all
    vlimit variants).  Neighbors are split by side (ids below/above the
    node) so each side's gather uses its own narrow window."""
    Lp, Np = fct_LO_pad.shape
    T, C1, _ = lidx_lo.shape
    TN = tile
    assert C1 == K_lo * TN and lidx_hi.shape[1] == K_hi * TN
    J1, J2 = nblocks_lo, nblocks_hi
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C1, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, C1, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, K_hi * TN, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, K_hi * TN, 1), lambda i, wb: (i, 0, 0)),
            _tile_spec((1, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            *_win_specs(Lp, J1, 0, n=2),
            *_win_specs(Lp, J2, 1, n=2),
        ],
        out_specs=_tile_spec((2 * Lp, TN)),
    )
    kernel = functools.partial(_bounds_kernel, Lp=Lp, TN=TN, K1=K_lo,
                               K2=K_hi, J1=J1, J2=J2, vlimit=vlimit,
                               chunk=chunk)
    return pallas_call(
        kernel,
        name="fct_bounds",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((2 * Lp, Np), jnp.float32),
    )(wb2, lidx_lo, lev_lo, lidx_hi, lev_hi, nlev_nod_row, fct_LO_pad,
      ttf_pad, *([fct_LO_pad] * J1), *([ttf_pad] * J1),
      *([fct_LO_pad] * J2), *([ttf_pad] * J2))


# --------------------------------------------------------------------------
# K1 bounds, DIA form: on a bandwidth-ordered mesh the distinct values of
# ``neighbor_id - node_id`` within a node tile form a SMALL set (8 on the
# structured presets; bounded by ~2x the stencil size after RCM).  The
# neighbor reduction then needs no one-hot contraction at all: for each
# distinct offset d the neighbor values are a dynamic lane-shift of the
# window slab, masked by the per-(node, d) edge level bound — a pure-VPU
# sparse-diagonal (DIA) stencil, ~10x less work than the MXU one-hot form.
# This is the TPU analogue of a banded-matrix kernel; the one-hot form
# remains the fallback for meshes without small offset sets (plan picked in
# step.build_pallas_data via dia_max).
# --------------------------------------------------------------------------


def _dia_bounds_vals(wb_ref, lev_ref, scr, lo_w, tt_w, lo_t, tt_t,
                     nlev, z, i, Lp, TN, D, rems, vlimit):
    """The full K1 DIA computation as VALUES (ttmax, ttmin) — shared by the
    standalone bounds kernel, the DMA-windowed form and the fused K1+K2
    kernel (kernels_packed.limit_fused_pallas).  ``lo_w``/``tt_w`` are the
    window SLAB VALUES [Lp, W]; ``wb_ref`` row layout: col 0 window block,
    cols 1..D shift q.  ``rems``: STATIC per-offset lane residues (the
    plan's offsets are global, so residue = offset mod 128 on every
    128-aligned tile — a static roll measured ~28% faster than the old
    per-tile dynamic roll: Mosaic lowers dynamic lane rolls expensively)."""
    # a1 on the window (reference src/reference.cpp:306-319), staged through
    # VMEM scratch so each offset is a dynamic-lane-offset LOAD of just
    # [2Lp, TN] (cost ~ slice size), not a roll of the whole slab
    W = lo_w.shape[1]
    a1max = jnp.maximum(lo_w, tt_w)
    a1min = jnp.minimum(lo_w, tt_w)
    scr[:Lp, :W] = a1max
    scr[Lp:, :W] = a1min
    # mirror the first TN columns so slices wrap like the mod-W shifts the
    # host computed (shifts may encode negative raw offsets)
    scr[:Lp, W:] = a1max[:, :TN]
    scr[Lp:, W:] = a1min[:, :TN]
    active = z < (nlev - 1)
    acc_max = jnp.where(active, jnp.maximum(lo_t, tt_t), -_BIG)
    acc_min = jnp.where(active, jnp.minimum(lo_t, tt_t), _BIG)
    lev_all = lev_ref[0]  # [D, TN]
    for d in range(D):
        # per-(tile, d) 128-aligned block offset (Mosaic requires lane-dim
        # dynamic loads to be 128-aligned); the lane residue is STATIC,
        # handled by rolling only the narrow [2Lp, TN+BLOCK] segment.
        # Left-shift expressed as a POSITIVE roll: negative shifts
        # miscompile silently on real TPUs (round-3 on-chip parity find)
        q = wb_ref[i, 1 + d]
        seg = scr[:, pl.ds(pl.multiple_of(q * BLOCK, BLOCK), TN + BLOCK)]
        rem = rems[d] % BLOCK
        r = (pltpu.roll(seg, TN + BLOCK - rem, axis=1) if rem else seg)
        r = r[:, :TN]
        # per-(node, d) level bound of the connecting edge; 0 = no neighbor
        # at this offset (also masks out-of-window garbage lanes and the
        # global-plan slots this tile does not use)
        m = z < lev_all[d:d + 1]
        acc_max = jnp.where(m, jnp.maximum(acc_max, r[:Lp]), acc_max)
        acc_min = jnp.where(m, jnp.minimum(acc_min, r[Lp:]), acc_min)
    return _bounds_epilogue_vals(acc_max, acc_min, lo_t, tt_t, active, z,
                                 nlev, Lp, vlimit)


def _bounds_dia_kernel(wb_ref, lev_ref, nlev_ref, lo_t_ref, ttf_t_ref, *refs,
                       Lp, TN, D, rems, J, vlimit):
    LO = refs[:J]
    TT = refs[J:2 * J]
    out_ref = refs[2 * J]
    scr = refs[2 * J + 1]  # [2Lp, W + TN] VMEM scratch
    z = _row_iota((Lp, TN))
    tmax, tmin = _dia_bounds_vals(
        wb_ref, lev_ref, scr, _concat(LO), _concat(TT), lo_t_ref[:],
        ttf_t_ref[:], nlev_ref[:], z, pl.program_id(0), Lp, TN, D, rems,
        vlimit)
    out_ref[:Lp] = tmax
    out_ref[Lp:] = tmin


def bounds_dia_pallas(fct_LO_pad, ttf_pad, dia_wb, dia_lev, nlev_nod_row, *,
                      tile, nblocks, D, rems, vlimit=1):
    """DIA-form K1: fct_LO/ttf [Lp, Np] -> fct_ttf stacked [2Lp, Np].

    ``dia_wb`` [T, 1+D]: col 0 = window first block, cols 1.. = per-offset
    lane shifts (mod window width).  ``dia_lev`` [T, D, tile]: per-(node,
    offset) connecting-edge level bound (0 = absent)."""
    Lp, Np = fct_LO_pad.shape
    T = Np // tile
    J = nblocks
    assert J * BLOCK >= tile, "DIA window narrower than the tile"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, tile), lambda i, wb: (i, 0, 0)),
            _tile_spec((1, tile)),
            _tile_spec((Lp, tile)),
            _tile_spec((Lp, tile)),
            *_win_specs(Lp, J, 0, n=2),
        ],
        out_specs=_tile_spec((2 * Lp, tile)),
        scratch_shapes=[
            pltpu.VMEM((2 * Lp, J * BLOCK + tile), jnp.float32),
        ],
    )
    kernel = functools.partial(_bounds_dia_kernel, Lp=Lp, TN=tile, D=D,
                               rems=rems, J=J, vlimit=vlimit)
    return pallas_call(
        kernel,
        name="fct_bounds_dia",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((2 * Lp, Np), jnp.float32),
    )(dia_wb, dia_lev, nlev_nod_row, fct_LO_pad, ttf_pad,
      *([fct_LO_pad] * J), *([ttf_pad] * J))


def _bounds_dia_dma_kernel(wb_ref, lev_ref, nlev_ref, lo_t_ref, ttf_t_ref,
                           lo_hbm, tt_hbm, out_ref, win, scr, sems, *,
                           Lp, TN, D, rems, J, vlimit, Tb):
    W = J * BLOCK
    i = pl.program_id(0)
    t = pl.program_id(1) if Tb > 1 else 0
    T = pl.num_programs(0)
    n = i * Tb + t  # linear (tile, tracer) step

    def dma(slot, i_idx, t_idx):
        c0 = pl.multiple_of(wb_ref[i_idx, 0] * BLOCK, BLOCK)
        r0 = t_idx * Lp
        return [
            pltpu.make_async_copy(lo_hbm.at[pl.ds(r0, Lp), pl.ds(c0, W)],
                                  win.at[slot, :Lp], sems.at[slot, 0]),
            pltpu.make_async_copy(tt_hbm.at[pl.ds(r0, Lp), pl.ds(c0, W)],
                                  win.at[slot, Lp:], sems.at[slot, 1]),
        ]

    @pl.when(n == 0)
    def _():
        for d in dma(0, 0, 0):
            d.start()

    @pl.when(n + 1 < T * Tb)
    def _():
        n1 = n + 1
        for d in dma((n1) % 2, n1 // Tb, n1 % Tb):
            d.start()

    for d in dma(n % 2, i, t):
        d.wait()

    w = win[n % 2]
    z = _row_iota((Lp, TN))
    tmax, tmin = _dia_bounds_vals(
        wb_ref, lev_ref, scr, w[:Lp], w[Lp:], lo_t_ref[:], ttf_t_ref[:],
        nlev_ref[:], z, i, Lp, TN, D, rems, vlimit)
    out_ref[:Lp] = tmax
    out_ref[Lp:] = tmin


def bounds_dia_dma_pallas(fct_LO_pad, ttf_pad, dia_wb, dia_lev,
                          nlev_nod_row, *, tile, nblocks, D, rems, vlimit=1,
                          Tb=1):
    """DIA-form K1 with MANUALLY double-buffered window DMA.

    The BlockSpec pipeline moves each tile's window as J separate
    128-lane block transfers (28 descriptors/tile at tile=1024), which
    measured latency-bound at ~136 GB/s on the real chip; one wide
    [Lp, W] async copy per array per tile with a 2-slot double buffer
    reaches ~235 GB/s on the same pattern.  Sources stay in HBM
    (pl.ANY) and the kernel owns the prefetch (guide: Async DMA /
    Double Buffering).

    ``Tb`` > 1: MULTI-TRACER batch.  Per-tracer fields are stacked along
    rows ([Tb*Lp, Np]); the grid becomes (tiles, tracers) with tracer
    minor, so the per-tile int maps (dia_lev, wb, nlev) keep the same
    block index across tracer steps and the pipeline re-uses them in
    VMEM — the connectivity traffic and per-pass overheads amortize
    across the batch (reference: one full call per tracer,
    include/fesom2-accelerate.h:213-236)."""
    Lp_all, Np = fct_LO_pad.shape
    Lp = Lp_all // Tb
    T = Np // tile
    J = nblocks
    W = J * BLOCK
    assert W >= tile, "DIA window narrower than the tile"
    assert W <= Np, "window wider than the padded source"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, Tb),
        in_specs=[
            pl.BlockSpec((1, D, tile), lambda i, t, wb: (i, 0, 0)),
            pl.BlockSpec((1, tile), lambda i, t, wb: (0, i)),
            pl.BlockSpec((Lp, tile), lambda i, t, wb: (t, i)),
            pl.BlockSpec((Lp, tile), lambda i, t, wb: (t, i)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2 * Lp, tile), lambda i, t, wb: (t, i)),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * Lp, W), jnp.float32),
            pltpu.VMEM((2 * Lp, W + tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_bounds_dia_dma_kernel, Lp=Lp, TN=tile, D=D,
                               rems=rems, J=J, vlimit=vlimit, Tb=Tb)
    return pallas_call(
        kernel,
        name="fct_bounds_dia_dma",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Tb * 2 * Lp, Np), jnp.float32),
    )(dia_wb, dia_lev, nlev_nod_row, fct_LO_pad, ttf_pad, fct_LO_pad,
      ttf_pad)


# --------------------------------------------------------------------------
# K2 limit: b1-vertical (kernels/fct_ale_b1_vertical.cu) + b1-horizontal
# scatter (kernels/fct_ale_b1_horizontal.cu:24-27, the atomicAdd hot spot)
# + b2 Zalesak factors (kernels/fct_ale_b2.cu:10-11) + b3-vertical
# (kernels/fct_ale_b3_vertical.cu), fused per node tile.
# b3-vertical belongs here, NOT after the halo exchange: it is node-local
# and owned-node limiter factors are already final pre-exchange — the same
# reason the reference overlaps it with the MPI wait in its inter_comm
# phase (src/fesom2-accelerate.cu:342-356).  Fusing it into K2 goes one
# step further: its pm/adf_v inputs never round-trip HBM at all.
# The scatter runs as TWO window groups: edges starting in the tile
# (contiguous, narrow) and edges ending in it (bandwidth-wide).
# --------------------------------------------------------------------------


def _limit_kernel(wb_ref, av_ref, tt_ref, ainv_ref, nlev_ref, *refs,
                  Lp, Lpv, L, TN, J1, J2, dt, eps, iter_yn, chunk):
    o = 0
    adf_lo = _concat(refs[o:o + J1]); o += J1
    adf_hi = _concat(refs[o:o + J2]); o += J2
    s_ids = _concat_col(refs[o:o + J1]); o += J1
    e_ids = _concat_col(refs[o:o + J2]); o += J2
    nw_lo = _concat(refs[o:o + J1]); o += J1
    nw_hi = _concat(refs[o:o + J2]); o += J2
    out_ref, av_out_ref, av2_ref = refs[o:o + 3]

    # b1 vertical: flux splitting from the interface-flux tile
    av = av_ref[:]
    up = av[:Lp]
    if Lpv >= Lp + 1:
        dn = av[1:Lp + 1]
    else:
        dn = jnp.concatenate(
            [av[1:Lpv], jnp.zeros((Lp + 1 - Lpv, TN), jnp.float32)], axis=0
        )
    plus = jnp.maximum(0.0, up) + jnp.maximum(0.0, -dn)
    minus = jnp.minimum(0.0, up) + jnp.minimum(0.0, -dn)

    # b1 horizontal: edge->node scatter, one group per endpoint role
    t0 = pl.program_id(0) * TN
    G_lo = _scatter_dot(adf_lo, s_ids, nw_lo, t0, TN, Lp, split_pm=True,
                        chunk=chunk)
    G_hi = _scatter_dot(adf_hi, e_ids, nw_hi, t0, TN, Lp, split_pm=True,
                        chunk=chunk)
    plus = plus + G_lo[:Lp] + G_hi[Lp:]
    minus = minus - G_lo[Lp:] - G_hi[:Lp]

    # b2: Zalesak limiting factors
    z = _row_iota((Lp, TN))
    nlev = nlev_ref[:]
    active = z < (nlev - 1)
    tt = tt_ref[:]
    ainv = ainv_ref[:]
    fplus = plus * dt * ainv + eps
    fminus = minus * dt * ainv - eps
    fp = jnp.where(active, jnp.minimum(1.0, tt[:Lp] / fplus), 0.0)
    fm = jnp.where(active, jnp.minimum(1.0, tt[Lp:] / fminus), 0.0)
    out_ref[:Lp] = fp
    out_ref[Lp:] = fm

    # b3 vertical on the tile (limiter factors at z and z-1 of the SAME
    # node — no exchanged halo values enter, reference kernels/
    # fct_ale_b3_vertical.cu:17-45)
    fp_m1, _ = _vertical_shift_rows(fp, Lp, 1.0, 0.0)
    fm_m1, _ = _vertical_shift_rows(fm, Lp, 1.0, 0.0)
    flux = up
    ae_pos = jnp.minimum(1.0, jnp.minimum(fm_m1, fp))
    ae_neg = jnp.minimum(1.0, jnp.minimum(fp_m1, fm))
    ae = jnp.where(flux >= 0.0, ae_pos, ae_neg)
    vact = (z < nlev) & (z < L)
    av_lim = jnp.where(vact, ae * flux, flux)
    if Lpv > Lp:
        av_out = jnp.concatenate([av_lim, av[Lp:]], axis=0)
    else:
        av_out = av_lim
    av_out_ref[:] = av_out
    resid = jnp.where(vact & (z >= 1), (1.0 - ae) * flux, 0.0)
    if Lpv > Lp:
        resid = jnp.concatenate(
            [resid, jnp.zeros((Lpv - Lp, TN), jnp.float32)], axis=0
        )
    av2_ref[:] = resid if iter_yn else jnp.zeros_like(resid)


def limit_pallas(adf_v_pad, tt_stacked, area_inv_pad, adf_h_pad, starts_col,
                 ends_col, nlev_edge_row, wb2, nlev_nod_row, *, tile,
                 nblocks_lo, nblocks_hi, L, dt, flux_eps, iter_yn=False,
                 chunk=_SCATTER_CHUNK):
    """-> (limiter factors stacked [2Lp, Np], limited adf_v [Lpv, Np],
    adf_v residual [Lpv, Np]): b1v + b1h + b2 + b3v fused."""
    Lp2, Np = tt_stacked.shape
    Lp = Lp2 // 2
    Lpv = adf_v_pad.shape[0]
    TN = tile
    T = Np // TN
    J1, J2 = nblocks_lo, nblocks_hi
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            _tile_spec((Lpv, TN)),
            _tile_spec((Lp2, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((1, TN)),
            *_win_specs(Lp, J1, 0),
            *_win_specs(Lp, J2, 1),
            *_win_specs_col(J1, 0),
            *_win_specs_col(J2, 1),
            *_win_specs(1, J1, 0),
            *_win_specs(1, J2, 1),
        ],
        out_specs=(
            _tile_spec((Lp2, TN)),
            _tile_spec((Lpv, TN)),
            _tile_spec((Lpv, TN)),
        ),
    )
    kernel = functools.partial(_limit_kernel, Lp=Lp, Lpv=Lpv, L=L, TN=TN,
                               J1=J1, J2=J2, dt=dt, eps=flux_eps,
                               iter_yn=iter_yn, chunk=chunk)
    return pallas_call(
        kernel,
        name="fct_limit",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((Lp2, Np), jnp.float32),
            jax.ShapeDtypeStruct((Lpv, Np), jnp.float32),
            jax.ShapeDtypeStruct((Lpv, Np), jnp.float32),
        ),
    )(wb2, adf_v_pad, tt_stacked, area_inv_pad, nlev_nod_row,
      *([adf_h_pad] * J1), *([adf_h_pad] * J2),
      *([starts_col] * J1), *([ends_col] * J2),
      *([nlev_edge_row] * J1), *([nlev_edge_row] * J2))


# --------------------------------------------------------------------------
# K3 b3-horizontal: limit edge fluxes by gathered endpoint factors
# (reference kernels/fct_ale_b3_horizontal.cu:28-39) — one narrow gather for
# the n0 endpoints (edges sorted by n0) + one bandwidth-wide for n1.
# --------------------------------------------------------------------------


def _b3h_compute(lidx_lo_ref, lidx_hi_ref, nlev_ref, adf_ref, pm_lo_refs,
                 pm_hi_refs, out_ref, resid_ref, Lp, TE, chunk):
    pm_lo = _concat(pm_lo_refs)
    pm_hi = _concat(pm_hi_refs)
    g1 = _gather_dot(pm_lo, _lcol(lidx_lo_ref), TE, chunk=chunk)  # (p1; m1)
    g2 = _gather_dot(pm_hi, _lcol(lidx_hi_ref), TE, chunk=chunk)
    p1, m1 = g1[:Lp], g1[Lp:]
    p2, m2 = g2[:Lp], g2[Lp:]
    F = adf_ref[:]
    ae_pos = jnp.minimum(1.0, jnp.minimum(p1, m2))
    ae_neg = jnp.minimum(1.0, jnp.minimum(m1, p2))
    ae = jnp.where(F >= 0.0, ae_pos, ae_neg)
    emask = _row_iota((Lp, TE)) < nlev_ref[:]
    out_ref[:] = jnp.where(emask, ae * F, F)
    resid_ref[:] = jnp.where(emask, (1.0 - ae) * F, 0.0)


def _b3h_kernel(wb_ref, lidx_lo_ref, lidx_hi_ref, nlev_ref, adf_ref, *refs,
                Lp, TE, J1, J2, chunk):
    _b3h_compute(lidx_lo_ref, lidx_hi_ref, nlev_ref, adf_ref, refs[:J1],
                 refs[J1:J1 + J2], refs[J1 + J2], refs[J1 + J2 + 1], Lp, TE,
                 chunk)


def b3h_pallas(pm_stacked, adf_h_pad, lidx_lo, lidx_hi, wb2, nlev_edge_row,
               *, tile, nblocks_lo, nblocks_hi, chunk=_CHUNK):
    """Returns (limited adf_h [Lp, Edp], residual (1-ae)*f [Lp, Edp])."""
    Lp2, Np = pm_stacked.shape
    Lp = Lp2 // 2
    TE = tile
    T, C, _ = lidx_lo.shape
    assert C == TE
    Edp = T * TE
    J1, J2 = nblocks_lo, nblocks_hi
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            _tile_spec((1, TE)),
            _tile_spec((Lp, TE)),
            *_win_specs(Lp2, J1, 0),
            *_win_specs(Lp2, J2, 1),
        ],
        out_specs=(
            _tile_spec((Lp, TE)),
            _tile_spec((Lp, TE)),
        ),
    )
    kernel = functools.partial(_b3h_kernel, Lp=Lp, TE=TE, J1=J1, J2=J2,
                               chunk=chunk)
    return pallas_call(
        kernel,
        name="fct_b3h",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Edp), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Edp), jnp.float32),
        ),
    )(wb2, lidx_lo, lidx_hi, nlev_edge_row, adf_h_pad,
      *([pm_stacked] * J1), *([pm_stacked] * J2))


def _b3h_fix_kernel(wb_ref, ids_ref, lidx_lo_ref, lidx_hi_ref, nlev_ref,
                    adf_ref, *refs, Lp, TE, J1, J2, chunk):
    del ids_ref  # selection happens in the index maps
    # trailing refs: J1+J2 pm windows, 2 aliased previous outputs (unread),
    # 2 outputs
    _b3h_compute(lidx_lo_ref, lidx_hi_ref, nlev_ref, adf_ref, refs[:J1],
                 refs[J1:J1 + J2], refs[J1 + J2 + 2], refs[J1 + J2 + 3],
                 Lp, TE, chunk)


def b3h_fixup_pallas(pm_stacked, adf_h_pad, out_prev, resid_prev, lidx_lo,
                     lidx_hi, wb2, tile_ids, nlev_edge_row, *, tile,
                     nblocks_lo, nblocks_hi, chunk=_CHUNK):
    """Recompute b3h on the BOUNDARY edge tiles only, in place.

    ``tile_ids`` [F] selects which edge tiles to redo with the EXCHANGED
    limiter factors; all other tiles keep their interior results (the
    outputs alias ``out_prev``/``resid_prev``).  This is the TPU analogue
    of the reference's post_comm phase touching only halo-dependent work
    (src/fesom2-accelerate.cu:358-379): b3h for interior edges ran on
    pre-exchange factors, concurrently with the collective."""
    Lp2, Np = pm_stacked.shape
    Lp = Lp2 // 2
    TE = tile
    T, C, _ = lidx_lo.shape
    assert C == TE
    F = tile_ids.shape[0]
    J1, J2 = nblocks_lo, nblocks_hi

    def _win_ids(rows, J, col):
        return [pl.BlockSpec(
            (rows, BLOCK), lambda i, wb, ids, j=j, c=col: (0, wb[ids[i], c] + j)
        ) for j in range(J)]

    def _tile_ids(shape):
        return pl.BlockSpec(shape, lambda i, wb, ids: (0, ids[i]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i, wb, ids: (ids[i], 0, 0)),
            pl.BlockSpec((1, C, 1), lambda i, wb, ids: (ids[i], 0, 0)),
            _tile_ids((1, TE)),
            _tile_ids((Lp, TE)),
            *_win_ids(Lp2, J1, 0),
            *_win_ids(Lp2, J2, 1),
            _tile_ids((Lp, TE)),
            _tile_ids((Lp, TE)),
        ],
        out_specs=(
            _tile_ids((Lp, TE)),
            _tile_ids((Lp, TE)),
        ),
    )
    kernel = functools.partial(_b3h_fix_kernel, Lp=Lp, TE=TE, J1=J1, J2=J2,
                               chunk=chunk)
    n_in = 2 + 4 + J1 + J2  # scalar prefetch + fixed + windows
    return pallas_call(
        kernel,
        name="fct_b3h_fixup",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct(out_prev.shape, jnp.float32),
            jax.ShapeDtypeStruct(resid_prev.shape, jnp.float32),
        ),
        input_output_aliases={n_in: 0, n_in + 1: 1},
    )(wb2, tile_ids, lidx_lo, lidx_hi, nlev_edge_row, adf_h_pad,
      *([pm_stacked] * J1), *([pm_stacked] * J2), out_prev, resid_prev)


# --------------------------------------------------------------------------
# K4 update: the c-horizontal signed edge sum (kernels/
# fct_ale_c_horizontal.cu:25-26) + the stage-c solution / iterative-LO
# update (docs/refactoring.md:265-314), fused per node tile.  b3-vertical
# lives in K2 (it needs no exchanged data); K4 consumes its limited
# vertical flux.  Outputs: (o1, o2) = (del_ttf_advvert, del_ttf_advhoriz)
# non-iterative or (new fct_LO, zeros) iterative.
# --------------------------------------------------------------------------


def _update_kernel(wb_ref, avl_ref, ttf_ref, hn_ref, hnn_ref,
                   lo_ref, dvin_ref, dhin_ref, ainv_ref, nlev_ref, *refs,
                   Lp, Lpv, L, TN, J1, J2, dt, iter_yn, chunk):
    o = 0
    adf_lo = _concat(refs[o:o + J1]); o += J1
    adf_hi = _concat(refs[o:o + J2]); o += J2
    s_ids = _concat_col(refs[o:o + J1]); o += J1
    e_ids = _concat_col(refs[o:o + J2]); o += J2
    nw_lo = _concat(refs[o:o + J1]); o += J1
    nw_hi = _concat(refs[o:o + J2]); o += J2
    o1_ref, o2_ref = refs[o:o + 2]

    # c horizontal: signed incident-edge flux sum (+ at n0, - at n1)
    t0 = pl.program_id(0) * TN
    acc = _scatter_dot(adf_lo, s_ids, nw_lo, t0, TN, Lp, split_pm=False,
                       chunk=chunk)
    acc = acc - _scatter_dot(adf_hi, e_ids, nw_hi, t0, TN, Lp,
                             split_pm=False, chunk=chunk)

    # vertical divergence of the limited flux (from K2's b3v)
    av_out = avl_ref[:]
    av_lim = av_out[:Lp]
    if Lpv >= Lp + 1:
        dn_lim = av_out[1:Lp + 1]
    else:
        dn_lim = jnp.concatenate(
            [av_out[1:Lpv], jnp.zeros((Lp + 1 - Lpv, TN), jnp.float32)],
            axis=0,
        )
    ainv = ainv_ref[:]
    ddiv = (av_lim - dn_lim) * dt * ainv
    dh = acc * dt * ainv
    z = _row_iota((Lp, TN))
    nlev = nlev_ref[:]
    active = z < (nlev - 1)
    lo = lo_ref[:]
    if iter_yn:
        # iterative FCT: update the low-order solution, swap in residuals
        hnn = hnn_ref[:]
        new_lo = jnp.where(active, lo + ddiv / hnn, lo) + dh / hnn
        o1_ref[:] = new_lo
        o2_ref[:] = jnp.zeros((Lp, TN), jnp.float32)
    else:
        dv = -ttf_ref[:] * hn_ref[:] + lo * hnn_ref[:] + ddiv
        o1_ref[:] = jnp.where(active, dvin_ref[:] + dv, dvin_ref[:])
        o2_ref[:] = dhin_ref[:] + dh


def update_pallas(adf_v_lim_pad, ttf_pad, hnode_pad, hnode_new_pad,
                  fct_LO_pad, del_v_pad, del_h_pad, area_inv_pad,
                  adf_h_lim_pad, starts_col, ends_col, nlev_edge_row, wb2,
                  nlev_nod_row, *, tile, nblocks_lo, nblocks_hi, L, dt,
                  iter_yn, chunk=_SCATTER_CHUNK):
    """Stage c fused -> (o1, o2); see kernel."""
    Lpv, Np = adf_v_lim_pad.shape
    Lp = area_inv_pad.shape[0]
    TN = tile
    T = Np // TN
    J1, J2 = nblocks_lo, nblocks_hi
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            _tile_spec((Lpv, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
            _tile_spec((1, TN)),
            *_win_specs(Lp, J1, 0),
            *_win_specs(Lp, J2, 1),
            *_win_specs_col(J1, 0),
            *_win_specs_col(J2, 1),
            *_win_specs(1, J1, 0),
            *_win_specs(1, J2, 1),
        ],
        out_specs=(
            _tile_spec((Lp, TN)),
            _tile_spec((Lp, TN)),
        ),
    )
    kernel = functools.partial(_update_kernel, Lp=Lp, Lpv=Lpv, L=L, TN=TN,
                               J1=J1, J2=J2, dt=dt, iter_yn=iter_yn,
                               chunk=chunk)
    return pallas_call(
        kernel,
        name="fct_update",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Np), jnp.float32),
        ),
    )(wb2, adf_v_lim_pad, ttf_pad, hnode_pad, hnode_new_pad,
      fct_LO_pad, del_v_pad, del_h_pad, area_inv_pad, nlev_nod_row,
      *([adf_h_lim_pad] * J1), *([adf_h_lim_pad] * J2),
      *([starts_col] * J1), *([ends_col] * J2),
      *([nlev_edge_row] * J1), *([nlev_edge_row] * J2))


# --------------------------------------------------------------------------
# a2: element bounds — gather fct_ttf_max/min at 3 nodes, max/min, pad with
# +-bignumber (reference src/reference.cpp:321-351, kernels/fct_ale_a2.cu).
# Used by the vlimit=2/3 path and the tuning harness.
# --------------------------------------------------------------------------


def _a2_kernel(wb_ref, lidx_ref, nlev_ref, *refs, Lp, TE, J, big):
    src_refs, out_ref = refs[:J], refs[J]
    g = _gather_dot(_concat(src_refs), _lcol(lidx_ref), 3 * TE)
    gmax, gmin = g[:Lp], g[Lp:]
    m3 = jnp.maximum(jnp.maximum(gmax[:, :TE], gmax[:, TE:2 * TE]),
                     gmax[:, 2 * TE:])
    n3 = jnp.minimum(jnp.minimum(gmin[:, :TE], gmin[:, TE:2 * TE]),
                     gmin[:, 2 * TE:])
    mask = _row_iota((Lp, TE)) < (nlev_ref[:] - 1)
    out_ref[:Lp] = jnp.where(mask, m3, -big)
    out_ref[Lp:] = jnp.where(mask, n3, big)


def a2_pallas(src_stacked, lidx, wb2, nlev_elem_row, *, tile, nblocks,
              bignumber):
    """src_stacked [2Lp, Np] (tmax; tmin) -> UV stacked [2Lp, Ep]."""
    Lp2, Np = src_stacked.shape
    Lp = Lp2 // 2
    T, C, _ = lidx.shape
    TE = tile
    assert C == 3 * TE
    Ep = T * TE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            _tile_spec((1, TE)),
            *_win_specs(Lp2, nblocks, 0),
        ],
        out_specs=_tile_spec((Lp2, TE)),
    )
    kernel = functools.partial(_a2_kernel, Lp=Lp, TE=TE, J=nblocks,
                               big=bignumber)
    return pallas_call(
        kernel,
        name="fct_a2",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp2, Ep), jnp.float32),
    )(wb2, lidx, nlev_elem_row, *([src_stacked] * nblocks))


# --------------------------------------------------------------------------
# stress2rhs: sea-ice EVP stress divergence (reference src/reference.cpp:
# 440-480 — CPU-only there; here the element->node scatter of the three
# per-corner contributions is a windowed one-hot contraction).  The workload
# is 2-D (no vertical levels): element quantities arrive packed as rows of
# one [16, Ep] slab, contributions are computed in-kernel per corner slot,
# and U/V accumulate as a 2-row contraction.
# Packed row layout: 0 s11, 1 s12, 2 s22, 3 area*ice_active, 4 mf/3,
# 5..10 gradient_sca rows 0..5.
# --------------------------------------------------------------------------


def _s2r_kernel(wb_ref, iam_ref, ra_ref, rm_ref, *refs, TN, J):
    o = 0
    el_refs = refs[o:o + J]; o += J
    id_refs = [refs[o + k * J:o + (k + 1) * J] for k in range(3)]
    o += 3 * J
    out_ref = refs[o]
    el = _concat(el_refs)  # [16, W]
    W = el.shape[1]
    s11, s12, s22 = el[0:1], el[1:2], el[2:3]
    ea, mf3 = el[3:4], el[4:5]
    t0 = pl.program_id(0) * TN
    chunk = min(W, 512)
    acc = jnp.zeros((2, TN), jnp.float32)
    for k in range(3):
        ids = _concat_col(id_refs[k])
        g_k = el[5 + k:6 + k]
        g_k3 = el[8 + k:9 + k]
        u_c = -ea * (s11 * g_k + s12 * g_k3 + s12 * mf3)
        v_c = -ea * (s12 * g_k + s22 * g_k3 - s11 * mf3)
        uv = jnp.concatenate([u_c, v_c], axis=0)  # [2, W]
        for c0 in range(0, W, chunk):
            cw = min(chunk, W - c0)
            cols = _col_iota((cw, TN)) + t0
            A = (ids[c0:c0 + cw, :] == cols).astype(jnp.float32)
            for part in _split3(uv[:, c0:c0 + cw]):
                acc = acc + jnp.dot(part, A,
                                    preferred_element_type=jnp.float32)
    iam = iam_ref[:]
    has_mass = iam > 0.0
    out_ref[0:1] = jnp.where(has_mass, acc[0:1] * iam + ra_ref[:], 0.0)
    out_ref[1:2] = jnp.where(has_mass, acc[1:2] * iam + rm_ref[:], 0.0)
    out_ref[2:] = jnp.zeros((6, TN), jnp.float32)


def stress2rhs_pallas(elem_packed, ids0, ids1, ids2, inv_areamass_row,
                      rhs_a_row, rhs_m_row, wb2, *, tile, nblocks):
    """elem_packed [16, Ep] (see row layout above) -> [8, Np] with
    U = row 0, V = row 1."""
    _, Ep = elem_packed.shape
    TN = tile
    Np = inv_areamass_row.shape[1]
    T = Np // TN
    J = nblocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            _tile_spec((1, TN)),
            _tile_spec((1, TN)),
            _tile_spec((1, TN)),
            *_win_specs(16, J, 0),
            *_win_specs_col(J, 0, n=3),
        ],
        out_specs=_tile_spec((8, TN)),
    )
    kernel = functools.partial(_s2r_kernel, TN=TN, J=J)
    return pallas_call(
        kernel,
        name="stress2rhs",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
    )(wb2, inv_areamass_row, rhs_a_row, rhs_m_row,
      *([elem_packed] * J), *([ids0] * J), *([ids1] * J), *([ids2] * J))

"""Pallas TPU kernels for the gather/scatter-heavy FCT-ALE stages.

Every irregular mesh access is a **one-hot contraction on the MXU** against a
VMEM-resident window of the source array (see plan.py for the windowing).
Gathers select columns of a level-major slab; scatters use the transposed
one-hot so the edge->node accumulation (the reference's atomicAdd hot spot,
kernels/fct_ale_b1_horizontal.cu:24-27) is a deterministic matmul sum.

Windowing: each tile reads J consecutive 128-wide blocks of the source
(plan.py), sized to the tile's actual index span.  The contraction cost is
linear in window width, so the fine block granularity directly cuts MXU
work vs. a power-of-two window.  Window blocks arrive as J block-pipelined
inputs per source array, are concatenated to one VMEM slab, and contractions
run chunked to bound the one-hot's VMEM footprint.

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


def _gather_segments(slab, neutral=None):
    """Split a window slab [R, W] into chunk segments with base offsets.

    Returns a list of (segment, base).  neutral=(top, bottom, Lp) appends a
    BLOCK-wide column block at base W holding the reduction-neutral values
    (rows < Lp: top; else bottom) selected by the sentinel index."""
    W = slab.shape[1]
    chunk = min(W, _CHUNK)
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


def _gather_dot(slab, lidx_col, C, neutral=None):
    """Gather columns from a window slab: one one-hot per chunk (built once,
    in bf16), three exact bf16 contractions per chunk -> [R, C]."""
    acc = None
    for seg, base in _gather_segments(slab, neutral):
        ch = seg.shape[1]
        ohT = ((_col_iota((C, ch)) + base) == lidx_col).astype(jnp.float32)
        for part in _split3(seg):
            g = jax.lax.dot_general(
                part, ohT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = g if acc is None else acc + g
    return acc


def _win_specs(rows, J, n=1):
    """n*J BlockSpecs for J-block windowed [rows, BLOCK] inputs.

    The scalar-prefetch array wb is [T]: the first window block per tile."""
    specs = []
    for _ in range(n):
        for j in range(J):
            specs.append(pl.BlockSpec(
                (rows, BLOCK), lambda i, wb, j=j: (0, wb[i] + j)
            ))
    return specs


def _win_specs_col(J, n=1):
    """Same for sublane-major [BLOCK, 1] windowed inputs."""
    specs = []
    for _ in range(n):
        for j in range(J):
            specs.append(pl.BlockSpec(
                (BLOCK, 1), lambda i, wb, j=j: (wb[i] + j, 0)
            ))
    return specs


# --------------------------------------------------------------------------
# a2: element bounds — gather fct_ttf_max/min at 3 nodes, max/min, pad with
# +-bignumber (reference src/reference.cpp:321-351, kernels/fct_ale_a2.cu)
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


def a2_pallas(src_stacked, lidx, wb, nlev_elem_row, *, tile, nblocks,
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
            pl.BlockSpec((1, TE), lambda i, wb: (0, i)),
            *_win_specs(Lp2, nblocks),
        ],
        out_specs=pl.BlockSpec((Lp2, TE), lambda i, wb: (0, i)),
    )
    kernel = functools.partial(_a2_kernel, Lp=Lp, TE=TE, J=nblocks,
                               big=bignumber)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp2, Ep), jnp.float32),
    )(wb, lidx, nlev_elem_row, *([src_stacked] * nblocks))


# --------------------------------------------------------------------------
# a3 (vlimit=1): cluster reduce over surrounding elements + 3-level vertical
# window - fct_LO (reference src/reference.cpp:353-392, kernels/fct_ale_a3.cu)
# --------------------------------------------------------------------------


def _a3_kernel(wb_ref, lidx_ref, nlev_ref, lo_ref, *refs, Lp, TN, K, J):
    src_refs, out_ref = refs[:J], refs[J]
    # ONE contraction per window piece covering all K neighbor slots at once
    # (C = K*TN columns, k-major), then a static slice-reduce over k — keeps
    # the dot count low regardless of node degree and feeds the MXU large
    # contractions.  The sentinel gathers the neutral block: -BIG for the
    # max half, +BIG for the min half.
    g = _gather_dot(_concat(src_refs), _lcol(lidx_ref), K * TN,
                    neutral=(-_BIG, _BIG, Lp))
    acc_max = jnp.full((Lp, TN), -_BIG, jnp.float32)
    acc_min = jnp.full((Lp, TN), _BIG, jnp.float32)
    for k in range(K):
        sl = slice(k * TN, (k + 1) * TN)
        acc_max = jnp.maximum(acc_max, g[:Lp, sl])
        acc_min = jnp.minimum(acc_min, g[Lp:, sl])

    negrow = jnp.full((1, TN), -_BIG, jnp.float32)
    posrow = jnp.full((1, TN), _BIG, jnp.float32)
    up_max = jnp.concatenate([negrow, acc_max[:-1]], axis=0)
    dn_max = jnp.concatenate([acc_max[1:], negrow], axis=0)
    up_min = jnp.concatenate([posrow, acc_min[:-1]], axis=0)
    dn_min = jnp.concatenate([acc_min[1:], posrow], axis=0)
    wmax = jnp.maximum(jnp.maximum(up_max, acc_max), dn_max)
    wmin = jnp.minimum(jnp.minimum(up_min, acc_min), dn_min)

    z = _row_iota((Lp, TN))
    nlev = nlev_ref[:]
    plain = (z == 0) | (z >= nlev - 2)
    sel_max = jnp.where(plain, acc_max, wmax)
    sel_min = jnp.where(plain, acc_min, wmin)
    active = z < (nlev - 1)
    lo = lo_ref[:]
    out_ref[:Lp] = jnp.where(active, sel_max - lo, 0.0)
    out_ref[Lp:] = jnp.where(active, sel_min - lo, 0.0)


def a3_pallas(uv_stacked, lidx, wb, nlev_nod_row, fct_LO_pad, *,
              tile, nblocks, K):
    """uv_stacked [2Lp, Ep] -> fct_ttf stacked [2Lp, Np] (vlimit=1)."""
    Lp2, Ep = uv_stacked.shape
    Lp = Lp2 // 2
    T, C, _ = lidx.shape
    TN = tile
    assert C == K * TN
    Np = T * TN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, TN), lambda i, wb: (0, i)),
            pl.BlockSpec((Lp, TN), lambda i, wb: (0, i)),
            *_win_specs(Lp2, nblocks),
        ],
        out_specs=pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)),
    )
    kernel = functools.partial(_a3_kernel, Lp=Lp, TN=TN, K=K, J=nblocks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp2, Np), jnp.float32),
    )(wb, lidx, nlev_nod_row, fct_LO_pad, *([uv_stacked] * nblocks))


# --------------------------------------------------------------------------
# b1 horizontal: edge->node scatter of split fluxes as transposed one-hot
# contraction (reference kernels/fct_ale_b1_horizontal.cu:24-27, atomicAdd)
# --------------------------------------------------------------------------


def _b1h_kernel(wb_ref, pm_ref, *refs, Lp, TN, J):
    adf_refs = refs[:J]
    s_refs = refs[J:2 * J]
    e_refs = refs[2 * J:3 * J]
    nw_refs = refs[3 * J:4 * J]
    out_ref = refs[4 * J]
    adf = _concat(adf_refs)
    s_ids = _concat_col(s_refs)
    e_ids = _concat_col(e_refs)
    nw = _concat(nw_refs)
    W = adf.shape[1]
    # chunked pipeline (mask -> P/Q -> split3 -> contract) so only
    # chunk-sized intermediates are live
    chunk = min(W, 512)
    t0 = pl.program_id(0) * TN
    G_s = jnp.zeros((2 * Lp, TN), jnp.float32)
    G_e = jnp.zeros((2 * Lp, TN), jnp.float32)
    for c0 in range(0, W, chunk):
        cw = min(chunk, W - c0)
        cols = _col_iota((cw, TN)) + t0
        sl = slice(c0, c0 + cw)
        emask = _row_iota((Lp, cw)) < nw[:, sl]
        F = jnp.where(emask, adf[:, sl], 0.0)
        PQ = jnp.concatenate(
            [jnp.maximum(F, 0.0), jnp.maximum(-F, 0.0)], axis=0
        )
        A_s = (s_ids[sl, :] == cols).astype(jnp.float32)
        A_e = (e_ids[sl, :] == cols).astype(jnp.float32)
        for part in _split3(PQ):
            G_s = G_s + jnp.dot(part, A_s,
                                preferred_element_type=jnp.float32)
            G_e = G_e + jnp.dot(part, A_e,
                                preferred_element_type=jnp.float32)
    out_ref[:Lp] = pm_ref[:Lp] + G_s[:Lp] + G_e[Lp:]
    out_ref[Lp:] = pm_ref[Lp:] - G_s[Lp:] - G_e[:Lp]


def b1h_pallas(pm_stacked, adf_h_pad, starts_col, ends_col, nlev_edge_row,
               wb, *, tile, nblocks):
    """pm_stacked [2Lp, Np] (+= edge contributions) via edge windows.

    starts_col/ends_col: [Edp, 1] int32 endpoint ids (-1 padding);
    nlev_edge_row: [1, Edp]."""
    Lp2, Np = pm_stacked.shape
    Lp = Lp2 // 2
    TN = tile
    T = Np // TN
    J = nblocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)),
            *_win_specs(Lp, J),
            *_win_specs_col(J, n=2),
            *_win_specs(1, J),
        ],
        out_specs=pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)),
    )
    kernel = functools.partial(_b1h_kernel, Lp=Lp, TN=TN, J=J)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp2, Np), jnp.float32),
    )(wb, pm_stacked, *([adf_h_pad] * J), *([starts_col] * J),
      *([ends_col] * J), *([nlev_edge_row] * J))


# --------------------------------------------------------------------------
# b3 horizontal: limit edge fluxes by gathered endpoint factors
# (reference kernels/fct_ale_b3_horizontal.cu:28-39)
# --------------------------------------------------------------------------


def _b3h_kernel(wb_ref, lidx_ref, nlev_ref, adf_ref, *refs, Lp, TE, J):
    src_refs = refs[:J]
    out_ref, resid_ref = refs[J], refs[J + 1]
    # one contraction for both endpoints (k-major columns: [n1 | n2])
    g = _gather_dot(_concat(src_refs), _lcol(lidx_ref), 2 * TE)
    g1, g2 = g[:, :TE], g[:, TE:]
    p1, m1 = g1[:Lp], g1[Lp:]
    p2, m2 = g2[:Lp], g2[Lp:]
    F = adf_ref[:]
    ae_pos = jnp.minimum(1.0, jnp.minimum(p1, m2))
    ae_neg = jnp.minimum(1.0, jnp.minimum(m1, p2))
    ae = jnp.where(F >= 0.0, ae_pos, ae_neg)
    emask = _row_iota((Lp, TE)) < nlev_ref[:]
    out_ref[:] = jnp.where(emask, ae * F, F)
    resid_ref[:] = jnp.where(emask, (1.0 - ae) * F, 0.0)


def b3h_pallas(pm_stacked, adf_h_pad, lidx, wb, nlev_edge_row, *, tile,
               nblocks):
    """Returns (limited adf_h [Lp, Edp], residual (1-ae)*f [Lp, Edp])."""
    Lp2, Np = pm_stacked.shape
    Lp = Lp2 // 2
    TE = tile
    T, C, _ = lidx.shape
    assert C == 2 * TE
    Edp = T * TE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, TE), lambda i, wb: (0, i)),
            pl.BlockSpec((Lp, TE), lambda i, wb: (0, i)),
            *_win_specs(Lp2, nblocks),
        ],
        out_specs=(
            pl.BlockSpec((Lp, TE), lambda i, wb: (0, i)),
            pl.BlockSpec((Lp, TE), lambda i, wb: (0, i)),
        ),
    )
    kernel = functools.partial(_b3h_kernel, Lp=Lp, TE=TE, J=nblocks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Edp), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Edp), jnp.float32),
        ),
    )(wb, lidx, nlev_edge_row, adf_h_pad, *([pm_stacked] * nblocks))


# --------------------------------------------------------------------------
# c horizontal: signed sum of incident edge fluxes per node (reference
# kernels/fct_ale_c_horizontal.cu:25-26, atomicAdd) — one +-1 contraction
# --------------------------------------------------------------------------


def _ch_kernel(wb_ref, *refs, Lp, TN, J):
    adf_refs = refs[:J]
    s_refs = refs[J:2 * J]
    e_refs = refs[2 * J:3 * J]
    nw_refs = refs[3 * J:4 * J]
    out_ref = refs[4 * J]
    adf = _concat(adf_refs)
    s_ids = _concat_col(s_refs)
    e_ids = _concat_col(e_refs)
    nw = _concat(nw_refs)
    W = adf.shape[1]
    # chunked like _b1h_kernel; the +-1 incidence is folded into one matrix
    chunk = min(W, 512)
    t0 = pl.program_id(0) * TN
    acc = jnp.zeros((Lp, TN), jnp.float32)
    for c0 in range(0, W, chunk):
        cw = min(chunk, W - c0)
        cols = _col_iota((cw, TN)) + t0
        sl = slice(c0, c0 + cw)
        emask = _row_iota((Lp, cw)) < nw[:, sl]
        F = jnp.where(emask, adf[:, sl], 0.0)
        A = (s_ids[sl, :] == cols).astype(jnp.float32) - (
            e_ids[sl, :] == cols
        ).astype(jnp.float32)
        for part in _split3(F):
            acc = acc + jnp.dot(part, A,
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc


def ch_pallas(adf_h_pad, starts_col, ends_col, nlev_edge_row, wb, *,
              n_nodes_pad, tile, nblocks):
    """Signed incident-edge flux sum -> [Lp, Np]."""
    Lp, Edp = adf_h_pad.shape
    TN = tile
    T = n_nodes_pad // TN
    J = nblocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            *_win_specs(Lp, J),
            *_win_specs_col(J, n=2),
            *_win_specs(1, J),
        ],
        out_specs=pl.BlockSpec((Lp, TN), lambda i, wb: (0, i)),
    )
    kernel = functools.partial(_ch_kernel, Lp=Lp, TN=TN, J=J)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp, n_nodes_pad), jnp.float32),
    )(wb, *([adf_h_pad] * J), *([starts_col] * J), *([ends_col] * J),
      *([nlev_edge_row] * J))


# --------------------------------------------------------------------------
# a3 fused (vlimit=1): a2+a3 collapsed to a node-neighbor max over incident
# edges (see stages._cluster_reduce_via_edges for the algebraic identity).
# Gathers fct_ttf_max/min directly — no UV array, no element windows.
# Per-neighbor level bounds are applied via a step-matrix contraction:
# P[z, c] = BIG * (z >= lev_c) built as Zstep @ onehot(lev).
# --------------------------------------------------------------------------


def _a3f_kernel(wb_ref, lidx_ref, lev_ref, nlev_ref, lo_ref, self_ref,
                *refs, Lp, TN, K, J):
    src_refs = refs[:J]
    out_ref = refs[J]
    C = K * TN
    g = _gather_dot(_concat(src_refs), _lcol(lidx_ref), C)

    # level-bound penalty: P[z, c] = BIG where z >= lev_c (invalid slots
    # carry lev 0 -> fully masked; their gather is 0 via the sentinel)
    lev = _lcol(lev_ref)  # [C, 1]
    ohL = ((_col_iota((C, Lp))) == lev).astype(jnp.float32)  # [C, Lp]
    zstep = (_row_iota((Lp, Lp)) >= _col_iota((Lp, Lp))).astype(jnp.float32)
    P = jax.lax.dot_general(
        zstep, ohL, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * _BIG  # [Lp, C]: 0/1 step @ one-hot is exact, scaled after

    gmax = g[:Lp] - P
    gmin = g[Lp:] + P
    z = _row_iota((Lp, TN))
    nlev = nlev_ref[:]
    active = z < (nlev - 1)
    acc_max = jnp.where(active, self_ref[:Lp], -_BIG)
    acc_min = jnp.where(active, self_ref[Lp:], _BIG)
    for k in range(K):
        sl = slice(k * TN, (k + 1) * TN)
        acc_max = jnp.maximum(acc_max, gmax[:, sl])
        acc_min = jnp.minimum(acc_min, gmin[:, sl])

    negrow = jnp.full((1, TN), -_BIG, jnp.float32)
    posrow = jnp.full((1, TN), _BIG, jnp.float32)
    wmax = jnp.maximum(
        jnp.maximum(jnp.concatenate([negrow, acc_max[:-1]], axis=0), acc_max),
        jnp.concatenate([acc_max[1:], negrow], axis=0),
    )
    wmin = jnp.minimum(
        jnp.minimum(jnp.concatenate([posrow, acc_min[:-1]], axis=0), acc_min),
        jnp.concatenate([acc_min[1:], posrow], axis=0),
    )
    plain = (z == 0) | (z >= nlev - 2)
    sel_max = jnp.where(plain, acc_max, wmax)
    sel_min = jnp.where(plain, acc_min, wmin)
    lo = lo_ref[:]
    out_ref[:Lp] = jnp.where(active, sel_max - lo, 0.0)
    out_ref[Lp:] = jnp.where(active, sel_min - lo, 0.0)


def a3_fused_pallas(src_stacked, lidx, lev, wb, nlev_nod_row, fct_LO_pad, *,
                    tile, nblocks, K):
    """src_stacked [2Lp, Np] (a1 tmax; tmin) -> fct_ttf stacked [2Lp, Np]."""
    Lp2, Np = src_stacked.shape
    Lp = Lp2 // 2
    T, C, _ = lidx.shape
    TN = tile
    assert C == K * TN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, C, 1), lambda i, wb: (i, 0, 0)),
            pl.BlockSpec((1, TN), lambda i, wb: (0, i)),
            pl.BlockSpec((Lp, TN), lambda i, wb: (0, i)),
            pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)),
            *_win_specs(Lp2, nblocks),
        ],
        out_specs=pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)),
    )
    kernel = functools.partial(_a3f_kernel, Lp=Lp, TN=TN, K=K, J=nblocks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp2, Np), jnp.float32),
    )(wb, lidx, lev, nlev_nod_row, fct_LO_pad, src_stacked,
      *([src_stacked] * nblocks))

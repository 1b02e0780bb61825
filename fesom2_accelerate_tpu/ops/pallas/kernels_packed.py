"""Pallas TPU kernels for the PACKED (home-slot DIA) edge layout.

Same FCT-ALE stages as kernels.py's K2/K3/K4 (reference
kernels/fct_ale_b1_horizontal.cu, fct_ale_b2.cu, fct_ale_b3_*.cu,
fct_ale_c_*.cu) but with edge fields living as K stacked ``[Lp, Np]`` slabs
homed at each edge's first endpoint (ops/pallas/packed.py):

* edge->n0 scatter / n0 gather: **aligned** slab reads — free;
* edge->n1 scatter / n1 gather: one masked dynamic lane shift per
  (slot, offset) pair — pure VPU, no one-hot contraction, no MXU.

Shift machinery is identical to kernels.bounds_dia_pallas: the window slab is
staged through VMEM scratch, each pair reads a ``[rows, tile+BLOCK]`` segment
at a 128-aligned block offset ``q`` and rolls by the lane residue ``rem``
(both scalar-prefetched per tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fesom2_accelerate_tpu.ops.pallas.plan import BLOCK
from fesom2_accelerate_tpu.ops.pallas.kernels import (
    _COMPILER_PARAMS,
    _concat,
    _row_iota,
    _tile_spec,
    _vertical_shift_rows,
    pallas_call,
)


def _stage_window(scr, refs, J, rows):
    """Concatenate J window-block refs into scratch, mirroring the leading
    tile-width columns at the end so mod-W wrapped shifts (packed.py: pairs
    whose offset exceeds the tile's position) read in-bounds — the wrapped
    lanes carry no edge and are masked (same trick as bounds_dia_pallas)."""
    W = J * BLOCK
    w = _concat(refs[:J])
    m = scr.shape[1] - W
    reps = -(-m // W)
    wrap = (jnp.concatenate([w] * reps, axis=1) if reps > 1 else w)[:, :m]
    scr[:, :W] = w
    scr[:, W:] = wrap
    return W


def _mirror_into(scr, w, W):
    """scr[:, :W] = w plus the wrap-mirror tail (see _stage_window)."""
    m = scr.shape[1] - W
    reps = -(-m // W)
    wrap = (jnp.concatenate([w] * reps, axis=1) if reps > 1 else w)[:, :m]
    scr[:, :W] = w
    scr[:, W:] = wrap


def _dma_stage_window(scr, win, hbm, wb_ref, i, sems, J, *, t=0, Tb=1):
    """Stage this tile's [rows, W] window via MANUALLY double-buffered wide
    DMA (kernels.bounds_dia_dma_pallas pattern: the BlockSpec pipeline
    moves the window as J separate 128-lane block transfers, which is
    latency-bound; one wide async copy per tile with a 2-slot double
    buffer measured ~1.7x faster on the same pattern).  The source stays
    in HBM (pl.ANY); the wrap-mirror columns are filled VMEM->VMEM.

    ``Tb`` > 1: multi-tracer grid (tiles, tracers) with tracer minor —
    the source holds Tb row-stacked tracer slabs and step (i, t) stages
    tracer t's window of tile i."""
    W = J * BLOCK
    T = pl.num_programs(0)
    R = win.shape[1]  # rows per tracer slab

    def dma(slot, i_idx, t_idx):
        c0 = pl.multiple_of(wb_ref[i_idx, 0] * BLOCK, BLOCK)
        src = (hbm.at[:, pl.ds(c0, W)] if Tb == 1
               else hbm.at[pl.ds(t_idx * R, R), pl.ds(c0, W)])
        return pltpu.make_async_copy(src, win.at[slot], sems.at[slot])

    n = i * Tb + t

    @pl.when(n == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(n + 1 < T * Tb)
    def _():
        dma((n + 1) % 2, (n + 1) // Tb, (n + 1) % Tb).start()

    dma(n % 2, i, t).wait()
    _mirror_into(scr, win[n % 2], W)


def _aligned(scr, rows_lo, rows_hi, a0, TN):
    """Read the home-aligned [rows, TN] tile from the scratch window."""
    return scr[rows_lo:rows_hi, pl.ds(pl.multiple_of(a0, BLOCK), TN)]


def _pair_shift(scr, rows_lo, rows_hi, wb_ref, i, P, p, TN):
    """Read pair p's lane-shifted [rows, TN] segment from the window.

    Left-shift by ``rem`` expressed as a POSITIVE roll of ``width - rem``:
    Mosaic's dynamic roll silently miscompiles negative shifts on real TPUs
    (interpret mode wraps them, hiding the bug)."""
    q = wb_ref[i, 1 + p]
    rem = wb_ref[i, 1 + P + p]
    seg = scr[rows_lo:rows_hi,
              pl.ds(pl.multiple_of(q * BLOCK, BLOCK), TN + BLOCK)]
    # explicit int32: under jax_enable_x64 mixed promotion emits an int64
    # convert that Mosaic cannot lower (see kernels._bounds_dia_kernel)
    sh = jnp.where(rem > 0, jnp.int32(TN + BLOCK) - rem, jnp.int32(0))
    return pltpu.roll(seg, sh, axis=1)[:, :TN]



def _pertr_spec(rows, TN, n_prefetch=1):
    """Per-tracer row-stacked operand block on the (tiles, tracers) grid
    (tracer MINOR): row block t, column block i.  ``n_prefetch`` = number
    of scalar-prefetch refs the index map receives after (i, t)."""
    if n_prefetch == 2:
        return pl.BlockSpec((rows, TN), lambda i, t, w1, w2: (t, i))
    return pl.BlockSpec((rows, TN), lambda i, t, w: (t, i))


def _shared_spec(rows, TN, n_prefetch=1):
    """Tracer-shared operand block: constant row block 0 across tracer
    steps, so the pipeline re-uses it in VMEM without refetch."""
    if n_prefetch == 2:
        return pl.BlockSpec((rows, TN), lambda i, t, w1, w2: (0, i))
    return pl.BlockSpec((rows, TN), lambda i, t, w: (0, i))


def _scatter_packed(scr, wb_ref, levh_ref, sclev_ref, i, a0, z, TN, Lp, K,
                    Pk, split_pm: bool):
    """Accumulate the edge->node sum from the packed flux window.

    Home side: +F per slot, aligned.  Other (n1) side: -F per (slot, offset)
    pair, lane-shifted.  split_pm=True returns (plus, minus) flux splits
    (b1-horizontal, reference kernels/fct_ale_b1_horizontal.cu:24-27);
    False returns the signed sum (c-horizontal,
    kernels/fct_ale_c_horizontal.cu:25-26)."""
    P = sum(Pk)
    sclev = sclev_ref[0]  # [P, TN]
    acc_p = jnp.zeros((Lp, TN), jnp.float32)
    acc_m = jnp.zeros((Lp, TN), jnp.float32)

    def add(F, lev):
        nonlocal acc_p, acc_m
        Fm = jnp.where(z < lev, F, 0.0)
        if split_pm:
            acc_p = acc_p + jnp.maximum(Fm, 0.0)
            acc_m = acc_m + jnp.minimum(Fm, 0.0)
        else:
            acc_p = acc_p + Fm

    p = 0
    for k in range(K):
        add(_aligned(scr, k * Lp, (k + 1) * Lp, a0, TN), levh_ref[k:k + 1])
        for _ in range(Pk[k]):
            F = _pair_shift(scr, k * Lp, (k + 1) * Lp, wb_ref, i, P, p, TN)
            add(-F, sclev[p:p + 1])
            p += 1
    return (acc_p, acc_m) if split_pm else acc_p


# --------------------------------------------------------------------------
# K2 limit (packed): b1v + b1h scatter + b2 + b3v — the packed counterpart
# of kernels._limit_kernel.
# --------------------------------------------------------------------------


def _limit_body(scr, wb_ref, levh_ref, sclev_ref, av, tmax, tmin, ainv,
                nlev, z, i, a0, out_ref, av_out_ref, av2_ref,
                Lp, Lpv, L, TN, K, Pk, dt, eps, iter_yn):
    """K2 body on one node tile, with the bounds (tmax, tmin) as VALUES —
    shared by the standalone packed K2 and the fused K1+K2 kernel."""
    # b1 vertical (kernels/fct_ale_b1_vertical.cu:13-14)
    up = av[:Lp]
    if Lpv >= Lp + 1:
        dn = av[1:Lp + 1]
    else:
        dn = jnp.concatenate(
            [av[1:Lpv], jnp.zeros((Lp + 1 - Lpv, TN), jnp.float32)], axis=0
        )
    plus = jnp.maximum(0.0, up) + jnp.maximum(0.0, -dn)
    minus = jnp.minimum(0.0, up) + jnp.minimum(0.0, -dn)

    # b1 horizontal: packed scatter
    gp, gm = _scatter_packed(scr, wb_ref, levh_ref, sclev_ref, i, a0, z, TN,
                             Lp, K, Pk, split_pm=True)
    plus = plus + gp
    minus = minus + gm

    # b2 (kernels/fct_ale_b2.cu:10-11)
    active = z < (nlev - 1)
    fplus = plus * dt * ainv + eps
    fminus = minus * dt * ainv - eps
    fp = jnp.where(active, jnp.minimum(1.0, tmax / fplus), 0.0)
    fm = jnp.where(active, jnp.minimum(1.0, tmin / fminus), 0.0)
    out_ref[:Lp] = fp
    out_ref[Lp:] = fm

    # b3 vertical (kernels/fct_ale_b3_vertical.cu:17-45)
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
    if iter_yn:
        resid = jnp.where(vact & (z >= 1), (1.0 - ae) * flux, 0.0)
        if Lpv > Lp:
            resid = jnp.concatenate(
                [resid, jnp.zeros((Lpv - Lp, TN), jnp.float32)], axis=0
            )
        av2_ref[:] = resid


def _limit_packed_kernel(wb_ref, av_ref, tt_ref, ainv_ref, nlevn_ref,
                         levh_ref, sclev_ref, F_hbm, *refs,
                         Lp, Lpv, L, TN, K, Pk, J, dt, eps, iter_yn, Tb):
    out_ref, av_out_ref = refs[0], refs[1]
    av2_ref = refs[2] if iter_yn else None
    win, scr, sems = refs[-3], refs[-2], refs[-1]
    i = pl.program_id(0)
    t = pl.program_id(1) if Tb > 1 else 0
    _dma_stage_window(scr, win, F_hbm, wb_ref, i, sems, J, t=t, Tb=Tb)
    a0 = i * TN - wb_ref[i, 0] * BLOCK
    z = _row_iota((Lp, TN))
    tt = tt_ref[:]
    _limit_body(scr, wb_ref, levh_ref, sclev_ref, av_ref[:], tt[:Lp],
                tt[Lp:], ainv_ref[:], nlevn_ref[:], z, i, a0, out_ref,
                av_out_ref, av2_ref, Lp, Lpv, L, TN, K, Pk, dt, eps,
                iter_yn)


def limit_packed_pallas(adf_v_pad, tt_stacked, area_inv_pad, F_packed,
                        lev_home, sc_lev, sc_wb, nlev_nod_row, *, tile, J,
                        K, Pk, L, dt, flux_eps, iter_yn=False, Tb=1):
    """Packed K2 -> (limiter factors [2Lp, Np], limited adf_v [Lpv, Np],
    adf_v residual [Lpv, Np] — iterative mode only, else omitted).

    ``Tb`` > 1: multi-tracer batch — per-tracer operands/outputs are
    row-stacked, grid (tiles, tracers) with tracer minor so the int maps
    (lev_home, sc_lev, wb) stay VMEM-resident across tracer steps."""
    Lp2_all, Np = tt_stacked.shape
    Lp2 = Lp2_all // Tb
    Lp = Lp2 // 2
    Lpv = adf_v_pad.shape[0] // Tb
    TN = tile
    T = Np // TN
    P = sum(Pk)

    def pertr(rows):
        return _pertr_spec(rows, TN)

    def shared(rows):
        return _shared_spec(rows, TN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, Tb),
        in_specs=[
            pertr(Lpv),
            pertr(Lp2),
            shared(Lp),
            shared(1),
            shared(K),
            pl.BlockSpec((1, max(P, 1), TN), lambda i, t, wb: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            (pertr(Lp2), pertr(Lpv), pertr(Lpv)) if iter_yn else
            (pertr(Lp2), pertr(Lpv))
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K * Lp, J * BLOCK), jnp.float32),
            pltpu.VMEM((K * Lp, J * BLOCK + tile + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_limit_packed_kernel, Lp=Lp, Lpv=Lpv, L=L,
                               TN=TN, K=K, Pk=Pk, J=J, dt=dt, eps=flux_eps,
                               iter_yn=iter_yn, Tb=Tb)
    out_shape = (
        jax.ShapeDtypeStruct((Tb * Lp2, Np), jnp.float32),
        jax.ShapeDtypeStruct((Tb * Lpv, Np), jnp.float32),
    )
    if iter_yn:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((Tb * Lpv, Np), jnp.float32),)
    return pallas_call(
        kernel,
        name="fct_limit_packed",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=out_shape,
    )(sc_wb, adf_v_pad, tt_stacked, area_inv_pad, nlev_nod_row, lev_home,
      sc_lev, F_packed)


# --------------------------------------------------------------------------
# K3 b3-horizontal (packed): limit each packed edge flux by its endpoint
# limiter factors (kernels/fct_ale_b3_horizontal.cu:28-39).  n0 factors are
# the aligned pm tile; n1 factors are pair-shifted and selected per slot by
# the 0/1 indicator (exactly one pair matches each existing edge).
# --------------------------------------------------------------------------


def _b3h_packed_compute(wb_ref, levh_ref, gind_ref, F_ref, out_ref,
                        resid_ref, scr, i, Lp, TN, K, Pk, with_resid):
    P = sum(Pk)
    gind = gind_ref[0]  # [P, TN]
    a0 = i * TN - wb_ref[i, 0] * BLOCK
    home = _aligned(scr, 0, 2 * Lp, a0, TN)
    p1, m1 = home[:Lp], home[Lp:]
    z = _row_iota((Lp, TN))
    p = 0
    for k in range(K):
        oth = jnp.zeros((2 * Lp, TN), jnp.float32)
        for _ in range(Pk[k]):
            r = _pair_shift(scr, 0, 2 * Lp, wb_ref, i, P, p, TN)
            oth = jnp.where(gind[p:p + 1] > 0, oth + r, oth)
            p += 1
        p2, m2 = oth[:Lp], oth[Lp:]
        F = F_ref[k * Lp:(k + 1) * Lp]
        ae_pos = jnp.minimum(1.0, jnp.minimum(p1, m2))
        ae_neg = jnp.minimum(1.0, jnp.minimum(m1, p2))
        ae = jnp.where(F >= 0.0, ae_pos, ae_neg)
        emask = z < levh_ref[k:k + 1]
        out_ref[k * Lp:(k + 1) * Lp] = jnp.where(emask, ae * F, F)
        if with_resid:
            resid_ref[k * Lp:(k + 1) * Lp] = jnp.where(
                emask, (1.0 - ae) * F, 0.0)


def _b3h_packed_kernel(wb_ref, levh_ref, gind_ref, F_ref, pm_hbm, *refs,
                       Lp, TN, K, Pk, J, with_resid, Tb):
    out_ref = refs[0]
    resid_ref = refs[1] if with_resid else None
    win, scr, sems = refs[-3], refs[-2], refs[-1]
    i = pl.program_id(0)
    t = pl.program_id(1) if Tb > 1 else 0
    _dma_stage_window(scr, win, pm_hbm, wb_ref, i, sems, J, t=t, Tb=Tb)
    _b3h_packed_compute(wb_ref, levh_ref, gind_ref, F_ref, out_ref,
                        resid_ref, scr, i, Lp, TN, K, Pk, with_resid)


def b3h_packed_pallas(pm_stacked, F_packed, lev_home, g_ind, g_wb, *, tile,
                      J, K, Pk, with_resid=True, Tb=1):
    """Packed K3 -> (limited F [K*Lp, Np][, residual (1-ae)*F]).

    ``Tb`` > 1: multi-tracer batch (row-stacked per-tracer pm/F/outputs;
    shared int maps VMEM-resident across the tracer-minor grid axis)."""
    Lp2_all, Np = pm_stacked.shape
    Lp2 = Lp2_all // Tb
    Lp = Lp2 // 2
    TN = tile
    T = Np // TN
    P = sum(Pk)

    def pertr(rows):
        return _pertr_spec(rows, TN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, Tb),
        in_specs=[
            _shared_spec(K, TN),
            pl.BlockSpec((1, max(P, 1), TN), lambda i, t, wb: (i, 0, 0)),
            pertr(K * Lp),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            (pertr(K * Lp), pertr(K * Lp))
            if with_resid else (pertr(K * Lp),)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Lp2, J * BLOCK), jnp.float32),
            pltpu.VMEM((Lp2, J * BLOCK + tile + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_b3h_packed_kernel, Lp=Lp, TN=TN, K=K, Pk=Pk,
                               J=J, with_resid=with_resid, Tb=Tb)
    out_shape = (jax.ShapeDtypeStruct((Tb * K * Lp, Np), jnp.float32),)
    if with_resid:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((Tb * K * Lp, Np), jnp.float32),)
    out = pallas_call(
        kernel,
        name="fct_b3h_packed",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=out_shape,
    )(g_wb, lev_home, g_ind, F_packed, pm_stacked)
    return out if with_resid else (out[0], None)


def b3h_packed_fixup_pallas(pm_stacked, F_packed, out_prev, resid_prev,
                            lev_home, g_ind, g_wb, tile_ids, *, tile, J, K,
                            Pk, with_resid=True, Tb=1):
    """Recompute packed b3h on the BOUNDARY node tiles only, in place
    (the post-exchange fixup; see kernels.b3h_fixup_pallas).

    ``Tb`` > 1: multi-tracer batch — grid (fix tiles, tracers), per-tracer
    pm window blocks / F / in-place outputs row-stacked."""
    Lp2_all, Np = pm_stacked.shape
    Lp2 = Lp2_all // Tb
    Lp = Lp2 // 2
    TN = tile
    F = tile_ids.shape[0]
    P = sum(Pk)

    def _win_ids(rows, J):
        return [pl.BlockSpec(
            (rows, BLOCK),
            lambda i, t, wb, ids, j=j: (t, wb[ids[i], 0] + j)
        ) for j in range(J)]

    def _tile_ids(shape):
        return pl.BlockSpec(shape, lambda i, t, wb, ids: (0, ids[i]))

    def _tile_ids_tr(shape):  # per-tracer row block
        return pl.BlockSpec(shape, lambda i, t, wb, ids: (t, ids[i]))

    in_specs = [
        _tile_ids((K, TN)),
        pl.BlockSpec((1, max(P, 1), TN),
                     lambda i, t, wb, ids: (ids[i], 0, 0)),
        _tile_ids_tr((K * Lp, TN)),
        *_win_ids(Lp2, J),
        _tile_ids_tr((K * Lp, TN)),
    ]
    out_specs = [_tile_ids_tr((K * Lp, TN))]
    if with_resid:
        in_specs.append(_tile_ids_tr((K * Lp, TN)))
        out_specs.append(_tile_ids_tr((K * Lp, TN)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F, Tb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((Lp2, J * BLOCK + tile + BLOCK), jnp.float32),
        ],
    )

    def kernel(wb_ref, ids_ref, levh_ref, gind_ref, F_ref, *refs):
        out_ref = refs[J + (2 if with_resid else 1)]
        resid_ref = refs[J + 3] if with_resid else None
        scr = refs[-1]
        _stage_window(scr, refs, J, 2 * Lp)
        i = ids_ref[pl.program_id(0)]
        _b3h_packed_compute(wb_ref, levh_ref, gind_ref, F_ref, out_ref,
                            resid_ref, scr, i, Lp, TN, K, Pk, with_resid)

    n_in = 2 + 3 + J  # scalar prefetch + fixed + windows
    aliases = {n_in: 0}
    if with_resid:
        aliases[n_in + 1] = 1
    args = [g_wb, tile_ids, lev_home, g_ind, F_packed,
            *([pm_stacked] * J), out_prev]
    out_shape = (jax.ShapeDtypeStruct(out_prev.shape, jnp.float32),)
    if with_resid:
        args.append(resid_prev)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(resid_prev.shape, jnp.float32),)
    out = pallas_call(
        kernel,
        name="fct_b3h_packed_fixup",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=out_shape,
        input_output_aliases=aliases,
    )(*args)
    return out if with_resid else (out[0], None)


# --------------------------------------------------------------------------
# K4 update (packed): signed c-horizontal edge sum + stage-c solution /
# iterative-LO update — the packed counterpart of kernels._update_kernel.
# --------------------------------------------------------------------------


def _update_packed_kernel(wb_ref, avl_ref, ttf_ref, hn_ref, hnn_ref, lo_ref,
                          dvin_ref, dhin_ref, ainv_ref, nlevn_ref, levh_ref,
                          sclev_ref, F_hbm, *refs,
                          Lp, Lpv, L, TN, K, Pk, J, dt, iter_yn, Tb):
    o1_ref, o2_ref = refs[0], refs[1]
    win, scr, sems = refs[-3], refs[-2], refs[-1]
    i = pl.program_id(0)
    t = pl.program_id(1) if Tb > 1 else 0
    _dma_stage_window(scr, win, F_hbm, wb_ref, i, sems, J, t=t, Tb=Tb)
    a0 = i * TN - wb_ref[i, 0] * BLOCK
    z = _row_iota((Lp, TN))

    acc = _scatter_packed(scr, wb_ref, levh_ref, sclev_ref, i, a0, z, TN,
                          Lp, K, Pk, split_pm=False)

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
    nlev = nlevn_ref[:]
    active = z < (nlev - 1)
    lo = lo_ref[:]
    if iter_yn:
        hnn = hnn_ref[:]
        new_lo = jnp.where(active, lo + ddiv / hnn, lo) + dh / hnn
        o1_ref[:] = new_lo
        o2_ref[:] = jnp.zeros((Lp, TN), jnp.float32)
    else:
        dv = -ttf_ref[:] * hn_ref[:] + lo * hnn_ref[:] + ddiv
        o1_ref[:] = jnp.where(active, dvin_ref[:] + dv, dvin_ref[:])
        o2_ref[:] = dhin_ref[:] + dh


def update_packed_pallas(adf_v_lim_pad, ttf_pad, hnode_pad, hnode_new_pad,
                         fct_LO_pad, del_v_pad, del_h_pad, area_inv_pad,
                         F_lim_packed, lev_home, sc_lev, sc_wb, nlev_nod_row,
                         *, tile, J, K, Pk, L, dt, iter_yn, Tb=1):
    """Packed K4 -> (o1, o2); see kernels.update_pallas.

    ``Tb`` > 1: multi-tracer batch (per-tracer avl/ttf/lo/del/F
    row-stacked; hnode/hnode_new/area_inv and int maps shared)."""
    Lpv = adf_v_lim_pad.shape[0] // Tb
    Np = adf_v_lim_pad.shape[1]
    Lp = area_inv_pad.shape[0]
    TN = tile
    T = Np // TN
    P = sum(Pk)

    def pertr(rows):
        return _pertr_spec(rows, TN)

    def shared(rows):
        return _shared_spec(rows, TN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, Tb),
        in_specs=[
            pertr(Lpv),
            pertr(Lp),
            shared(Lp),
            shared(Lp),
            pertr(Lp),
            pertr(Lp),
            pertr(Lp),
            shared(Lp),
            shared(1),
            shared(K),
            pl.BlockSpec((1, max(P, 1), TN), lambda i, t, wb: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pertr(Lp),
            pertr(Lp),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K * Lp, J * BLOCK), jnp.float32),
            pltpu.VMEM((K * Lp, J * BLOCK + tile + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_update_packed_kernel, Lp=Lp, Lpv=Lpv, L=L,
                               TN=TN, K=K, Pk=Pk, J=J, dt=dt,
                               iter_yn=iter_yn, Tb=Tb)
    return pallas_call(
        kernel,
        name="fct_update_packed",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((Tb * Lp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Tb * Lp, Np), jnp.float32),
        ),
    )(sc_wb, adf_v_lim_pad, ttf_pad, hnode_pad, hnode_new_pad, fct_LO_pad,
      del_v_pad, del_h_pad, area_inv_pad, nlev_nod_row, lev_home, sc_lev,
      F_lim_packed)


# --------------------------------------------------------------------------
# Fused K3+K4: b3-horizontal limiting computed directly on K4's F scatter
# window (the window already spans K3's gather span), then the stage-c
# scatter consumes the limited values from VMEM.  Removes K3's separate
# pass: its aligned F read (~100 MB/step on core2) and its own pm window —
# the limited F is written once, as K4's extra tile output.  The price is
# recomputing ae over the window width instead of the tile (~1.2x VPU) —
# measured A/B in BASELINE.md.  Requires the GLOBAL gather-pair layout
# (packed.py: static positions + static lane residues + the windowed
# gl_int lev/indicator slab); not used on the sharded path, whose
# interior/fixup split needs the separate K3 to overlap the exchange.
# --------------------------------------------------------------------------


def _update_fused_kernel(scwb_ref, pmwb_ref, avl_ref, ttf_ref, hn_ref,
                         hnn_ref, lo_ref, dvin_ref, dhin_ref, ainv_ref,
                         nlevn_ref, levh_ref, sclev_ref, F_hbm, pm_hbm,
                         gl_hbm, *refs,
                         Lp, Lpv, L, TN, K, Pk_s, Pk_g, J, J_pm, g_offs,
                         dt, iter_yn, Tb):
    o1_ref, o2_ref, limF_ref = refs[0], refs[1], refs[2]
    resid_ref = refs[3] if iter_yn else None
    winF, win_pm, win_gl, scr_limF, scr_pm, sems = refs[-6:]
    i = pl.program_id(0)
    t = pl.program_id(1) if Tb > 1 else 0
    n = i * Tb + t
    T = pl.num_programs(0)
    W2 = J * BLOCK
    P_g = sum(Pk_g)

    def dmas(slot, i_idx, t_idx):
        c1 = pl.multiple_of(scwb_ref[i_idx, 0] * BLOCK, BLOCK)
        c2 = pl.multiple_of(pmwb_ref[i_idx, 0] * BLOCK, BLOCK)
        srcF = (F_hbm.at[:, pl.ds(c1, W2)] if Tb == 1 else
                F_hbm.at[pl.ds(t_idx * K * Lp, K * Lp), pl.ds(c1, W2)])
        srcP = (pm_hbm.at[:, pl.ds(c2, J_pm * BLOCK)] if Tb == 1 else
                pm_hbm.at[pl.ds(t_idx * 2 * Lp, 2 * Lp),
                          pl.ds(c2, J_pm * BLOCK)])
        return [
            pltpu.make_async_copy(srcF, winF.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(srcP, win_pm.at[slot], sems.at[slot, 1]),
        ]

    # the lev/indicator window is SHARED across tracers: fetched per TILE
    # (double-buffered on i), waited once at t == 0
    def dma_gl(slot, i_idx):
        c1 = pl.multiple_of(scwb_ref[i_idx, 0] * BLOCK, BLOCK)
        return pltpu.make_async_copy(gl_hbm.at[:, pl.ds(c1, W2)],
                                     win_gl.at[slot], sems.at[slot, 2])

    @pl.when(n == 0)
    def _():
        for c in dmas(0, 0, 0):
            c.start()
        dma_gl(0, 0).start()

    @pl.when(n + 1 < T * Tb)
    def _():
        for c in dmas((n + 1) % 2, (n + 1) // Tb, (n + 1) % Tb):
            c.start()

    @pl.when((t == Tb - 1) & (i + 1 < T))
    def _():
        dma_gl((i + 1) % 2, i + 1).start()

    for c in dmas(n % 2, i, t):
        c.wait()

    @pl.when(t == 0)
    def _():
        dma_gl(i % 2, i).wait()

    _mirror_into(scr_pm, win_pm[n % 2], J_pm * BLOCK)
    gl = win_gl[i % 2]
    Fw = winF[n % 2]
    # b3h limiting over the WHOLE window (K3's math on window width;
    # kernels/fct_ale_b3_horizontal.cu:28-39)
    delta = scwb_ref[i, 0] - pmwb_ref[i, 0]
    home = scr_pm[:, pl.ds(pl.multiple_of(delta * BLOCK, BLOCK), W2)]
    p1, m1 = home[:Lp], home[Lp:]
    zW = _row_iota((Lp, W2))
    lim_rows = []
    p = 0
    for k in range(K):
        oth = jnp.zeros((2 * Lp, W2), jnp.float32)
        for _ in range(Pk_g[k]):
            q = pmwb_ref[i, 1 + p]
            seg = scr_pm[:, pl.ds(pl.multiple_of(q * BLOCK, BLOCK),
                                  W2 + BLOCK)]
            rem = g_offs[p] % BLOCK
            r = (pltpu.roll(seg, W2 + BLOCK - rem, axis=1)
                 if rem else seg)[:, :W2]
            oth = jnp.where(gl[K + p:K + p + 1] > 0, oth + r, oth)
            p += 1
        p2, m2 = oth[:Lp], oth[Lp:]
        F = Fw[k * Lp:(k + 1) * Lp]
        ae_pos = jnp.minimum(1.0, jnp.minimum(p1, m2))
        ae_neg = jnp.minimum(1.0, jnp.minimum(m1, p2))
        ae = jnp.where(F >= 0.0, ae_pos, ae_neg)
        emask = zW < gl[k:k + 1]
        lim_rows.append(jnp.where(emask, ae * F, F))
    _mirror_into(scr_limF, jnp.concatenate(lim_rows, axis=0), W2)

    a0 = i * TN - scwb_ref[i, 0] * BLOCK
    a0s = pl.multiple_of(a0, BLOCK)
    limF_tile = scr_limF[:, pl.ds(a0s, TN)]
    limF_ref[:] = limF_tile
    if iter_yn:
        # residual (1-ae)*F == F - limF on edges, 0 elsewhere (limF == F)
        resid_ref[:] = winF[n % 2, :, pl.ds(a0s, TN)] - limF_tile

    # K4 stage-c on the limited window values (straight from VMEM)
    z = _row_iota((Lp, TN))
    acc = _scatter_packed(scr_limF, scwb_ref, levh_ref, sclev_ref, i, a0, z,
                          TN, Lp, K, Pk_s, split_pm=False)

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
    nlev = nlevn_ref[:]
    active = z < (nlev - 1)
    lo = lo_ref[:]
    if iter_yn:
        hnn = hnn_ref[:]
        new_lo = jnp.where(active, lo + ddiv / hnn, lo) + dh / hnn
        o1_ref[:] = new_lo
        o2_ref[:] = jnp.zeros((Lp, TN), jnp.float32)
    else:
        dv = -ttf_ref[:] * hn_ref[:] + lo * hnn_ref[:] + ddiv
        o1_ref[:] = jnp.where(active, dvin_ref[:] + dv, dvin_ref[:])
        o2_ref[:] = dhin_ref[:] + dh


def update_fused_pallas(adf_v_lim_pad, ttf_pad, hnode_pad, hnode_new_pad,
                        fct_LO_pad, del_v_pad, del_h_pad, area_inv_pad,
                        pm_stacked, F_packed, gl_int, lev_home, sc_lev,
                        sc_wb, pm_wb, nlev_nod_row, *, tile, J, J_pm, K,
                        Pk_s, Pk_g, g_offs, L, dt, iter_yn, Tb=1):
    """Fused K3+K4 -> (o1, o2, limited F [, residual — iterative mode]).

    ``Tb`` > 1: multi-tracer batch.  Per-tracer operands (adf_v_lim, ttf,
    fct_LO, del_v/h, pm, F) are row-stacked; hnode/hnode_new/area_inv and
    every int map are shared.  Grid (tiles, tracers), tracer minor: the
    int tiles keep their block index across tracer steps (VMEM-resident)
    and the gl window is DMA'd once per tile."""
    Lpv = adf_v_lim_pad.shape[0] // Tb
    Np = adf_v_lim_pad.shape[1]
    Lp = area_inv_pad.shape[0]
    TN = tile
    T = Np // TN
    P_s, P_g = sum(Pk_s), sum(Pk_g)

    def pertr(rows):  # index maps take (i, t, sc_wb, pm_wb)
        return _pertr_spec(rows, TN, n_prefetch=2)

    def shared(rows):
        return _shared_spec(rows, TN, n_prefetch=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # sc_wb, pm_wb
        grid=(T, Tb),
        in_specs=[
            pertr(Lpv),
            pertr(Lp),
            shared(Lp),
            shared(Lp),
            pertr(Lp),
            pertr(Lp),
            pertr(Lp),
            shared(Lp),
            shared(1),
            shared(K),
            pl.BlockSpec((1, max(P_s, 1), TN),
                         lambda i, t, w1, w2: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            (pertr(Lp), pertr(Lp), pertr(K * Lp), pertr(K * Lp))
            if iter_yn else
            (pertr(Lp), pertr(Lp), pertr(K * Lp))
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K * Lp, J * BLOCK), jnp.float32),
            pltpu.VMEM((2, 2 * Lp, J_pm * BLOCK), jnp.float32),
            pltpu.VMEM((2, gl_int.shape[0], J * BLOCK), jnp.int32),
            pltpu.VMEM((K * Lp, J * BLOCK + tile + BLOCK), jnp.float32),
            pltpu.VMEM((2 * Lp, J_pm * BLOCK + tile + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(_update_fused_kernel, Lp=Lp, Lpv=Lpv, L=L,
                               TN=TN, K=K, Pk_s=Pk_s, Pk_g=Pk_g, J=J,
                               J_pm=J_pm, g_offs=g_offs, dt=dt,
                               iter_yn=iter_yn, Tb=Tb)
    out_shape = (
        jax.ShapeDtypeStruct((Tb * Lp, Np), jnp.float32),
        jax.ShapeDtypeStruct((Tb * Lp, Np), jnp.float32),
        jax.ShapeDtypeStruct((Tb * K * Lp, Np), jnp.float32),
    )
    if iter_yn:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((Tb * K * Lp, Np), jnp.float32),)
    return pallas_call(
        kernel,
        name="fct_update_fused_k34",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=out_shape,
    )(sc_wb, pm_wb, adf_v_lim_pad, ttf_pad, hnode_pad, hnode_new_pad,
      fct_LO_pad, del_v_pad, del_h_pad, area_inv_pad, nlev_nod_row,
      lev_home, sc_lev, F_packed, pm_stacked, gl_int)


# --------------------------------------------------------------------------
# Fused K1+K2: the bounds (a1+a2+a3, DIA form) feed b1/b2/b3v directly on
# the same node tile — K2 consumes the bounds ONLY on its own tile, so the
# fusion is recompute-free and removes the [2Lp, Np] tt round-trip through
# HBM entirely (it remains an output for diagnostics/state parity).
# Applies when the mesh admits BOTH the DIA bounds and the packed edge
# layout (step.build_pallas_data gates).
# --------------------------------------------------------------------------


def _limit_fused_kernel(wb1_ref, wb2_ref, dlev_ref, nlevn_ref, lo_t_ref,
                        ttf_t_ref, av_ref, ainv_ref, levh_ref, sclev_ref,
                        lo_hbm, tt_hbm, F_hbm, *refs,
                        Lp, Lpv, L, TN, D, rems, J1, K, Pk, J2, dt, eps,
                        vlimit, iter_yn):
    from fesom2_accelerate_tpu.ops.pallas.kernels import _dia_bounds_vals

    tt_out_ref, out_ref, av_out_ref = refs[0:3]
    av2_ref = refs[3] if iter_yn else None
    win1, winF, scr_a1, scr_F, sems = refs[-5:]

    i = pl.program_id(0)
    T = pl.num_programs(0)
    W1 = J1 * BLOCK

    def dmas(slot, idx):
        c1 = pl.multiple_of(wb1_ref[idx, 0] * BLOCK, BLOCK)
        c2 = pl.multiple_of(wb2_ref[idx, 0] * BLOCK, BLOCK)
        return [
            pltpu.make_async_copy(lo_hbm.at[:, pl.ds(c1, W1)],
                                  win1.at[slot, :Lp], sems.at[slot, 0]),
            pltpu.make_async_copy(tt_hbm.at[:, pl.ds(c1, W1)],
                                  win1.at[slot, Lp:], sems.at[slot, 1]),
            pltpu.make_async_copy(F_hbm.at[:, pl.ds(c2, J2 * BLOCK)],
                                  winF.at[slot], sems.at[slot, 2]),
        ]

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < T)
    def _():
        for d in dmas((i + 1) % 2, i + 1):
            d.start()

    for d in dmas(i % 2, i):
        d.wait()

    z = _row_iota((Lp, TN))
    nlev = nlevn_ref[:]

    # K1 bounds (DIA) as values
    w1 = win1[i % 2]
    tmax, tmin = _dia_bounds_vals(
        wb1_ref, dlev_ref, scr_a1, w1[:Lp], w1[Lp:], lo_t_ref[:],
        ttf_t_ref[:], nlev, z, i, Lp, TN, D, rems, vlimit)
    tt_out_ref[:Lp] = tmax
    tt_out_ref[Lp:] = tmin

    # K2 on the same tile
    _mirror_into(scr_F, winF[i % 2], J2 * BLOCK)
    a0 = i * TN - wb2_ref[i, 0] * BLOCK
    _limit_body(scr_F, wb2_ref, levh_ref, sclev_ref, av_ref[:], tmax, tmin,
                ainv_ref[:], nlev, z, i, a0, out_ref, av_out_ref, av2_ref,
                Lp, Lpv, L, TN, K, Pk, dt, eps, iter_yn)


def limit_fused_pallas(fct_LO_pad, ttf_pad, adf_v_pad, area_inv_pad,
                       F_packed, dia_wb, dia_lev, lev_home, sc_lev, sc_wb,
                       nlev_nod_row, *, tile, J_un, D, rems, J_sc, K, Pk,
                       L, dt, flux_eps, vlimit=1, iter_yn=False):
    """Fused K1+K2 -> (tt stacked [2Lp, Np], limiter factors [2Lp, Np],
    limited adf_v [Lpv, Np][, adf_v residual — iterative mode only])."""
    Lp, Np = fct_LO_pad.shape
    Lpv = adf_v_pad.shape[0]
    TN = tile
    T = Np // TN
    P = sum(Pk)
    assert J_un * BLOCK >= tile, "DIA window narrower than the tile"

    def tspec(shape):
        return pl.BlockSpec(shape, lambda i, w1, w2: (0, i))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # dia_wb, sc_wb
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, TN), lambda i, w1, w2: (i, 0, 0)),
            tspec((1, TN)),
            tspec((Lp, TN)),
            tspec((Lp, TN)),
            tspec((Lpv, TN)),
            tspec((Lp, TN)),
            tspec((K, TN)),
            pl.BlockSpec((1, max(P, 1), TN), lambda i, w1, w2: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            (tspec((2 * Lp, TN)), tspec((2 * Lp, TN)), tspec((Lpv, TN)),
             tspec((Lpv, TN))) if iter_yn else
            (tspec((2 * Lp, TN)), tspec((2 * Lp, TN)), tspec((Lpv, TN)))
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * Lp, J_un * BLOCK), jnp.float32),
            pltpu.VMEM((2, K * Lp, J_sc * BLOCK), jnp.float32),
            pltpu.VMEM((2 * Lp, J_un * BLOCK + TN), jnp.float32),
            pltpu.VMEM((K * Lp, J_sc * BLOCK + TN + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(_limit_fused_kernel, Lp=Lp, Lpv=Lpv, L=L,
                               TN=TN, D=D, rems=rems, J1=J_un, K=K, Pk=Pk,
                               J2=J_sc, dt=dt, eps=flux_eps, vlimit=vlimit,
                               iter_yn=iter_yn)
    out_shape = (
        jax.ShapeDtypeStruct((2 * Lp, Np), jnp.float32),
        jax.ShapeDtypeStruct((2 * Lp, Np), jnp.float32),
        jax.ShapeDtypeStruct((Lpv, Np), jnp.float32),
    )
    if iter_yn:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((Lpv, Np), jnp.float32),)
    return pallas_call(
        kernel,
        name="fct_limit_fused",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=out_shape,
    )(dia_wb, sc_wb, dia_lev, nlev_nod_row, fct_LO_pad, ttf_pad, adf_v_pad,
      area_inv_pad, lev_home, sc_lev, fct_LO_pad, ttf_pad, F_packed)


# --------------------------------------------------------------------------
# stress2rhs (packed): element->node EVP stress divergence (reference
# src/reference.cpp:440-480, CPU-only there) with elements homed at their
# min corner — the packed counterpart of kernels.stress2rhs_pallas, whose
# one-hot contractions waste the MXU on 2-row operands.  Packed element
# rows per slot: 0 s11, 1 s12, 2 s22, 3 area*ice_active, 4 mf/3,
# 5..10 gradient_sca rows 0..5 (11 used of 16).
# --------------------------------------------------------------------------


def _s2r_corner_uv(el, TN):
    """The 3 per-corner (u, v) contributions of an element tile [16, TN]
    (reference src/reference.cpp:456-462)."""
    s11, s12, s22 = el[0:1], el[1:2], el[2:3]
    ea, mf3 = el[3:4], el[4:5]
    out = []
    for c in range(3):
        g = el[5 + c:6 + c]
        g3 = el[8 + c:9 + c]
        u = -ea * (s11 * g + s12 * g3 + s12 * mf3)
        v = -ea * (s12 * g + s22 * g3 - s11 * mf3)
        out.append((u, v))
    return out


def _s2r_packed_kernel(wb_ref, hc_ref, ind_ref, iam_ref, ra_ref, rm_ref,
                       el_hbm, *refs, TN, K, Pk, J, rems):
    out_ref = refs[0]
    win, uv_scr, sems = refs[-3], refs[-2], refs[-1]
    i = pl.program_id(0)
    W = J * BLOCK
    T = pl.num_programs(0)

    # double-buffered wide DMA of the raw element window (the
    # _dma_stage_window pattern, minus its el mirror copy: only the
    # derived uv slab below needs the wrap-mirror tail)
    def dma(slot, idx):
        c0 = pl.multiple_of(wb_ref[idx, 0] * BLOCK, BLOCK)
        return pltpu.make_async_copy(el_hbm.at[:, pl.ds(c0, W)],
                                     win.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < T)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    a0 = i * TN - wb_ref[i, 0] * BLOCK
    P = sum(Pk)
    ind = ind_ref[0]  # [P, TN]

    # stage 1: the 3 per-corner (u, v) contributions, ONCE over the raw
    # window per slot (uv_scr rows [k*8 + 2c] = u_c, [+1] = v_c).  The
    # naive form re-evaluated the 36-op corner math inside every home/pair
    # read (K + P = 12 times per tile) only to select one corner, and
    # mirror-copied the full 16-row element window; hoisting the math and
    # mirroring only the 8-row uv slab measured 0.287 -> ~0.2 ms/call on
    # core2.
    w = win[i % 2]
    uv_rows = []
    for k in range(K):
        cs = _s2r_corner_uv(w[k * 16:(k + 1) * 16, :], None)
        uv_rows += [cs[0][0], cs[0][1], cs[1][0], cs[1][1], cs[2][0],
                    cs[2][1], jnp.zeros((2, W), jnp.float32)]
    _mirror_into(uv_scr, jnp.concatenate(uv_rows, axis=0), W)

    acc_u = jnp.zeros((1, TN), jnp.float32)
    acc_v = jnp.zeros((1, TN), jnp.float32)

    def add(uv, code_row):
        nonlocal acc_u, acc_v
        for c in range(3):
            sel = code_row == (c + 1)
            acc_u = acc_u + jnp.where(sel, uv[2 * c:2 * c + 1], 0.0)
            acc_v = acc_v + jnp.where(sel, uv[2 * c + 1:2 * c + 2], 0.0)

    p = 0
    for k in range(K):
        add(_aligned(uv_scr, k * 8, (k + 1) * 8, a0, TN), hc_ref[k:k + 1])
        for _ in range(Pk[k]):
            # STATIC lane roll: the plan's pair layout is global, so the
            # residue (-d) mod 128 is compile-time (PackedS2RPlan.rems);
            # only the 128-block index q stays dynamic
            q = wb_ref[i, 1 + p]
            seg = uv_scr[k * 8:(k + 1) * 8,
                         pl.ds(pl.multiple_of(q * BLOCK, BLOCK), TN + BLOCK)]
            rem = rems[p]
            uv = (pltpu.roll(seg, TN + BLOCK - rem, axis=1)
                  if rem else seg)[:, :TN]
            add(uv, ind[p:p + 1])
            p += 1

    iam = iam_ref[:]
    has_mass = iam > 0.0
    out_ref[0:1] = jnp.where(has_mass, acc_u * iam + ra_ref[:], 0.0)
    out_ref[1:2] = jnp.where(has_mass, acc_v * iam + rm_ref[:], 0.0)
    out_ref[2:] = jnp.zeros((6, TN), jnp.float32)


def stress2rhs_packed_pallas(elem_packed, hc, ind, wb, inv_areamass_row,
                             rhs_a_row, rhs_m_row, *, tile, J, K, Pk, rems):
    """elem_packed [K*16, Np] (slot-major; row layout above) -> [8, Np]
    with U = row 0, V = row 1."""
    _, Np = elem_packed.shape
    TN = tile
    T = Np // TN
    P = sum(Pk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            _tile_spec((K, TN)),
            pl.BlockSpec((1, max(P, 1), TN), lambda i, wb: (i, 0, 0)),
            _tile_spec((1, TN)),
            _tile_spec((1, TN)),
            _tile_spec((1, TN)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=_tile_spec((8, TN)),
        scratch_shapes=[
            pltpu.VMEM((2, K * 16, J * BLOCK), jnp.float32),
            pltpu.VMEM((K * 8, J * BLOCK + tile + BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_s2r_packed_kernel, TN=TN, K=K, Pk=Pk,
                               J=J, rems=rems)
    return pallas_call(
        kernel,
        name="stress2rhs_packed",
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
    )(wb, hc, ind, inv_areamass_row, rhs_a_row, rhs_m_row, elem_packed)

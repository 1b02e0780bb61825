"""Bytes-moved models and roofline accounting.

The reference's perf methodology is explicit per-kernel bytes models divided
by measured time (kernels/fct_ale_a1.py:93-95 and friends; BASELINE.md table).
This module reproduces that: an explicit per-stage byte count for the whole
FCT-ALE chain, used by bench.py to report the achieved fraction of HBM
speed-of-light.
"""

from __future__ import annotations

import numpy as np

from fesom2_accelerate_tpu.mesh.topology import Mesh

# Reported HBM peak per chip, bytes/s.  v5e ("v5 lite") ~= 819 GB/s,
# v5p ~= 2765 GB/s, v4 ~= 1228 GB/s.
_HBM_PEAK = {
    "v5 lite": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6 lite": 1640e9,
    "v6e": 1640e9,
}


def hbm_peak_bytes_per_s(device_kind: str | None = None) -> float:
    if device_kind:
        dk = device_kind.lower()
        for key, val in _HBM_PEAK.items():
            if key in dk:
                return val
    return 819e9  # conservative default (v5e)


def fct_ale_step_bytes(mesh: Mesh, itemsize: int = 4,
                       iter_yn: bool = False) -> int:
    """Modeled HBM traffic of one full a->b->c step, reference-style.

    Counts every array read/write once per stage at ``itemsize`` bytes per
    active entry (gathers counted once per incidence, like the reference's
    per-edge/per-cluster accounting in kernels/fct_ale_a3.py:116-151 and
    kernels/fct_ale_b1_horizontal.py:70-89).  Index/mask traffic (int32/bool)
    is included at 4/1 bytes.  This is the denominator model for the
    fraction-of-speed-of-light metric; fused execution can beat it only by
    keeping intermediates in VMEM, which is exactly what we want to reward.
    """
    L = mesh.n_layers
    nod = int(np.sum(mesh.nlev_nod - 1))  # active node-layers
    elem_active = int(np.sum(mesh.nlev_elem - 1))
    elem_full = L * mesh.n_elems  # a2 writes padded full depth
    edge = int(np.sum(mesh.nlev_edge))
    deg_e = int(np.sum(mesh.node_elems_num * (mesh.nlev_nod - 1)))
    deg_d = int(np.sum(mesh.node_edges_num * (mesh.nlev_nod - 1)))
    vint = int(np.sum(mesh.nlev_nod))  # interfaces incl. bottom
    f = itemsize

    b = 0
    # a1: read fct_LO, ttf; write tmax, tmin
    b += 4 * nod * f
    # a2: gather tmax,tmin at 3 nodes; write UV pair over full depth
    b += (2 * 3 * elem_active + 2 * elem_full) * f + 3 * 4 * mesh.n_elems
    # a3: gather UV pair over node's element cluster; read fct_LO;
    #     write tmax2, tmin2
    b += (2 * deg_e + 3 * nod) * f + 4 * deg_e // max(L - 1, 1)
    # b1v: read adf_v interfaces; write fct_plus/minus
    b += (vint + 2 * nod) * f
    # b1h: gather adf_h per node-edge incidence; read+write fct_plus/minus
    b += (deg_d + 4 * nod) * f + 4 * deg_d // max(L - 1, 1)
    # b2: read fct_plus/minus, tmax2, tmin2, area_inv; write fct_plus/minus
    b += 7 * nod * f
    # b3v: read fct_plus/minus, adf_v; write adf_v
    b += (2 * nod + 2 * vint) * f
    # b3h: gather fct_plus/minus at both edge ends; read+write adf_h
    b += (4 * edge + 2 * edge) * f + 2 * 4 * mesh.n_edges
    if iter_yn:
        # residual fluxes written in b3 + fct_LO update (read LO, hnode_new,
        # adf_v, gather adf_h; write LO)
        b += (vint + edge) * f
        b += (3 * nod + vint + deg_d + nod) * f
    else:
        # c: read ttf, hnode, LO, hnode_new, adf_v, del_v, del_h,
        #    gather adf_h; write del_v, del_h
        b += (7 * nod + vint + deg_d + 2 * nod) * f
    return b


def grid_points(mesh: Mesh) -> int:
    """Active node-layers per step — the throughput unit of BASELINE.json."""
    return int(np.sum(mesh.nlev_nod - 1))


def stress2rhs_bytes(mesh: Mesh, itemsize: int = 4) -> int:
    """Modeled HBM traffic of one stress2rhs call (the second workload;
    reference src/reference.cpp:440-480), reference-style accounting:

    per element — 3 stress components, area+ice activity, metric factor,
    6 shape-function gradients read once (:445-462); the element->node
    scatter of the 2 (u, v) contributions at 3 corners counted once per
    incidence like the reference's per-edge models
    (kernels/fct_ale_b1_horizontal.py:70-89); per node — inv_areamass,
    rhs_a, rhs_m reads and the U/V writes (:464-476); int32 connectivity."""
    E, N = mesh.n_elems, mesh.n_nodes
    f = itemsize
    b = (3 + 1 + 1 + 6) * E * f  # element inputs
    b += 2 * 3 * E * f  # u/v contribution per corner incidence
    b += 5 * N * f  # inv_areamass, rhs_a, rhs_m reads; U, V writes
    b += 3 * 4 * E  # elem_nodes int32
    return b


def fct_ale_step_bytes_physical(ps, iter_yn: bool = False,
                                Tb: int = 1) -> "int | None":
    """PHYSICAL HBM traffic of one fused-chain step in the packed+DIA
    production form — operands each kernel actually moves, per tile,
    including the K-slab inflation of edge fields and the window-overlap
    factor (tiles read [rows, J*128] windows wider than the tile).

    This is the honest numerator for a measured-roof fraction: unlike
    :func:`fct_ale_step_bytes` (the reference-style stage model, which
    counts stage-boundary arrays the fused kernels never materialize —
    reference kernels/fct_ale_a1.py:93-95 counts actual kernel traffic),
    it counts exactly the tile/window transfers the four pallas_calls
    issue.  Returns None when the mesh does not run the packed+DIA form
    (ps.pack_K == 0 or ps.a3f_dia_D == 0).

    ``ps``: a PallasStatic (ops/pallas/step.py).

    ``Tb`` > 1 (multi-tracer batch): returns the PER-TRACER bytes — the
    shared operands (int maps, gl window, hnode/hnode_new/area_inv tiles)
    are fetched once per tile and re-used across the tracer-minor grid
    axis, so they amortize by Tb; counting them in full against the
    per-tracer time would inflate the roofline fraction.
    """
    if not getattr(ps, "pack_K", 0) or not getattr(ps, "a3f_dia_D", 0):
        return None
    f = 4  # the packed chain is f32-only
    Np, Lp, Lpv, K = ps.Np, ps.Lp, ps.Lpv, ps.pack_K
    T = Np // ps.tile
    W_un = ps.a3f_un_nblocks * 128  # K1 DIA window width
    W_sc = ps.pack_J_sc * 128  # K2/K4 packed scatter window width
    W_g = ps.pack_J_g * 128  # K3 gather window width
    P_s, P_g = sum(ps.pack_Pk_s), sum(ps.pack_Pk_g)
    D = ps.a3f_dia_D

    b = 0   # per-tracer bytes
    sh = 0  # shared bytes (amortize by Tb in batched runs)
    if Tb > 1 and not (getattr(ps, "fuse_k34", False) and not ps.fuse_k12):
        # the Tb-aware accounting below covers only the fused-K34
        # production path; same contract as the other not-covered cases
        return None
    if ps.fuse_k12 and D and ps.pack_K:
        # fused K1+K2: LO/ttf tile + window reads, adf_v/area_inv tiles,
        # F window; writes tt + pm + av (+resid)
        b += f * (2 * Lp * Np + 2 * Lp * T * W_un)
        b += f * (Lpv * Np + Lp * Np + K * Lp * T * W_sc)
        b += 4 * (D * Np + Np + K * Np + P_s * Np)
        b += f * (2 * Lp * Np + 2 * Lp * Np + Lpv * Np)
        if iter_yn:
            b += f * Lpv * Np
    else:
        # K1 bounds (DIA DMA): aligned LO/ttf tiles + one [2Lp, W] window
        # copy per tile; writes tt [2Lp, Np]; int: dia_lev + nlev row
        b += f * (2 * Lp * Np + 2 * Lp * T * W_un)
        sh += 4 * (D * Np + Np)
        b += f * 2 * Lp * Np
        # K2 limit: adf_v + tt tiles, F window; writes pm + av
        # (area_inv tile + int maps are shared)
        b += f * (Lpv * Np + 2 * Lp * Np + K * Lp * T * W_sc)
        sh += f * Lp * Np + 4 * (Np + K * Np + P_s * Np)
        b += f * (2 * Lp * Np + Lpv * Np)
        if iter_yn:
            b += f * Lpv * Np  # adf_v residual output
    if getattr(ps, "fuse_k34", False):
        # fused K3+K4 (update_fused_pallas): one pass — F window + pm
        # window + int (lev/indicator) window + K4's node tiles; writes
        # o1 + o2 + limited F (+resid).  K3's separate aligned F read,
        # its own pm window and its limited-F write/re-read disappear.
        # Per-tracer: avl + 4 node tiles (ttf, lo, del_v, del_h) + F/pm
        # windows + outputs; shared: hnode, hnode_new, area_inv tiles,
        # gl window, int maps.
        W_pm = ps.pack_J_pm * 128
        Rg = -(-(K + max(P_g, 1)) // 8) * 8
        b += f * (Lpv * Np + 4 * Lp * Np + K * Lp * T * W_sc)
        sh += f * 3 * Lp * Np
        b += f * 2 * Lp * T * W_pm
        sh += 4 * (Rg * T * W_sc + Np + K * Np + P_s * Np)
        b += f * (2 * Lp * Np + K * Lp * Np)
        if iter_yn:
            b += f * K * Lp * Np
        return b + (sh + Tb - 1) // Tb
    # K3 b3h: F tile + pm window; writes limited F (+resid)
    b += f * (K * Lp * Np + 2 * Lp * T * W_g) + 4 * (K * Np + P_g * Np)
    b += f * K * Lp * Np
    if iter_yn:
        b += f * K * Lp * Np
    # K4 update: av_lim + 7 node tiles + F window; writes o1 + o2
    b += f * (Lpv * Np + 7 * Lp * Np + K * Lp * T * W_sc)
    b += 4 * (Np + K * Np + P_s * Np)
    b += f * 2 * Lp * Np
    return b + sh


def stress2rhs_bytes_physical(tile: int, J: int, K: int, P: int,
                              Np: int) -> int:
    """PHYSICAL HBM traffic of one packed stress2rhs call
    (kernels_packed.stress2rhs_packed_pallas): the [K*16, J*128] element
    window each tile DMA-stages (incl. the 5 zero pad rows per slot and
    the window-overlap factor), the per-pair indicator / home-corner int32
    tiles, node-row inputs, and the [8, Np] output (6 pad rows included).
    The honest numerator against :func:`measure_stream_bandwidth` — the
    modeled :func:`stress2rhs_bytes` counts the reference-style algorithmic
    minimum instead."""
    f = 4
    T = Np // tile
    b = f * T * K * 16 * J * 128     # staged element windows
    b += 4 * (P * Np + K * Np)       # pair indicators + home-corner codes
    b += f * 3 * Np                  # inv_areamass, rhs_a, rhs_m rows
    b += f * 8 * Np                  # U/V output (padded to 8 sublanes)
    return b


def measure_stream_bandwidth(n_bytes: int = 2 ** 29, iters: int = 20,
                             reps: int = 3) -> float:
    """Measured streaming bandwidth of THIS device (bytes/s): a
    scan-chained triad (2 reads + 1 write of a large f32 array per step).
    This is the rig's real memory roof — the datasheet peak is not
    reachable through this tunnel — and the denominator for the honest
    physical-bytes fraction.

    Measured on the tunneled v5e: the apparent bandwidth grows with the
    buffer (update/triad: 100/149 GB/s at 64 MiB, 236/307 at 256 MiB,
    345/422 at 512 MiB), consistent with a ~1 ms fixed per-pass overhead
    over a ~500 GB/s stream rate; 512 MiB triad is the closest analogue
    of the step kernels' multi-operand passes."""
    import time

    import jax
    import jax.numpy as jnp

    n = n_bytes // 4
    x = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(a, b):
        def body(c, _):
            return c + b * 0.5, None

        y, _ = jax.lax.scan(body, a, None, length=iters)
        return y

    def sync(y):
        return float(y[0])

    sync(run(x, b))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(x, b))
        best = min(best, time.perf_counter() - t0)
    return 3.0 * n_bytes * iters / best

"""Full FCT-ALE step as THREE fused Pallas kernels (round 5; vlimit 1/2/3).

K1 bounds (a1+a2+a3) -> K2 limit (b1v+b1h+b2+b3v) -> K34 (b3h limiting +
stage c on one scatter window; kernels_packed.update_fused_pallas).  The
SPLIT K3 (b3h) -> K4 (stage c) forms remain the sharded path, where the
separate K3 overlaps the halo collective.  Every elementwise stage runs
inside the neighboring gather/scatter kernel on the same tiles
(kernels.py), so the only XLA work left is input padding/unpadding.
Scatters and endpoint gathers use split narrow/wide windows enabled by
the canonical edge orientation (mesh/topology.py).

b3-vertical is fused into K2 (before the halo-exchange point): it is
node-local and owned-node limiter factors are final pre-exchange — the
reference runs it concurrently with the MPI wait for the same reason
(src/fesom2-accelerate.cu:342-356).  In sharded runs K3 also runs on the
PRE-exchange factors (interior edges need no halo values) and only the
boundary edge tiles are recomputed after the collective
(kernels.b3h_fixup_pallas) — so the exchange overlaps the full b3h interior
sweep, the reference's inter_comm overlap generalized to the biggest
post-b2 kernel.

All entity axes are padded to tile/window multiples (see plan.py); the level
axis is padded to the f32 sublane multiple (8) at kernel boundaries.
All vlimit variants (1/2/3) run in-kernel (the reference only
productionized vlimit 1 on GPU: src/reference.cpp:297).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh.topology import Mesh
from fesom2_accelerate_tpu.ops.meshdata import MeshData, build_mesh_data
from fesom2_accelerate_tpu.ops.pallas import kernels
from fesom2_accelerate_tpu.ops.pallas import kernels_packed
from fesom2_accelerate_tpu.ops.pallas.packed import build_packed_plan
from fesom2_accelerate_tpu.ops.pallas.plan import (
    BLOCK,
    build_gather_plan,
)

# default tiles by kernel form (tuner-justified, perf/tune_*.json): the
# packed/DIA kernels are window-DMA-bound — larger tiles amortize the
# per-tile window over-read ((tile + 2*bandwidth) / tile), so the default
# picks the LARGEST tile the mesh supports (round-4 sweep on CORE2 with
# the double-buffered DMA windows: 2.46 ms at 2048 vs 2.61 at 1024 vs
# 2.70 at 4096) — while the one-hot fallback's contraction cost grows
# with window width, favoring small tiles (round-2 sweep).
TILE = 2048
TILE_MID = 1024
TILE_ONEHOT = 256


def default_tile(n_nodes: int) -> int:
    """Largest default tile with at least two tiles of nodes."""
    for t in (TILE, TILE_MID):
        if n_nodes >= 2 * t:
            return t
    return TILE_ONEHOT


def _ru(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack_rows(vals: np.ndarray, extra: np.ndarray, sel: np.ndarray,
               min_k: int = 1):
    """Left-pack the selected entries of each row.

    Returns (packed_vals, packed_extra, packed_valid) with K =
    max(row selection count, min_k) columns."""
    counts = sel.sum(axis=1)
    K = max(int(counts.max()) if len(counts) else 0, min_k)
    M = sel.shape[0]
    offs = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    r, _ = np.nonzero(sel)
    slot = np.arange(len(r)) - offs[r]
    out_v = np.zeros((M, K), dtype=vals.dtype)
    out_e = np.zeros((M, K), dtype=extra.dtype)
    out_m = np.zeros((M, K), dtype=bool)
    out_v[r, slot] = vals[sel]
    out_e[r, slot] = extra[sel]
    out_m[r, slot] = True
    return out_v, out_e, out_m


def _tile_cols(a: np.ndarray) -> np.ndarray:
    """[T, C] per-tile index rows -> [T, C, 1] column vectors.

    Kernels build one-hots by lane-broadcasting a [C, 1] column (the natural
    TPU broadcast); block (1, C, 1) is a legal Pallas TPU block shape."""
    return a[:, :, None].copy()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasData:
    """Device arrays for the Pallas step (data fields only; sizes static)."""

    md: MeshData  # padded-mesh MeshData for the XLA-path stages

    nlev_nod_row: jax.Array  # [1, Np]
    area_inv_pad: jax.Array  # [Lp, Np]

    # K1 bounds (gather neighbor nodes -> nodes, with per-neighbor level
    # bounds = nlev_edge of the connecting edge), split by neighbor side
    a3f_lidx_lo: jax.Array
    a3f_lev_lo: jax.Array
    a3f_lidx_hi: jax.Array
    a3f_lev_hi: jax.Array
    a3f_wb: jax.Array  # [T_n, 2] (lo window block, hi window block)

    # K1 bounds, DIA form (used when PallasStatic.a3f_dia_D > 0): per-tile
    # window block + per-offset lane shifts, and per-(node, offset) edge
    # level bounds (kernels.bounds_dia_pallas)
    a3f_dia_wb: jax.Array  # [T_n, 1 + D] int32
    a3f_dia_lev: jax.Array  # [T_n, D, tile] int32

    # edge scatter windows per node tile (K2, K4): lo = edges starting in
    # the tile (narrow), hi = edges ending in it (bandwidth-wide)
    ne_wb: jax.Array  # [T_n, 2] (lo block, hi block)
    starts_col: jax.Array  # [Edp, 1] (-1 pad)
    ends_col: jax.Array  # [Edp, 1]
    nlev_edge_row: jax.Array  # [1, Edp]

    # K3 b3h (gather endpoint factors -> edges), split by endpoint role
    b3h_lidx_lo: jax.Array
    b3h_lidx_hi: jax.Array
    b3h_wb: jax.Array  # [T_e, 2]

    # a2 (vlimit 2/3 path): gather nodes -> elements
    a2_lidx: jax.Array
    a2_wb: jax.Array  # [T_e2, 2] (col 0 used)
    nlev_elem_row: jax.Array  # [1, Ep]

    # boundary edge tiles for the post-exchange b3h fixup (sharded runs);
    # [max(n_fix_tiles, 1)] int32, padded by repeating a boundary tile.
    # In packed mode these are NODE-tile ids of the packed layout.
    b3h_fix_ids: jax.Array

    # PACKED (home-slot DIA) edge layout (ops/pallas/packed.py; active when
    # PallasStatic.pack_K > 0, zero-size dummies otherwise)
    pk_lev_home: jax.Array  # [K, Np] int32 edge level bound at (slot, home)
    pk_einv: jax.Array  # [K, Np] int32 edge id at (slot, home), -1 absent
    pk_eslot: jax.Array  # [Edp] int32 slot per edge (-1 pad)
    pk_sc_wb: jax.Array  # [T_n, 1 + 2*P_s] int32
    pk_sc_lev: jax.Array  # [T_n, P_s, tile] int32
    pk_g_wb: jax.Array  # [T_n, 1 + 2*P_g] int32
    pk_g_ind: jax.Array  # [T_n, P_g, tile] int32
    # fused K3+K4 (PallasStatic.fuse_k34): pm window blocks + windowed
    # lev/indicator slab (packed.py PackedPlan.pm_wb / gl_int)
    pk_pm_wb: jax.Array  # [T_n, 1 + P_g] int32
    pk_gl_int: jax.Array  # [K + P_g, Np] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PadMaps:
    """The subset of PallasData that pad_state/unpad_state actually use
    (edge<->slot maps).  The sharded solver keeps a HOST-side stacked copy:
    in multi-process runs the full stacked PallasData is a global sharded
    array, and padding through it would make init_state outputs span
    non-addressable devices."""

    pk_einv: jax.Array  # [K, Np]
    pk_eslot: jax.Array  # [Edp]
    starts_col: jax.Array  # [Edp, 1]


def pad_maps(pd: PallasData) -> PadMaps:
    return PadMaps(pk_einv=pd.pk_einv, pk_eslot=pd.pk_eslot,
                   starts_col=pd.starts_col)


@dataclasses.dataclass(frozen=True)
class PallasStatic:
    """Static companion of PallasData (shapes / window block counts)."""

    tile: int
    L: int
    Lp: int
    Lpv: int
    N: int
    Np: int
    E: int
    Ep: int
    Ed: int
    Edp: int
    K_lo: int  # max below-side neighbor count
    K_hi: int  # max above-side neighbor count
    a3f_lo_nblocks: int
    a3f_hi_nblocks: int
    ne_lo_nblocks: int
    ne_hi_nblocks: int
    b3h_lo_nblocks: int
    b3h_hi_nblocks: int
    a2_nblocks: int
    # number of boundary edge tiles to recompute after the halo exchange
    # (0 = unsharded: K3 consumes the exchanged factors directly)
    n_fix_tiles: int = 0
    # one-hot contraction chunk widths (gathers / scatters)
    chunk: int = 1024
    scatter_chunk: int = 512
    # K1 DIA form: union-window block count and max distinct neighbor
    # offsets per tile (0 = use the one-hot form)
    a3f_un_nblocks: int = 2
    a3f_dia_D: int = 0
    # GLOBAL DIA offset values (union over tiles; pad 0s), length D.  The
    # lane residue of offset o's window shift is o mod 128 on every tile
    # (128-aligned tile starts / window blocks), so the kernels roll by
    # STATIC shifts derived from this tuple
    a3f_dia_offs: tuple = ()
    # PACKED edge layout for K2/K3/K4 (0 = one-hot kernels); per-slot
    # (slot, offset) pair counts are static so kernels unroll over them
    pack_K: int = 0
    pack_Pk_s: tuple = ()
    pack_Pk_g: tuple = ()
    pack_J_sc: int = 0
    pack_J_g: int = 0
    # fused K3+K4 (kernels_packed.update_fused_pallas): b3h limiting
    # computed on K4's scatter window, removing K3's separate pass.  Needs
    # the global gather-pair layout; static per-pair offsets below drive
    # the kernel's static lane rolls.  Not used when an exchange callback
    # is present (the sharded interior/fixup split needs the separate K3)
    pack_J_pm: int = 0
    pack_g_offs: tuple = ()
    fuse_k34: bool = False
    # run K1+K2 as one fused kernel (needs DIA + packed).  Off by default:
    # fusing removes the tt HBM round-trip (~100 MB/step) but the merged
    # kernel's 30+ window inputs degrade Mosaic's input pipelining — on the
    # real chip the fused step measured ~0.5 ms SLOWER at tile=1024
    # (2.90 vs 2.40 ms).  Kept selectable for future Mosaic versions.
    fuse_k12: bool = False


def _pad_mesh(mesh: Mesh, Np: int, Ep: int, Edp: int) -> Mesh:
    """Mesh with entity arrays padded: nlev 1/0 so all masks are false,
    indices 0 (always valid)."""

    def pad_rows(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    area = np.ones((mesh.nl, Np))
    area[:, : mesh.n_nodes] = mesh.area
    return Mesh(
        nl=mesh.nl,
        elem_nodes=pad_rows(mesh.elem_nodes, Ep),
        edges=pad_rows(mesh.edges, Edp),
        edge_tri=pad_rows(mesh.edge_tri, Edp, fill=-1),
        nlev_elem=pad_rows(mesh.nlev_elem, Ep, fill=1),
        nlev_nod=pad_rows(mesh.nlev_nod, Np, fill=1),
        nlev_edge=pad_rows(mesh.nlev_edge, Edp, fill=0),
        node_elems=pad_rows(mesh.node_elems, Np, fill=-1),
        node_elems_pos=pad_rows(mesh.node_elems_pos, Np, fill=-1),
        node_elems_num=pad_rows(mesh.node_elems_num, Np),
        node_edges=pad_rows(mesh.node_edges, Np, fill=-1),
        node_edges_sign=pad_rows(mesh.node_edges_sign, Np),
        node_edges_num=pad_rows(mesh.node_edges_num, Np),
        node_xy=pad_rows(mesh.node_xy, Np),
        area=area,
        area_inv=1.0 / area,
    )


def build_pallas_data(mesh: Mesh, common: "PallasStatic | None" = None, *,
                      tile: "int | None" = None,
                      chunk: "int | None" = None,
                      scatter_chunk: "int | None" = None,
                      dia_max: int = 40,
                      pack_pmax: int = 16,
                      fuse_k12: bool = False,
                      fuse_k34: bool = True,
                      halo_mask: "np.ndarray | None" = None,
                      xp=jnp):
    """Returns (PallasData, PallasStatic).

    ``common``: force this static layout (padded sizes / window block
    counts) instead of deriving it from the mesh — used by the sharded
    solver so every part compiles to the SAME program.  The mesh's own
    requirements must not exceed it.

    ``tile`` / ``chunk`` / ``scatter_chunk``: kernel launch configuration
    (defaults: module TILE / kernels chunk defaults) — the sweep axes of
    the tuner (utils/tuning.py), replacing the reference's per-kernel
    block/tiling spaces (kernels/fct_ale_a1.py:67-73).

    ``halo_mask`` [n_nodes] bool: marks halo node columns (sharded runs).
    Edge tiles touching a halo node become the post-exchange b3h fixup
    set; all other edge tiles run before/during the exchange."""
    tile_arg = tile
    if common is not None:
        tile = common.tile
        chunk = common.chunk
        scatter_chunk = common.scatter_chunk
    else:
        if tile is None:
            # the big tile only pays off when it amortizes the window
            # over-read across many tiles; small meshes keep the small tile
            # (also keeps the interpret-mode CPU test suite fast)
            tile = default_tile(mesh.n_nodes)
        chunk = 1024 if chunk is None else chunk
        scatter_chunk = 512 if scatter_chunk is None else scatter_chunk
    # the static DIA lane residues (rem = offset mod BLOCK, see the K1 plan
    # below) and the packed-plan window arithmetic both require tile starts
    # to be BLOCK-aligned — an unaligned tile would compute silently wrong
    # bounds, so fail loudly here instead
    assert tile % BLOCK == 0, (
        f"tile={tile} must be a multiple of {BLOCK} (128-aligned tile "
        "starts are assumed by the static DIA lane rolls)")
    N, E, Ed, L = mesh.n_nodes, mesh.n_elems, mesh.n_edges, mesh.n_layers
    ones3 = np.ones((E, 3), dtype=bool)
    nd_valid = np.arange(mesh.node_edges.shape[1])[None, :] < (
        mesh.node_edges_num[:, None]
    )
    nd_idx = np.where(mesh.node_edges >= 0, mesh.node_edges, 0)
    # endpoint roles (canonical orientation: n0 < n1, topology.py): the node
    # is n0 of the incident edge iff sign == +1
    is_lo = nd_valid & (mesh.node_edges_sign == 1)
    is_hi = nd_valid & (mesh.node_edges_sign == -1)

    # other endpoint + connecting-edge level bound per node->edge incidence,
    # split by side: neighbors below the node (narrow window: ids within
    # [n - bw, n)) vs above — each side gathers over its own window
    ends = mesh.edges[nd_idx]  # [N, KD, 2]
    nd_other = np.where(mesh.node_edges_sign == 1, ends[:, :, 1],
                        ends[:, :, 0])
    nd_other = np.where(nd_valid, nd_other, 0)
    nd_lev = np.where(nd_valid, mesh.nlev_edge[nd_idx], 0)
    n_col = np.arange(N, dtype=np.int64)[:, None]
    k_lo_min = common.K_lo if common is not None else 1
    k_hi_min = common.K_hi if common is not None else 1
    oth_lo, lev_lo, val_lo = _pack_rows(
        nd_other, nd_lev, nd_valid & (nd_other < n_col), k_lo_min)
    oth_hi, lev_hi, val_hi = _pack_rows(
        nd_other, nd_lev, nd_valid & (nd_other > n_col), k_hi_min)
    K_lo, K_hi = oth_lo.shape[1], oth_hi.shape[1]

    ones1 = np.ones((Ed, 1), dtype=bool)

    # pass 1: window block counts from raw index arrays
    p_a3f_lo = build_gather_plan(oth_lo, val_lo, tile, N)
    p_a3f_hi = build_gather_plan(oth_hi, val_hi, tile, N)
    # union window for the DIA form (needs >= tile lanes for the shifts)
    p_a3f_un = build_gather_plan(nd_other, nd_valid, tile, N,
                                 min_blocks=tile // BLOCK)
    p_lo = build_gather_plan(nd_idx, is_lo, tile, Ed)
    p_hi = build_gather_plan(nd_idx, is_hi, tile, Ed)
    p_b3lo = build_gather_plan(mesh.edges[:, 0:1], ones1, tile, N)
    p_b3hi = build_gather_plan(mesh.edges[:, 1:2], ones1, tile, N)
    p_a2 = build_gather_plan(mesh.elem_nodes, ones3, tile, N)
    j_a3f_lo, j_a3f_hi = p_a3f_lo.nblocks, p_a3f_hi.nblocks
    j_a3f_un = p_a3f_un.nblocks
    j_lo, j_hi = p_lo.nblocks, p_hi.nblocks
    j_b3lo, j_b3hi, j_a2 = p_b3lo.nblocks, p_b3hi.nblocks, p_a2.nblocks

    if common is not None:
        assert (j_a3f_lo <= common.a3f_lo_nblocks
                and j_a3f_hi <= common.a3f_hi_nblocks
                and j_a3f_un <= common.a3f_un_nblocks
                and j_lo <= common.ne_lo_nblocks
                and j_hi <= common.ne_hi_nblocks
                and j_b3lo <= common.b3h_lo_nblocks
                and j_b3hi <= common.b3h_hi_nblocks
                and j_a2 <= common.a2_nblocks
                and K_lo == common.K_lo and K_hi == common.K_hi), (
            "mesh exceeds common static")
        j_a3f_lo, j_a3f_hi = common.a3f_lo_nblocks, common.a3f_hi_nblocks
        j_a3f_un = common.a3f_un_nblocks
        j_lo, j_hi = common.ne_lo_nblocks, common.ne_hi_nblocks
        j_b3lo, j_b3hi = common.b3h_lo_nblocks, common.b3h_hi_nblocks
        j_a2 = common.a2_nblocks
        Np, Ep, Edp = common.Np, common.Ep, common.Edp
        assert common.L == L and common.N == N and common.Ed == Ed
    else:
        # entity padding: a multiple of TILE (output tiles) that also covers
        # the last tile's window reads ((max win_block + J) * BLOCK columns)
        j_node = max(j_a3f_lo, j_a3f_hi, j_a3f_un, j_b3lo, j_b3hi, j_a2)
        j_edge = max(j_lo, j_hi)
        Np = _ru(_ru(N, BLOCK) + j_node * BLOCK, tile)
        Edp = _ru(_ru(Ed, BLOCK) + j_edge * BLOCK, tile)
        Ep = _ru(E, tile)

    def pad_rows(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    # pass 2: rebuild with padded output rows so tile counts match the
    # padded entity sizes exactly
    p_a3f_lo = build_gather_plan(
        pad_rows(oth_lo, Np), pad_rows(val_lo, Np, False), tile, Np,
        min_blocks=j_a3f_lo,
    )
    p_a3f_hi = build_gather_plan(
        pad_rows(oth_hi, Np), pad_rows(val_hi, Np, False), tile, Np,
        min_blocks=j_a3f_hi,
    )
    p_a3f_un = build_gather_plan(
        pad_rows(nd_other, Np), pad_rows(nd_valid, Np, False), tile, Np,
        min_blocks=j_a3f_un,
    )
    p_lo = build_gather_plan(
        pad_rows(nd_idx, Np), pad_rows(is_lo, Np, False), tile, Edp,
        min_blocks=j_lo,
    )
    p_hi = build_gather_plan(
        pad_rows(nd_idx, Np), pad_rows(is_hi, Np, False), tile, Edp,
        min_blocks=j_hi,
    )
    p_b3lo = build_gather_plan(
        pad_rows(mesh.edges[:, 0:1], Edp), pad_rows(ones1, Edp, False),
        tile, Np, min_blocks=j_b3lo,
    )
    p_b3hi = build_gather_plan(
        pad_rows(mesh.edges[:, 1:2], Edp), pad_rows(ones1, Edp, False),
        tile, Np, min_blocks=j_b3hi,
    )
    p_a2 = build_gather_plan(
        pad_rows(mesh.elem_nodes, Ep), pad_rows(ones3, Ep, False), tile, Np,
        min_blocks=j_a2,
    )
    for p, j in ((p_a3f_lo, j_a3f_lo), (p_a3f_hi, j_a3f_hi),
                 (p_a3f_un, j_a3f_un), (p_lo, j_lo),
                 (p_hi, j_hi), (p_b3lo, j_b3lo), (p_b3hi, j_b3hi),
                 (p_a2, j_a2)):
        assert p.nblocks == j

    # ---- K1 DIA plan: distinct neighbor offsets per node tile -----------
    # (kernels.bounds_dia_pallas; picked over the one-hot form when the max
    # distinct-offset count D stays small — true for any bandwidth-ordered
    # mesh, where neighbor offsets cluster around +-1 and +-bandwidth)
    T_n = Np // tile
    W_un = j_a3f_un * BLOCK
    dv = np.where(nd_valid, nd_other - n_col, 0)
    dv_p = pad_rows(dv, Np)
    lev_p = pad_rows(nd_lev, Np)
    val_p = pad_rows(nd_valid, Np, False)
    # offsets are GLOBAL (the union over tiles), not per-tile: tile starts
    # and window blocks are 128-aligned, so the lane residue of offset o's
    # shift is o mod 128 for EVERY tile — a compile-time constant.  Static
    # rolls measured ~28% faster than dynamic ones on the whole kernel
    # (Mosaic lowers dynamic lane rolls expensively); the price is D =
    # |union| instead of the per-tile max, a few extra masked slots on
    # meshes whose boundary rows add offsets.
    offs_all = np.unique(dv_p[val_p]) if val_p.any() else np.zeros(
        0, np.int64)
    D_own = max(len(offs_all), 1)
    if common is not None:
        D = common.a3f_dia_D
        offs_union = np.asarray(common.a3f_dia_offs, dtype=np.int64)
        assert D == 0 or (
            D_own <= D and np.isin(offs_all, offs_union).all()
        ), "part exceeds common DIA offset set"
    else:
        D = D_own if D_own <= dia_max else 0
        offs_union = offs_all
        if D and len(offs_union) == 0:
            offs_union = np.zeros(1, np.int64)  # degenerate: one dummy slot
    if D:
        # wb row layout: [win_block, q_0..q_{D-1}]; shift s = 128*q + rem
        # with rem static per offset (aligned load + static lane roll)
        offs_pad = np.zeros(D, dtype=np.int64)
        offs_pad[:len(offs_union)] = offs_union
        # offset value -> slot (first occurrence; 0 appears only as pad —
        # a node is never its own neighbor, so dv == 0 never occurs)
        pos = {}
        for idx, o in enumerate(offs_pad):
            pos.setdefault(int(o), idx)
        dia_wb = np.zeros((T_n, 1 + D), dtype=np.int32)
        dia_wb[:, 0] = p_a3f_un.win_block
        dia_lev = np.zeros((T_n, D, tile), dtype=np.int32)
        for t in range(T_n):
            t0 = t * tile
            s = (t0 + offs_pad - int(p_a3f_un.win_block[t]) * BLOCK) % W_un
            dia_wb[t, 1:1 + D] = s // BLOCK
            sl = slice(t0, t0 + tile)
            r, k = np.nonzero(val_p[sl])
            slot = np.fromiter((pos[int(x)] for x in dv_p[sl][r, k]),
                               dtype=np.int64, count=len(r))
            dia_lev[t, slot, r] = lev_p[sl][r, k]
        dia_offs = tuple(int(o) for o in offs_pad)
    else:
        dia_wb = np.zeros((T_n, 2), dtype=np.int32)
        dia_lev = np.zeros((T_n, 1, tile), dtype=np.int32)
        dia_offs = ()

    # ---- PACKED edge plan (K2/K3/K4 home-slot DIA form, packed.py) -------
    if common is not None:
        if common.pack_K:
            pk = build_packed_plan(
                mesh, tile, Np,
                common_static=(common.pack_K, common.pack_Pk_s,
                               common.pack_Pk_g, common.pack_J_sc,
                               common.pack_J_g),
                # fused sharded mode: every part bakes the COMMON offsets
                # so the fused kernel's static rolls match across parts
                common_g_offs=(common.pack_g_offs
                               if common.fuse_k34 else None),
                common_J_pm=(common.pack_J_pm
                             if common.fuse_k34 else None),
            )
        else:
            pk = None
    else:
        pk = build_packed_plan(mesh, tile, Np, pack_pmax=pack_pmax)
        if pk is None and tile_arg is None and tile != TILE_ONEHOT:
            # no offset regularity -> one-hot kernels, whose contraction
            # cost favors the small default tile: rebuild at that size
            return build_pallas_data(
                mesh, tile=TILE_ONEHOT, chunk=chunk,
                scatter_chunk=scatter_chunk, dia_max=dia_max,
                pack_pmax=pack_pmax, halo_mask=halo_mask, xp=xp,
            )

    # per-incidence level bounds in the same k-major column layout as the
    # plans (one per side)
    T_n = Np // tile

    def lev_km(lev, K):
        lp = pad_rows(lev, Np)
        return lp.reshape(T_n, tile, K).transpose(0, 2, 1).reshape(
            T_n, K * tile
        )

    padded = _pad_mesh(mesh, Np, Ep, Edp)
    md = build_mesh_data(padded, dtype=jnp.float32, xp=xp)

    starts = pad_rows(mesh.edges[:, 0:1], Edp, fill=-1).astype(np.int32)
    ends = pad_rows(mesh.edges[:, 1:2], Edp, fill=-1).astype(np.int32)

    Lp = _ru(L, 8)
    area_inv = np.zeros((Lp, Np), np.float32)
    area_inv[:L] = np.asarray(padded.area_inv)[:L]

    def wb2(pa, pb=None):
        a = pa.win_block
        b = pb.win_block if pb is not None else pa.win_block
        return np.stack([a, b], axis=1)

    # boundary tiles: tiles whose edges touch a halo node — the only b3h
    # work that must wait for the exchanged limiter factors (reference
    # post_comm, src/fesom2-accelerate.cu:358-379).  Edge tiles in the
    # one-hot layout; home NODE tiles in the packed layout.
    if halo_mask is not None and halo_mask.any():
        etouch = halo_mask[mesh.edges].any(axis=1)
        if pk is not None:
            tbnd = np.zeros(T_n, dtype=bool)
            tbnd[(mesh.edges[etouch, 0] // tile)] = True
            fix_ids = np.nonzero(tbnd)[0].astype(np.int32)
        else:
            ebnd = np.zeros(Edp, dtype=bool)
            ebnd[:Ed] = etouch
            fix_ids = np.nonzero(ebnd.reshape(-1, tile).any(axis=1))[0]
            fix_ids = fix_ids.astype(np.int32)
    else:
        fix_ids = np.zeros(0, dtype=np.int32)
    n_fix = len(fix_ids)
    n_fix_pad = max(common.n_fix_tiles if common is not None else n_fix, 1)
    if common is not None:
        assert n_fix <= common.n_fix_tiles or common.n_fix_tiles == 0, (
            "part has more boundary tiles than the common static")
    # pad by repeating a boundary tile (idempotent recompute); all-interior
    # parts pad with tile 0 — harmless, it is rewritten with identical data
    pad_id = fix_ids[0] if n_fix else np.int32(0)
    fix_ids = np.concatenate(
        [fix_ids, np.full(n_fix_pad - n_fix, pad_id, np.int32)])

    if pk is not None:
        pk_arrays = dict(
            pk_lev_home=pk.lev_home,
            pk_einv=pk.einv,
            pk_eslot=pad_rows(pk.eslot, Edp, fill=-1),
            pk_sc_wb=pk.sc_wb,
            pk_sc_lev=pk.sc_lev,
            pk_g_wb=pk.g_wb,
            pk_g_ind=pk.g_ind,
            pk_pm_wb=pk.pm_wb,
            pk_gl_int=pk.gl_int,
        )
        pk_static = dict(pack_K=pk.K, pack_Pk_s=pk.Pk_s, pack_Pk_g=pk.Pk_g,
                         pack_J_sc=pk.J_sc, pack_J_g=pk.J_g,
                         pack_J_pm=pk.J_pm, pack_g_offs=pk.g_offs,
                         fuse_k34=(common.fuse_k34 if common is not None
                                   else (fuse_k34 and pk.fused_ok)))
    else:
        pk_arrays = dict(
            pk_lev_home=np.zeros((1, Np), np.int32),
            pk_einv=np.full((1, Np), -1, np.int32),
            pk_eslot=np.full(Edp, -1, np.int32),
            pk_sc_wb=np.zeros((T_n, 1), np.int32),
            pk_sc_lev=np.zeros((T_n, 1, tile), np.int32),
            pk_g_wb=np.zeros((T_n, 1), np.int32),
            pk_g_ind=np.zeros((T_n, 1, tile), np.int32),
            pk_pm_wb=np.zeros((T_n, 1), np.int32),
            pk_gl_int=np.zeros((1, Np), np.int32),
        )
        pk_static = dict(pack_K=0, pack_Pk_s=(), pack_Pk_g=(),
                         pack_J_sc=0, pack_J_g=0, pack_J_pm=0,
                         pack_g_offs=(), fuse_k34=False)

    i32 = functools.partial(xp.asarray, dtype=jnp.int32)
    data = PallasData(
        md=md,
        nlev_nod_row=i32(padded.nlev_nod[None, :]),
        area_inv_pad=xp.asarray(area_inv),
        a3f_lidx_lo=i32(_tile_cols(p_a3f_lo.local_idx)),
        a3f_lev_lo=i32(_tile_cols(lev_km(lev_lo, K_lo))),
        a3f_lidx_hi=i32(_tile_cols(p_a3f_hi.local_idx)),
        a3f_lev_hi=i32(_tile_cols(lev_km(lev_hi, K_hi))),
        a3f_wb=i32(wb2(p_a3f_lo, p_a3f_hi)),
        a3f_dia_wb=i32(dia_wb),
        a3f_dia_lev=i32(dia_lev),
        ne_wb=i32(wb2(p_lo, p_hi)),
        starts_col=i32(starts),
        ends_col=i32(ends),
        nlev_edge_row=i32(padded.nlev_edge[None, :]),
        b3h_lidx_lo=i32(_tile_cols(p_b3lo.local_idx)),
        b3h_lidx_hi=i32(_tile_cols(p_b3hi.local_idx)),
        b3h_wb=i32(wb2(p_b3lo, p_b3hi)),
        a2_lidx=i32(_tile_cols(p_a2.local_idx)),
        a2_wb=i32(wb2(p_a2)),
        nlev_elem_row=i32(padded.nlev_elem[None, :]),
        b3h_fix_ids=i32(fix_ids),
        **{k: i32(v) for k, v in pk_arrays.items()},
    )
    static = PallasStatic(
        tile=tile,
        L=L, Lp=Lp, Lpv=_ru(L + 1, 8), N=N, Np=Np, E=E, Ep=Ep, Ed=Ed,
        Edp=Edp, K_lo=K_lo, K_hi=K_hi,
        a3f_lo_nblocks=j_a3f_lo, a3f_hi_nblocks=j_a3f_hi,
        ne_lo_nblocks=j_lo, ne_hi_nblocks=j_hi,
        b3h_lo_nblocks=j_b3lo, b3h_hi_nblocks=j_b3hi, a2_nblocks=j_a2,
        n_fix_tiles=(common.n_fix_tiles if common is not None else n_fix),
        chunk=chunk, scatter_chunk=scatter_chunk,
        a3f_un_nblocks=j_a3f_un, a3f_dia_D=D, a3f_dia_offs=dia_offs,
        fuse_k12=(common.fuse_k12 if common is not None else fuse_k12),
        **pk_static,
    )
    return data, static


# --------------------------------------------------------------------------
# padded-step orchestration
# --------------------------------------------------------------------------


def _dia_rems(ps: PallasStatic) -> tuple:
    """Static lane residues of the global DIA offsets (kernels roll by
    these at compile time; see PallasStatic.a3f_dia_offs)."""
    return tuple(int(o) % BLOCK for o in ps.a3f_dia_offs)


def _rowpad(a, Lp):
    L = a.shape[0]
    if L == Lp:
        return a
    return jnp.pad(a, ((0, Lp - L), (0, 0)))


def _stack2(a, b, Lp):
    """[L, X] pair -> [2Lp, X] stacked with zero row padding."""
    return jnp.concatenate([_rowpad(a, Lp), _rowpad(b, Lp)], axis=0)


# field layout by NAME (shapes are ambiguous on small meshes where the
# padded node and edge extents coincide)
_EDGE_FIELDS = frozenset({"fct_adf_h", "fct_adf_h_limited"})
_IFACE_FIELDS = frozenset({"fct_adf_v", "fct_adf_v_limited"})  # L+1 rows


def _pack_edge_field(ps: PallasStatic, pd: PallasData, v) -> jax.Array:
    """Natural edge field [L, Ed] -> packed [K*Lp, Np] (slot-major slabs,
    column = home node; see packed.py)."""
    K, Lp = ps.pack_K, ps.Lp
    vp = _rowpad(jnp.pad(v, ((0, 0), (0, 1))), Lp)  # sentinel column Ed
    idx = jnp.where(pd.pk_einv >= 0, pd.pk_einv, ps.Ed)
    g = jnp.take(vp, idx.reshape(-1), axis=1).reshape(Lp, K, ps.Np)
    return jnp.moveaxis(g, 1, 0).reshape(K * Lp, ps.Np)


def _unpack_edge_field(ps: PallasStatic, pd: PallasData, vp) -> jax.Array:
    """Packed [K*Lp, Np] -> natural edge field [L, Ed].

    Invalid/padded edges (``nlev_edge == 0``, sharded part padding) hold
    slot 0 / home 0 but never claimed a (slot, home) cell — their lanes
    are zeroed so they can't surface another edge's flux."""
    K, Lp = ps.pack_K, ps.Lp
    v3 = vp.reshape(K, Lp, ps.Np)
    slot = pd.pk_eslot[:ps.Ed]
    home = pd.starts_col[:ps.Ed, 0]
    owner = pd.pk_einv[slot, home] == jnp.arange(ps.Ed, dtype=jnp.int32)
    return jnp.where(owner[None, :], v3[slot, :, home].T[:ps.L], 0.0)


def pad_state(ps: PallasStatic, state: dict,
              pd: "PallasData | None" = None) -> dict:
    """Natural-shape state -> padded kernel layout ([Lp|Lpv, Np] node /
    [Lp, Edp] edge, or packed [K*Lp, Np] edge when ``ps.pack_K``).

    Keeping the scan state padded removes all per-step pad/slice XLA work.
    ``pd`` is required in packed mode (edge<->slot maps live there)."""
    out = {}
    for k, v in state.items():
        if k in _EDGE_FIELDS:
            if ps.pack_K:
                out[k] = _pack_edge_field(ps, pd, v)
            else:
                out[k] = _rowpad(jnp.pad(v, ((0, 0), (0, ps.Edp - ps.Ed))),
                                 ps.Lp)
        else:
            rows = ps.Lpv if k in _IFACE_FIELDS else ps.Lp
            out[k] = _rowpad(jnp.pad(v, ((0, 0), (0, ps.Np - ps.N))), rows)
    return out


def unpad_state(ps: PallasStatic, pstate: dict,
                pd: "PallasData | None" = None) -> dict:
    """Padded kernel layout -> natural shapes."""
    out = {}
    for k, v in pstate.items():
        if k in _EDGE_FIELDS:
            if ps.pack_K:
                out[k] = _unpack_edge_field(ps, pd, v)
            else:
                out[k] = v[:ps.L, :ps.Ed]
        else:
            rows = ps.L + 1 if k in _IFACE_FIELDS else ps.L
            out[k] = v[:rows, :ps.N]
    return out


def fct_ale_step_pallas_padded(pd: PallasData, ps: PallasStatic,
                               cfg: FctAleConfig, state: dict,
                               exchange=None) -> dict:
    """One step on PADDED state (see pad_state) — the scan-carry form.

    ``exchange`` (sharded runs): callback filling halo columns of a padded
    node array from their owners; applied to the limiter factors between
    K2 and K3 (the reference's MPI exchange_nod point, docs/
    refactoring.md:199-200) and to the updated fct_LO in iterative mode.
    When the boundary-tile plan exists (``ps.n_fix_tiles > 0``), K3 runs
    on PRE-exchange factors concurrently with the collective and only the
    boundary edge tiles are redone afterwards."""
    L, Lp, Lpv = ps.L, ps.Lp, ps.Lpv

    ttf = state["ttf"]
    fct_LO = state["fct_LO"]
    adf_v = state["fct_adf_v"]
    adf_h_pad = state["fct_adf_h"]

    dt = float(cfg.dt)
    # K1: a1 + fused a2+a3 (no UV array): neighbor max over incident
    # edges with per-neighbor level bounds; all vlimit variants in-kernel.
    # DIA form (masked lane shifts per distinct neighbor offset) when the
    # mesh ordering admits it, one-hot MXU contraction otherwise.
    # K2: b1 vertical + b1 horizontal scatter + b2 + b3 vertical.  Packed
    # (home-slot DIA) form when the mesh ordering admits it — aligned slab
    # sums + per-(slot, offset) lane shifts instead of one-hot contractions
    # (kernels_packed.py); the residual output is skipped outside iterative
    # mode in the packed form (one fewer [Lpv, Np] HBM write).
    # When BOTH DIA and packed apply, K1 and K2 run as ONE fused kernel —
    # K2 needs the bounds only on its own tile, so the fusion is
    # recompute-free and removes the tt round-trip through HBM.
    if ps.fuse_k12 and ps.a3f_dia_D and ps.pack_K:
        lim = kernels_packed.limit_fused_pallas(
            fct_LO, ttf, adf_v, pd.area_inv_pad, adf_h_pad, pd.a3f_dia_wb,
            pd.a3f_dia_lev, pd.pk_lev_home, pd.pk_sc_lev, pd.pk_sc_wb,
            pd.nlev_nod_row, tile=ps.tile, J_un=ps.a3f_un_nblocks,
            D=ps.a3f_dia_D, rems=_dia_rems(ps), J_sc=ps.pack_J_sc,
            K=ps.pack_K,
            Pk=ps.pack_Pk_s, L=L, dt=dt, flux_eps=float(cfg.flux_eps),
            vlimit=cfg.vlimit, iter_yn=cfg.iter_yn,
        )
        tt, pm, av_out = lim[0], lim[1], lim[2]
        av2 = lim[3] if cfg.iter_yn else None
    else:
        if ps.a3f_dia_D:
            # manually double-buffered window DMA: one wide copy per array
            # per tile instead of J block transfers (~1.7x on the chip)
            tt = kernels.bounds_dia_dma_pallas(
                fct_LO, ttf, pd.a3f_dia_wb, pd.a3f_dia_lev,
                pd.nlev_nod_row, tile=ps.tile, nblocks=ps.a3f_un_nblocks,
                D=ps.a3f_dia_D, rems=_dia_rems(ps), vlimit=cfg.vlimit,
            )
        else:
            tt = kernels.bounds_pallas(
                fct_LO, ttf, pd.a3f_lidx_lo, pd.a3f_lev_lo, pd.a3f_lidx_hi,
                pd.a3f_lev_hi, pd.a3f_wb, pd.nlev_nod_row, tile=ps.tile,
                nblocks_lo=ps.a3f_lo_nblocks, nblocks_hi=ps.a3f_hi_nblocks,
                K_lo=ps.K_lo, K_hi=ps.K_hi, vlimit=cfg.vlimit,
                chunk=ps.chunk,
            )
        if ps.pack_K:
            lim = kernels_packed.limit_packed_pallas(
                adf_v, tt, pd.area_inv_pad, adf_h_pad, pd.pk_lev_home,
                pd.pk_sc_lev, pd.pk_sc_wb, pd.nlev_nod_row, tile=ps.tile,
                J=ps.pack_J_sc, K=ps.pack_K, Pk=ps.pack_Pk_s, L=L, dt=dt,
                flux_eps=float(cfg.flux_eps), iter_yn=cfg.iter_yn,
            )
            pm, av_out = lim[0], lim[1]
            av2 = lim[2] if cfg.iter_yn else None
        else:
            pm, av_out, av2 = kernels.limit_pallas(
                adf_v, tt, pd.area_inv_pad, adf_h_pad, pd.starts_col,
                pd.ends_col, pd.nlev_edge_row, pd.ne_wb, pd.nlev_nod_row,
                tile=ps.tile, nblocks_lo=ps.ne_lo_nblocks,
                nblocks_hi=ps.ne_hi_nblocks, L=L, dt=dt,
                flux_eps=float(cfg.flux_eps), iter_yn=cfg.iter_yn,
                chunk=ps.scatter_chunk,
            )

    overlap = exchange is not None and ps.n_fix_tiles > 0
    pm_x = exchange(pm) if exchange is not None else pm

    if ps.pack_K and ps.fuse_k34 and (exchange is None
                                       or ps.n_fix_tiles == 0):
        # Fused K3+K4: the b3h limiting runs on K4's F scatter window and
        # stage c consumes the limited values from VMEM — K3's separate
        # pass (aligned F read + pm window + limited-F write/re-read)
        # disappears.  With an exchange present (fused SHARDED mode,
        # ShardedFctAleSolver(fused=True)): the collective completes
        # first and the fused kernel consumes the exchanged factors —
        # the right trade when the interconnect is fast (an ICI halo
        # slab is ~0.2 MB ≈ microseconds, vs ~0.2 ms of forgone fusion
        # the split-overlap path pays to hide it).
        fused = kernels_packed.update_fused_pallas(
            av_out, ttf, state["hnode"], state["hnode_new"], fct_LO,
            state["del_ttf_advvert"], state["del_ttf_advhoriz"],
            pd.area_inv_pad, pm_x, adf_h_pad, pd.pk_gl_int,
            pd.pk_lev_home, pd.pk_sc_lev, pd.pk_sc_wb, pd.pk_pm_wb,
            pd.nlev_nod_row, tile=ps.tile, J=ps.pack_J_sc,
            J_pm=ps.pack_J_pm, K=ps.pack_K, Pk_s=ps.pack_Pk_s,
            Pk_g=ps.pack_Pk_g, g_offs=ps.pack_g_offs, L=L, dt=dt,
            iter_yn=cfg.iter_yn,
        )
        o1, o2, adf_h_lim_pad = fused[0], fused[1], fused[2]
        adf_h_resid_pad = fused[3] if cfg.iter_yn else None
        return _assemble_step_out(ps, cfg, state, tt, pm_x, av_out, av2,
                                  adf_h_lim_pad, adf_h_resid_pad, o1, o2,
                                  exchange)

    # K3: b3 horizontal (endpoint gathers).  With a boundary plan it
    # consumes the PRE-exchange factors — interior edges see only owned
    # endpoints, whose factors the exchange does not change — so the
    # collective and this sweep are dataflow-independent and overlap.
    if ps.pack_K:
        adf_h_lim_pad, adf_h_resid_pad = kernels_packed.b3h_packed_pallas(
            pm if overlap else pm_x, adf_h_pad, pd.pk_lev_home, pd.pk_g_ind,
            pd.pk_g_wb, tile=ps.tile, J=ps.pack_J_g, K=ps.pack_K,
            Pk=ps.pack_Pk_g, with_resid=cfg.iter_yn,
        )
        if overlap:
            # redo only the halo-touching home-node tiles
            adf_h_lim_pad, adf_h_resid_pad = (
                kernels_packed.b3h_packed_fixup_pallas(
                    pm_x, adf_h_pad, adf_h_lim_pad, adf_h_resid_pad,
                    pd.pk_lev_home, pd.pk_g_ind, pd.pk_g_wb,
                    pd.b3h_fix_ids, tile=ps.tile, J=ps.pack_J_g,
                    K=ps.pack_K, Pk=ps.pack_Pk_g, with_resid=cfg.iter_yn,
                ))
    else:
        adf_h_lim_pad, adf_h_resid_pad = kernels.b3h_pallas(
            pm if overlap else pm_x, adf_h_pad, pd.b3h_lidx_lo,
            pd.b3h_lidx_hi, pd.b3h_wb, pd.nlev_edge_row, tile=ps.tile,
            nblocks_lo=ps.b3h_lo_nblocks, nblocks_hi=ps.b3h_hi_nblocks,
            chunk=ps.chunk,
        )
        if overlap:
            # redo only the halo-touching edge tiles with exchanged factors
            adf_h_lim_pad, adf_h_resid_pad = kernels.b3h_fixup_pallas(
                pm_x, adf_h_pad, adf_h_lim_pad, adf_h_resid_pad,
                pd.b3h_lidx_lo, pd.b3h_lidx_hi, pd.b3h_wb, pd.b3h_fix_ids,
                pd.nlev_edge_row, tile=ps.tile,
                nblocks_lo=ps.b3h_lo_nblocks,
                nblocks_hi=ps.b3h_hi_nblocks, chunk=ps.chunk,
            )

    # K4: stage c
    if ps.pack_K:
        o1, o2 = kernels_packed.update_packed_pallas(
            av_out, ttf, state["hnode"], state["hnode_new"], fct_LO,
            state["del_ttf_advvert"], state["del_ttf_advhoriz"],
            pd.area_inv_pad, adf_h_lim_pad, pd.pk_lev_home, pd.pk_sc_lev,
            pd.pk_sc_wb, pd.nlev_nod_row, tile=ps.tile, J=ps.pack_J_sc,
            K=ps.pack_K, Pk=ps.pack_Pk_s, L=L, dt=dt, iter_yn=cfg.iter_yn,
        )
    else:
        o1, o2 = kernels.update_pallas(
            av_out, ttf, state["hnode"], state["hnode_new"], fct_LO,
            state["del_ttf_advvert"], state["del_ttf_advhoriz"],
            pd.area_inv_pad, adf_h_lim_pad, pd.starts_col, pd.ends_col,
            pd.nlev_edge_row, pd.ne_wb, pd.nlev_nod_row, tile=ps.tile,
            nblocks_lo=ps.ne_lo_nblocks, nblocks_hi=ps.ne_hi_nblocks, L=L,
            dt=dt, iter_yn=cfg.iter_yn, chunk=ps.scatter_chunk,
        )

    return _assemble_step_out(ps, cfg, state, tt, pm_x, av_out, av2,
                              adf_h_lim_pad, adf_h_resid_pad, o1, o2,
                              exchange)


def _assemble_step_out(ps, cfg, state, tt, pm_x, av_out, av2,
                       adf_h_lim_pad, adf_h_resid_pad, o1, o2, exchange):
    """Shared output-dict assembly of the padded step (single source for
    the fused-K34, split, and batched paths' iter/non-iter key sets)."""
    Lp = ps.Lp
    out = dict(state)
    out.update(
        fct_ttf_max=tt[:Lp], fct_ttf_min=tt[Lp:],
        fct_plus=pm_x[:Lp], fct_minus=pm_x[Lp:],
    )
    if cfg.iter_yn:
        if exchange is not None:
            # halo refresh so the next iteration's a1 sees current fct_LO
            o1 = exchange(o1)
        out.update(
            fct_LO=o1,
            fct_adf_v=av2,
            fct_adf_h=adf_h_resid_pad,
            fct_adf_v_limited=av_out,
            fct_adf_h_limited=adf_h_lim_pad,
        )
    else:
        out.update(
            fct_adf_v=av_out,
            fct_adf_h=adf_h_lim_pad,
            del_ttf_advvert=o1,
            del_ttf_advhoriz=o2,
        )
    return out


def fct_ale_step_pallas(pd: PallasData, ps: PallasStatic, cfg: FctAleConfig,
                        state: dict) -> dict:
    """Same contract as model.fct_ale.fct_ale_step, Pallas-accelerated.

    Input state fields have natural (unpadded) shapes; outputs match.  For
    multi-step runs, pad once with :func:`pad_state`, scan
    :func:`fct_ale_step_pallas_padded`, and unpad once at the end."""
    return unpad_state(
        ps, fct_ale_step_pallas_padded(pd, ps, cfg, pad_state(ps, state, pd)),
        pd,
    )


# --------------------------------------------------------------------------
# multi-tracer batching
# --------------------------------------------------------------------------
# The host model advects MANY tracers per timestep over ONE mesh; the
# reference is a full library call per tracer (``ttf`` per call, reference
# include/fesom2-accelerate.h:213-236).  Here Tb tracers run through ONE
# compiled chain: per-tracer fields are row-stacked ([Tb*rows, Np]) and the
# kernels take a (tiles, tracers) grid with tracer MINOR, so connectivity /
# int-map tiles keep their block index across tracer steps (the pipeline
# re-uses them in VMEM) and per-pass fixed costs amortize by Tb.  Geometry
# (hnode, hnode_new) is shared.

_BATCH_SHARED = frozenset({"hnode", "hnode_new"})


def _pack_edge_field_batched(ps: PallasStatic, pd: PallasData, v):
    """[Tb, L, Ed] -> packed row-stacked [Tb*K*Lp, Np].  One flat column
    take over [Tb*Lp, Ed+1] — vmapping the single-tracer gather instead
    lowers to a batched gather XLA:TPU executes ~100x slower (measured
    60-100 ms/call on core2)."""
    K, Lp = ps.pack_K, ps.Lp
    Tb, L = v.shape[0], v.shape[1]
    vp = jnp.pad(v, ((0, 0), (0, Lp - L), (0, 1)))  # sentinel col Ed
    idx = jnp.where(pd.pk_einv >= 0, pd.pk_einv, ps.Ed).reshape(-1)
    g = jnp.take(vp.reshape(Tb * Lp, ps.Ed + 1), idx, axis=1)
    return g.reshape(Tb, Lp, K, ps.Np).transpose(0, 2, 1, 3).reshape(
        Tb * K * Lp, ps.Np)


def _unpack_edge_field_batched(ps: PallasStatic, pd: PallasData, vp,
                               Tb: int):
    """Packed row-stacked [Tb*K*Lp, Np] -> [Tb, L, Ed] (invalid-edge lanes
    zeroed, see _unpack_edge_field)."""
    K, Lp = ps.pack_K, ps.Lp
    v2 = vp.reshape(Tb, K, Lp, ps.Np).transpose(0, 2, 1, 3).reshape(
        Tb * Lp, K * ps.Np)
    slot = pd.pk_eslot[:ps.Ed]
    home = pd.starts_col[:ps.Ed, 0]
    out = jnp.take(v2, slot * ps.Np + home, axis=1).reshape(
        Tb, Lp, ps.Ed)[:, :ps.L]
    owner = pd.pk_einv[slot, home] == jnp.arange(ps.Ed, dtype=jnp.int32)
    return jnp.where(owner[None, None, :], out, 0.0)


def pad_state_batched(ps: PallasStatic, state: dict,
                      pd: "PallasData | None" = None) -> dict:
    """Batched state -> padded row-stacked kernel layout.

    Per-tracer fields have a leading tracer axis ([Tb, L, N] family);
    ``hnode``/``hnode_new`` are per-mesh ([L, N], shared by all tracers)."""
    out = {}
    for k, v in state.items():
        if k in _BATCH_SHARED:
            out[k] = pad_state(ps, {k: v}, pd)[k]
            continue
        Tb, L = v.shape[0], v.shape[1]
        if k in _EDGE_FIELDS:
            if ps.pack_K:
                out[k] = _pack_edge_field_batched(ps, pd, v)
            else:
                out[k] = jnp.pad(
                    v, ((0, 0), (0, ps.Lp - L), (0, ps.Edp - ps.Ed))
                ).reshape(Tb * ps.Lp, ps.Edp)
        else:
            rows = ps.Lpv if k in _IFACE_FIELDS else ps.Lp
            out[k] = jnp.pad(
                v, ((0, 0), (0, rows - L), (0, ps.Np - ps.N))
            ).reshape(Tb * rows, ps.Np)
    return out


def unpad_state_batched(ps: PallasStatic, pstate: dict, Tb: int,
                        pd: "PallasData | None" = None) -> dict:
    """Padded row-stacked layout -> natural shapes with tracer axis."""
    out = {}
    for k, v in pstate.items():
        if k in _BATCH_SHARED:
            out[k] = unpad_state(ps, {k: v}, pd)[k]
            continue
        rows = v.shape[0] // Tb
        if k in _EDGE_FIELDS:
            if ps.pack_K:
                out[k] = _unpack_edge_field_batched(ps, pd, v, Tb)
            else:
                out[k] = v.reshape(Tb, rows, v.shape[-1])[:, :ps.L, :ps.Ed]
        else:
            take = ps.L + 1 if k in _IFACE_FIELDS else ps.L
            out[k] = v.reshape(Tb, rows, v.shape[-1])[:, :take, :ps.N]
    return out


def fct_ale_step_pallas_padded_batched(pd: PallasData, ps: PallasStatic,
                                       cfg: FctAleConfig, state: dict,
                                       Tb: int, exchange=None) -> dict:
    """One step on PADDED row-stacked multi-tracer state (scan-carry form).

    Requires the packed+DIA production forms — the batched grids exist
    only for those kernels.  ``exchange`` (sharded runs): halo-fill
    callback applied to the ROW-STACKED limiter factors (all Tb tracers'
    halos move in ONE collective — the exchange latency amortizes across
    the batch); with a boundary-tile plan the split K3 runs on
    pre-exchange factors and only the fixup waits, exactly like the
    single-tracer sharded step."""
    assert ps.pack_K and ps.a3f_dia_D, (
        "batched tracers require the packed+DIA production forms")
    L, Lp, Lpv = ps.L, ps.Lp, ps.Lpv

    ttf = state["ttf"]
    fct_LO = state["fct_LO"]
    adf_v = state["fct_adf_v"]
    adf_h_pad = state["fct_adf_h"]
    dt = float(cfg.dt)

    tt = kernels.bounds_dia_dma_pallas(
        fct_LO, ttf, pd.a3f_dia_wb, pd.a3f_dia_lev, pd.nlev_nod_row,
        tile=ps.tile, nblocks=ps.a3f_un_nblocks, D=ps.a3f_dia_D,
        rems=_dia_rems(ps), vlimit=cfg.vlimit, Tb=Tb,
    )
    lim = kernels_packed.limit_packed_pallas(
        adf_v, tt, pd.area_inv_pad, adf_h_pad, pd.pk_lev_home,
        pd.pk_sc_lev, pd.pk_sc_wb, pd.nlev_nod_row, tile=ps.tile,
        J=ps.pack_J_sc, K=ps.pack_K, Pk=ps.pack_Pk_s, L=L, dt=dt,
        flux_eps=float(cfg.flux_eps), iter_yn=cfg.iter_yn, Tb=Tb,
    )
    pm, av_out = lim[0], lim[1]
    av2 = lim[2] if cfg.iter_yn else None

    overlap = exchange is not None and ps.n_fix_tiles > 0
    pm_x = exchange(pm) if exchange is not None else pm

    if ps.fuse_k34 and (exchange is None or ps.n_fix_tiles == 0):
        fused = kernels_packed.update_fused_pallas(
            av_out, ttf, state["hnode"], state["hnode_new"], fct_LO,
            state["del_ttf_advvert"], state["del_ttf_advhoriz"],
            pd.area_inv_pad, pm_x, adf_h_pad, pd.pk_gl_int, pd.pk_lev_home,
            pd.pk_sc_lev, pd.pk_sc_wb, pd.pk_pm_wb, pd.nlev_nod_row,
            tile=ps.tile, J=ps.pack_J_sc, J_pm=ps.pack_J_pm, K=ps.pack_K,
            Pk_s=ps.pack_Pk_s, Pk_g=ps.pack_Pk_g, g_offs=ps.pack_g_offs,
            L=L, dt=dt, iter_yn=cfg.iter_yn, Tb=Tb,
        )
        o1, o2, adf_h_lim_pad = fused[0], fused[1], fused[2]
        adf_h_resid_pad = fused[3] if cfg.iter_yn else None
    else:
        # split K3 (+ boundary fixup) -> K4: the sharded-overlap structure
        adf_h_lim_pad, adf_h_resid_pad = kernels_packed.b3h_packed_pallas(
            pm if overlap else pm_x, adf_h_pad, pd.pk_lev_home, pd.pk_g_ind,
            pd.pk_g_wb, tile=ps.tile, J=ps.pack_J_g, K=ps.pack_K,
            Pk=ps.pack_Pk_g, with_resid=cfg.iter_yn, Tb=Tb,
        )
        if overlap:
            adf_h_lim_pad, adf_h_resid_pad = (
                kernels_packed.b3h_packed_fixup_pallas(
                    pm_x, adf_h_pad, adf_h_lim_pad, adf_h_resid_pad,
                    pd.pk_lev_home, pd.pk_g_ind, pd.pk_g_wb,
                    pd.b3h_fix_ids, tile=ps.tile, J=ps.pack_J_g,
                    K=ps.pack_K, Pk=ps.pack_Pk_g, with_resid=cfg.iter_yn,
                    Tb=Tb,
                ))
        o1, o2 = kernels_packed.update_packed_pallas(
            av_out, ttf, state["hnode"], state["hnode_new"], fct_LO,
            state["del_ttf_advvert"], state["del_ttf_advhoriz"],
            pd.area_inv_pad, adf_h_lim_pad, pd.pk_lev_home, pd.pk_sc_lev,
            pd.pk_sc_wb, pd.nlev_nod_row, tile=ps.tile, J=ps.pack_J_sc,
            K=ps.pack_K, Pk=ps.pack_Pk_s, L=L, dt=dt, iter_yn=cfg.iter_yn,
            Tb=Tb,
        )

    # per-tracer row-block halves of the stacked [Tb*2Lp, Np] arrays
    # (diagnostic outputs; DCE'd inside scans, whose carry is state-only)
    def halves(x):
        x3 = x.reshape(Tb, 2 * Lp, x.shape[-1])
        flat = x3.shape[-1]
        return (x3[:, :Lp].reshape(Tb * Lp, flat),
                x3[:, Lp:].reshape(Tb * Lp, flat))

    tmax, tmin = halves(tt)
    plus, minus = halves(pm_x)
    out = dict(state)
    out.update(fct_ttf_max=tmax, fct_ttf_min=tmin,
               fct_plus=plus, fct_minus=minus)
    if cfg.iter_yn:
        if exchange is not None:
            # halo refresh so the next iteration's a1 sees current fct_LO
            o1 = exchange(o1)
        out.update(
            fct_LO=o1, fct_adf_v=av2, fct_adf_h=adf_h_resid_pad,
            fct_adf_v_limited=av_out, fct_adf_h_limited=adf_h_lim_pad,
        )
    else:
        out.update(
            fct_adf_v=av_out, fct_adf_h=adf_h_lim_pad,
            del_ttf_advvert=o1, del_ttf_advhoriz=o2,
        )
    return out


def fct_ale_step_pallas_batched(pd: PallasData, ps: PallasStatic,
                                cfg: FctAleConfig, state: dict) -> dict:
    """Multi-tracer FCT-ALE step: per-tracer fields carry a leading tracer
    axis ([Tb, L, N] family), ``hnode``/``hnode_new`` are shared [L, N].
    Semantics = Tb independent :func:`fct_ale_step_pallas` calls; one
    compiled chain."""
    Tb = state["ttf"].shape[0]
    pstate = pad_state_batched(ps, state, pd)
    out = fct_ale_step_pallas_padded_batched(pd, ps, cfg, pstate, Tb)
    return unpad_state_batched(ps, out, Tb, pd)

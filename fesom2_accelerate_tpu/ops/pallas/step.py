"""Full FCT-ALE step with Pallas kernels for the gather/scatter stages.

Orchestrates the padded kernel pipeline: Pallas handles a2, a3 (vlimit 1),
b1-horizontal, b3-horizontal and the c-horizontal edge sum (the irregular
stages); the purely elementwise / vertical stages (a1, b1v, b2, b3v,
c epilogues) stay in jnp where XLA fuses them optimally.

All entity axes are padded to tile/window multiples (see plan.py); the level
axis is padded to the f32 sublane multiple (8) only at kernel boundaries.
vlimit 2/3 fall back to the XLA a3 (the reference only productionized
vlimit 1: src/reference.cpp:297).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh.topology import Mesh
from fesom2_accelerate_tpu.ops import stages
from fesom2_accelerate_tpu.ops.meshdata import MeshData, build_mesh_data
from fesom2_accelerate_tpu.ops.pallas import kernels
from fesom2_accelerate_tpu.ops.pallas.plan import (
    BLOCK,
    GatherPlan,
    build_gather_plan,
)

TILE = 256


def _ru(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_cols(a: np.ndarray) -> np.ndarray:
    """[T, C] per-tile index rows -> [T, C, 1] column vectors.

    Kernels build one-hots by lane-broadcasting a [C, 1] column (the natural
    TPU broadcast); block (1, C, 1) is a legal Pallas TPU block shape."""
    return a[:, :, None].copy()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasData:
    """Device arrays for the Pallas step (data fields only; sizes static)."""

    md: MeshData  # padded-mesh MeshData for the jnp stages

    # a2 (gather nodes -> elements)
    a2_lidx: jax.Array
    a2_wb: jax.Array
    nlev_elem_row: jax.Array  # [1, Ep]

    # a3 (gather elements -> nodes)
    a3_lidx: jax.Array
    a3_wb: jax.Array
    nlev_nod_row: jax.Array  # [1, Np]

    # edge windows per node tile (b1h, c_h)
    ne_wb: jax.Array
    starts_col: jax.Array  # [Edp, 1] (-1 pad)
    ends_col: jax.Array  # [Edp, 1]
    nlev_edge_row: jax.Array  # [1, Edp]

    # b3h (gather nodes -> edges)
    b3h_lidx: jax.Array
    b3h_wb: jax.Array

    # a3 fused (gather neighbor nodes -> nodes, with per-neighbor level
    # bounds = nlev_edge of the connecting edge)
    a3f_lidx: jax.Array
    a3f_lev: jax.Array
    a3f_wb: jax.Array


@dataclasses.dataclass(frozen=True)
class PallasStatic:
    """Static companion of PallasData (shapes / window block counts)."""

    L: int
    Lp: int
    N: int
    Np: int
    E: int
    Ep: int
    Ed: int
    Edp: int
    K: int  # max node->elem degree
    KD: int  # max node->edge degree
    a2_nblocks: int
    a3_nblocks: int
    ne_nblocks: int
    b3h_nblocks: int
    a3f_nblocks: int


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


def build_pallas_data(mesh: Mesh):
    """Returns (PallasData, PallasStatic)."""
    N, E, Ed, L = mesh.n_nodes, mesh.n_elems, mesh.n_edges, mesh.n_layers
    ones3 = np.ones((E, 3), dtype=bool)
    ne_valid = np.arange(mesh.node_elems.shape[1])[None, :] < (
        mesh.node_elems_num[:, None]
    )
    nd_valid = np.arange(mesh.node_edges.shape[1])[None, :] < (
        mesh.node_edges_num[:, None]
    )
    ne_idx = np.where(mesh.node_elems >= 0, mesh.node_elems, 0)
    nd_idx = np.where(mesh.node_edges >= 0, mesh.node_edges, 0)
    edges_valid = np.ones((Ed, 2), dtype=bool)

    # other endpoint + connecting-edge level bound per node->edge incidence
    ends = mesh.edges[nd_idx]  # [N, KD, 2]
    nd_other = np.where(mesh.node_edges_sign == 1, ends[:, :, 1],
                        ends[:, :, 0])
    nd_other = np.where(nd_valid, nd_other, 0)
    nd_lev = np.where(nd_valid, mesh.nlev_edge[nd_idx], 0)

    # pass 1: window block counts from raw index arrays
    p_a2 = build_gather_plan(mesh.elem_nodes, ones3, TILE, N)
    p_a3 = build_gather_plan(ne_idx, ne_valid, TILE, E)
    p_ne = build_gather_plan(nd_idx, nd_valid, TILE, Ed)
    p_b3h = build_gather_plan(mesh.edges, edges_valid, TILE, N)
    p_a3f = build_gather_plan(nd_other, nd_valid, TILE, N)
    j_a2, j_a3 = p_a2.nblocks, p_a3.nblocks
    j_ne, j_b3h = p_ne.nblocks, p_b3h.nblocks
    j_a3f = p_a3f.nblocks

    # entity padding: a multiple of TILE (output tiles) that also covers the
    # last tile's window reads ((max win_block + J) * BLOCK columns)
    j_node = max(j_a2, j_b3h, j_a3f)
    Np = _ru(_ru(N, BLOCK) + j_node * BLOCK, TILE)
    Ep = _ru(_ru(E, BLOCK) + j_a3 * BLOCK, TILE)
    Edp = _ru(_ru(Ed, BLOCK) + j_ne * BLOCK, TILE)

    def pad_rows(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    # pass 2: rebuild with padded output rows so tile counts match the
    # padded entity sizes exactly
    p_a2 = build_gather_plan(
        pad_rows(mesh.elem_nodes, Ep), pad_rows(ones3, Ep, False), TILE, Np,
        min_blocks=j_a2,
    )
    p_a3 = build_gather_plan(
        pad_rows(ne_idx, Np), pad_rows(ne_valid, Np, False), TILE, Ep,
        min_blocks=j_a3,
    )
    p_ne = build_gather_plan(
        pad_rows(nd_idx, Np), pad_rows(nd_valid, Np, False), TILE, Edp,
        min_blocks=j_ne,
    )
    p_b3h = build_gather_plan(
        pad_rows(mesh.edges, Edp), pad_rows(edges_valid, Edp, False), TILE,
        Np, min_blocks=j_b3h,
    )
    p_a3f = build_gather_plan(
        pad_rows(nd_other, Np), pad_rows(nd_valid, Np, False), TILE, Np,
        min_blocks=j_a3f,
    )
    assert p_a2.nblocks == j_a2 and p_a3.nblocks == j_a3
    assert p_ne.nblocks == j_ne and p_b3h.nblocks == j_b3h
    assert p_a3f.nblocks == j_a3f
    # per-incidence level bound in the same k-major column layout as the plan
    KD = nd_other.shape[1]
    lev_p = pad_rows(nd_lev, Np)
    T_n = Np // TILE
    lev_km = lev_p.reshape(T_n, TILE, KD).transpose(0, 2, 1).reshape(
        T_n, KD * TILE
    )

    padded = _pad_mesh(mesh, Np, Ep, Edp)
    md = build_mesh_data(padded, dtype=jnp.float32)

    starts = pad_rows(mesh.edges[:, 0:1], Edp, fill=-1).astype(np.int32)
    ends = pad_rows(mesh.edges[:, 1:2], Edp, fill=-1).astype(np.int32)

    i32 = functools.partial(jnp.asarray, dtype=jnp.int32)
    data = PallasData(
        md=md,
        a2_lidx=i32(_tile_cols(p_a2.local_idx)),
        a2_wb=i32(p_a2.win_block),
        nlev_elem_row=i32(padded.nlev_elem[None, :]),
        a3_lidx=i32(_tile_cols(p_a3.local_idx)),
        a3_wb=i32(p_a3.win_block),
        nlev_nod_row=i32(padded.nlev_nod[None, :]),
        ne_wb=i32(p_ne.win_block),
        starts_col=i32(starts),
        ends_col=i32(ends),
        nlev_edge_row=i32(padded.nlev_edge[None, :]),
        b3h_lidx=i32(_tile_cols(p_b3h.local_idx)),
        b3h_wb=i32(p_b3h.win_block),
        a3f_lidx=i32(_tile_cols(p_a3f.local_idx)),
        a3f_lev=i32(_tile_cols(lev_km)),
        a3f_wb=i32(p_a3f.win_block),
    )
    static = PallasStatic(
        L=L, Lp=_ru(L, 8), N=N, Np=Np, E=E, Ep=Ep, Ed=Ed, Edp=Edp,
        K=mesh.node_elems.shape[1], KD=KD,
        a2_nblocks=j_a2, a3_nblocks=j_a3, ne_nblocks=j_ne,
        b3h_nblocks=j_b3h, a3f_nblocks=j_a3f,
    )
    return data, static


# --------------------------------------------------------------------------
# padded-step orchestration
# --------------------------------------------------------------------------


def _stack2(a, b, Lp):
    """[L, X] pair -> [2Lp, X] stacked with zero row padding."""
    return jnp.concatenate([_rowpad(a, Lp), _rowpad(b, Lp)], axis=0)


def _rowpad(a, Lp):
    L = a.shape[0]
    if L == Lp:
        return a
    return jnp.pad(a, ((0, Lp - L), (0, 0)))


def fct_ale_step_pallas(pd: PallasData, ps: PallasStatic, cfg: FctAleConfig,
                        state: dict) -> dict:
    """Same contract as model.fct_ale.fct_ale_step, Pallas-accelerated.

    Input state fields have natural (unpadded) shapes; outputs match."""
    md = pd.md
    L, Lp, N, Np, Ed, Edp = ps.L, ps.Lp, ps.N, ps.Np, ps.Ed, ps.Edp

    def pad_node(x):
        return jnp.pad(x, ((0, 0), (0, Np - x.shape[1])))

    def pad_edge(x):
        return jnp.pad(x, ((0, 0), (0, Edp - x.shape[1])))

    ttf = pad_node(state["ttf"])
    fct_LO = pad_node(state["fct_LO"])
    adf_v = pad_node(state["fct_adf_v"])
    adf_h = pad_edge(state["fct_adf_h"])
    adf_h_pad = _rowpad(adf_h, Lp)  # [Lp, Edp]

    # a1 (jnp, fused)
    tmax, tmin = stages.a1(md, fct_LO, ttf)

    if cfg.vlimit == 1:
        # fused a2+a3 (no UV array): neighbor max over incident edges with
        # per-neighbor level bounds (see stages._cluster_reduce_via_edges)
        src = _stack2(tmax, tmin, Lp)
        tt = kernels.a3_fused_pallas(
            src, pd.a3f_lidx, pd.a3f_lev, pd.a3f_wb, pd.nlev_nod_row,
            _rowpad(fct_LO, Lp), tile=TILE, nblocks=ps.a3f_nblocks, K=ps.KD,
        )
        tmax2, tmin2 = tt[:L], tt[Lp:Lp + L]
    else:
        src = _stack2(tmax, tmin, Lp)
        UV = kernels.a2_pallas(
            src, pd.a2_lidx, pd.a2_wb, pd.nlev_elem_row,
            tile=TILE, nblocks=ps.a2_nblocks, bignumber=cfg.bignumber,
        )
        UV_max, UV_min = UV[:L], UV[Lp:Lp + L]
        tmax2, tmin2 = stages._a3_vlimit23(
            md, UV_max, UV_min, tmax, fct_LO, widen=(cfg.vlimit == 2)
        )

    # b1 vertical (jnp) + b1 horizontal (pallas)
    plus, minus = stages.b1_vertical(md, adf_v)
    pm = kernels.b1h_pallas(
        _stack2(plus, minus, Lp), adf_h_pad, pd.starts_col, pd.ends_col,
        pd.nlev_edge_row, pd.ne_wb, tile=TILE, nblocks=ps.ne_nblocks,
    )
    plus, minus = pm[:L], pm[Lp:Lp + L]

    # b2 (jnp)
    plus, minus = stages.b2(md, plus, minus, tmax2, tmin2, cfg.dt,
                            cfg.flux_eps)

    # b3 vertical (jnp) + b3 horizontal (pallas)
    adf_v_out, adf_v2 = stages.b3_vertical(md, plus, minus, adf_v,
                                           cfg.iter_yn)
    pm2 = _stack2(plus, minus, Lp)
    adf_h_lim_pad, adf_h_resid_pad = kernels.b3h_pallas(
        pm2, adf_h_pad, pd.b3h_lidx, pd.b3h_wb, pd.nlev_edge_row,
        tile=TILE, nblocks=ps.b3h_nblocks,
    )
    adf_h_lim = adf_h_lim_pad[:L]

    # c (pallas edge sum + jnp epilogue)
    dh = kernels.ch_pallas(
        adf_h_lim_pad, pd.starts_col, pd.ends_col, pd.nlev_edge_row,
        pd.ne_wb, n_nodes_pad=Np, tile=TILE, nblocks=ps.ne_nblocks,
    )[:L]

    def unpad_node(x):
        return x[:, :N]

    def unpad_edge(x):
        return x[:, :Ed]

    out = dict(state)
    out.update(
        fct_ttf_max=unpad_node(tmax2), fct_ttf_min=unpad_node(tmin2),
        fct_plus=unpad_node(plus), fct_minus=unpad_node(minus),
    )
    if cfg.iter_yn:
        hnode_new = pad_node(state["hnode_new"])
        dv = (adf_v_out[:-1] - adf_v_out[1:]) * cfg.dt * md.area_inv
        new_LO = jnp.where(md.node_mask, fct_LO + dv / hnode_new, fct_LO)
        new_LO = new_LO + dh * cfg.dt * md.area_inv / hnode_new
        out.update(
            fct_LO=unpad_node(new_LO),
            fct_adf_v=unpad_node(adf_v2),
            fct_adf_h=unpad_edge(adf_h_resid_pad[:L]),
            fct_adf_v_limited=unpad_node(adf_v_out),
            fct_adf_h_limited=unpad_edge(adf_h_lim),
        )
    else:
        hnode = pad_node(state["hnode"])
        hnode_new = pad_node(state["hnode_new"])
        del_v_in = pad_node(state["del_ttf_advvert"])
        del_h_in = pad_node(state["del_ttf_advhoriz"])
        dv = (
            -ttf * hnode
            + fct_LO * hnode_new
            + (adf_v_out[:-1] - adf_v_out[1:]) * cfg.dt * md.area_inv
        )
        del_v = jnp.where(md.node_mask, del_v_in + dv, del_v_in)
        del_h = del_h_in + dh * cfg.dt * md.area_inv
        out.update(
            fct_adf_v=unpad_node(adf_v_out),
            fct_adf_h=unpad_edge(adf_h_lim),
            del_ttf_advvert=unpad_node(del_v),
            del_ttf_advhoriz=unpad_node(del_h),
        )
    return out

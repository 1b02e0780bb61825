"""Host-side planning for the PACKED (home-slot DIA) edge layout.

The one-hot MXU contraction (kernels.py) is the general TPU answer to the
reference's atomic edge->node scatter (kernels/fct_ale_b1_horizontal.cu:24-27)
and per-edge endpoint gathers (kernels/fct_ale_b3_horizontal.cu:28-39), but on
a bandwidth-ordered mesh a far cheaper form exists — the edge-space analogue
of the K1 DIA trick (kernels.bounds_dia_pallas):

* every edge is **homed** at its first endpoint ``n0`` (canonical orientation,
  mesh/topology.py) in one of K **slots**, so edge fields live as K stacked
  ``[Lp, Np]`` slabs ("packed" layout) instead of one ``[Lp, Edp]`` edge-major
  array;
* the edge->n0 scatter and the n0-endpoint gather become **aligned slab
  reads** — zero contraction work;
* the n1 side is reached through the per-tile set of distinct offsets
  ``d = n1 - n0``: each (slot, offset) pair is one masked dynamic **lane
  shift** of a VMEM window — pure VPU work, linear in the pair count.

The pair count is the admissibility gate: structured/bandwidth-ordered meshes
have ~2-3 offsets per slot (sum <= 8 per tile on the planar presets), while
e.g. an RCM-ordered cylinder reaches hundreds — those meshes keep the one-hot
kernels (the same fallback pattern as ``dia_max`` for K1).

Pair layout is **slot-major and static**: per-slot pair counts ``Pk`` are part
of the compile-time static, so kernels address slot slabs with static row
slices; the per-tile (window block, per-pair q/rem lane shift) live in a
scalar-prefetch array, and per-(pair, node) edge level bounds / indicators in
a ``[T, P, tile]`` tensor (level bound 0 / indicator 0 = no edge: the pair
contributes nothing at that node).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from fesom2_accelerate_tpu.ops.pallas.plan import BLOCK


@dataclasses.dataclass
class PackedPlan:
    """Numpy planning product for the packed edge kernels (K2/K3/K4)."""

    K: int  # home slots (max out-degree under canonical orientation)
    Pk_s: tuple  # per-slot scatter pair counts (static)
    Pk_g: tuple  # per-slot gather pair counts (static)
    J_sc: int  # window blocks for the scatter direction (K2/K4: F windows)
    J_g: int  # window blocks for the gather direction (K3: pm window)

    lev_home: np.ndarray  # [K, Np] int32 nlev_edge at (slot, home); 0 absent
    einv: np.ndarray  # [K, Np] int32 edge id at (slot, home); -1 absent
    eslot: np.ndarray  # [Ed] int32 slot of each edge

    sc_wb: np.ndarray  # [T, 1 + 2*P_s] int32: win_block, q_p..., rem_p...
    sc_lev: np.ndarray  # [T, P_s, tile] int32 signed edge level bound
    g_wb: np.ndarray  # [T, 1 + 2*P_g] int32
    g_ind: np.ndarray  # [T, P_g, tile] int32 0/1 pair-selection indicator

    # ---- fused K3+K4 extras (kernels_packed.update_fused_pallas) ---------
    # gather pairs are GLOBALLY positioned (per-slot sorted offsets), so
    # their lane residues (d mod 128) are compile-time constants and the
    # limiter indicators can live as one global slab windowed per tile
    g_offs: tuple  # [P_g] global gather offsets d (slot-major, sorted)
    maxd: int  # max offset over valid edges (fused gate: maxd < tile)
    J_pm: int  # pm window blocks for the fused kernel
    pm_wb: np.ndarray  # [T, 1 + P_g] int32: pm win_block, q_p = delta+d//128
    gl_int: np.ndarray  # [K + P_g, Np] int32: lev_home rows then global
    # 0/1 pair indicators at home columns (one DMA window serves both)
    fused_ok: bool  # pm window fits the padded source


def _slot_assign(edges: np.ndarray, n_nodes: int,
                 valid: "np.ndarray | None" = None):
    """Canonical home-slot assignment: home = n0, slots ordered by offset
    d = n1 - n0 (deterministic, offset-regular on structured meshes).

    ``valid`` masks out padded/degenerate edges (``nlev_edge == 0``): the
    partition machinery pads every part's edge array to the max count across
    parts with index-0 rows (parallel/partition.py), and homing those at
    node 0 would inflate the slot count to the padding count — the round-3
    failure that silently knocked every sharded run off the packed path.
    Invalid edges get slot 0 and claim no (slot, home) cell."""
    Ed = edges.shape[0]
    if valid is None:
        valid = np.ones(Ed, dtype=bool)
    slot = np.zeros(Ed, dtype=np.int32)
    idx = np.nonzero(valid)[0]
    if not len(idx):
        return slot, 1
    ev = edges[idx]
    d = ev[:, 1] - ev[:, 0]
    order = np.lexsort((d, ev[:, 0]))
    cnt = np.bincount(ev[:, 0], minlength=n_nodes)
    offs = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(cnt, out=offs[1:])
    slot[idx[order]] = (np.arange(len(idx)) - offs[ev[order, 0]]).astype(
        np.int32)
    return slot, int(cnt.max())


def _pair_sets(key_tile: np.ndarray, slot: np.ndarray, d: np.ndarray,
               T: int, K: int):
    """Distinct offsets per (tile, slot) -> (list-of-dicts pairs[t][k] =
    sorted offsets, per-slot max counts)."""
    pairs = [[[] for _ in range(K)] for _ in range(T)]
    key = (key_tile.astype(np.int64) * K + slot) * (2 ** 31) + d
    uniq = np.unique(key)
    ut = uniq // (2 ** 31) // K
    uk = (uniq // (2 ** 31)) % K
    ud = uniq % (2 ** 31)
    for t, k, dv in zip(ut, uk, ud):
        pairs[int(t)][int(k)].append(int(dv))
    Pk = tuple(
        max((len(pairs[t][k]) for t in range(T)), default=0)
        for k in range(K)
    )
    return pairs, Pk


def build_packed_plan(mesh, tile: int, Np: int, *, pack_pmax: int = 16,
                      common: "PackedPlan | None" = None,
                      common_static: "tuple | None" = None,
                      common_g_offs: "tuple | None" = None,
                      common_J_pm: "int | None" = None):
    """Build the packed plan, or return None when the mesh's per-tile
    (slot, offset) pair count exceeds ``pack_pmax`` (no offset regularity —
    keep the one-hot kernels).

    ``common_static``: (K, Pk_s, Pk_g, J_sc, J_g) to force — the sharded
    solver compiles ONE program over all parts (step.build_pallas_data
    ``common``); raises AssertionError if this mesh does not fit.

    ``common_g_offs`` (+ ``common_J_pm``): force the GLOBAL gather-pair
    offsets (slot-major, aligned with the common ``Pk_g``) so every part
    shares the fused-K34 kernel's static lane residues — pairs this part
    does not use stay masked by its zero indicator rows.  Required for
    the fused kernel under shard_map (one program over all parts)."""
    edges = mesh.edges
    Ed = edges.shape[0]
    N = mesh.n_nodes
    T = Np // tile
    evalid = np.asarray(mesh.nlev_edge) > 0  # padded part edges carry 0
    slot, K_own = _slot_assign(edges, N, evalid)
    d = (edges[:, 1] - edges[:, 0]).astype(np.int64)

    ht = edges[:, 0] // tile  # home tile (gather pairs keyed here)
    ot = edges[:, 1] // tile  # other-endpoint tile (scatter pairs keyed here)
    # gather pairs are GLOBAL (union over tiles, per-slot sorted): every
    # tile addresses pair (k, d) at the same position, so the residue
    # d mod 128 is a compile-time constant on 128-aligned tiles — enables
    # static rolls and the windowed global indicator of the fused K3+K4
    # kernel (the K1 global-offset-plan trick).  Structured meshes have
    # near-identical per-tile pair sets, so the global count matches the
    # per-tile max (core2: 8 = 8); meshes where it does not fall back to
    # one-hot through the same pack_pmax gate.
    g_glob = [set() for _ in range(K_own)]
    for kk, dv in zip(slot[evalid], d[evalid]):
        g_glob[int(kk)].add(int(dv))
    Pk_g_own = tuple(len(s) for s in g_glob)
    s_pairs, Pk_s_own = _pair_sets(ot[evalid], slot[evalid], d[evalid], T,
                                   K_own)
    P_g_own = sum(Pk_g_own)
    P_s_own = sum(Pk_s_own)
    maxd = int(d[evalid].max()) if evalid.any() else 0

    if common_static is not None:
        K, Pk_s, Pk_g, J_sc, J_g = common_static
        assert K_own <= K and P_s_own <= sum(Pk_s) and P_g_own <= sum(Pk_g), (
            "part exceeds common packed static")
        # per-slot fits too (slot-major layout is static per slot)
        assert all(a <= b for a, b in zip(Pk_s_own, Pk_s))
        assert all(a <= b for a, b in zip(Pk_g_own, Pk_g))
    else:
        if max(P_s_own, P_g_own) > pack_pmax:
            return None
        K, Pk_s, Pk_g = K_own, Pk_s_own, Pk_g_own
        J_sc = J_g = 0  # sized below

    # ---- home-slot arrays (valid edges only: a padded edge must not claim
    # — or clobber — a real edge's (slot, home) cell) ----------------------
    lev_home = np.zeros((K, Np), dtype=np.int32)
    einv = np.full((K, Np), -1, dtype=np.int32)
    lev_home[slot[evalid], edges[evalid, 0]] = mesh.nlev_edge[evalid]
    einv[slot[evalid], edges[evalid, 0]] = np.arange(Ed, dtype=np.int32)[
        evalid]

    # ---- window sizing ----------------------------------------------------
    # scatter (K2/K4): tile t reads F-slab columns {n1_tile - d} U [t0, t0+TN)
    # gather  (K3):    tile t reads pm columns {n0 + d}       U [t0, t0+TN)
    t0s = np.arange(T, dtype=np.int64) * tile
    # exact per-tile source spans (true edge endpoints, not t0 -/+ d: early
    # tiles have pairs whose offset exceeds t0 — those lanes have no edge
    # and wrap around the window, masked in-kernel like K1's DIA shifts)
    sc_min = t0s.copy()
    np.minimum.at(sc_min, ot[evalid], edges[evalid, 0].astype(np.int64))
    g_max = t0s + tile - 1
    np.maximum.at(g_max, ht[evalid], edges[evalid, 1].astype(np.int64))
    j_sc_own = int(((t0s + tile - 1) // BLOCK - sc_min // BLOCK + 1).max())
    j_g_own = int((g_max // BLOCK - t0s // BLOCK + 1).max())
    if common_static is not None:
        assert j_sc_own <= J_sc and j_g_own <= J_g, (
            "part window exceeds common packed static")
        assert J_sc * BLOCK <= Np and J_g * BLOCK <= Np, (
            "packed window wider than padded source")
    else:
        J_sc, J_g = j_sc_own, j_g_own

    # ---- per-tile wb (win_block, q, rem) + lev/indicator tensors ----------
    P_s, P_g = sum(Pk_s), sum(Pk_g)
    sc_wb = np.zeros((T, 1 + 2 * P_s), dtype=np.int32)
    g_wb = np.zeros((T, 1 + 2 * P_g), dtype=np.int32)
    sc_lev = np.zeros((T, max(P_s, 1), tile), dtype=np.int32)
    g_ind = np.zeros((T, max(P_g, 1), tile), dtype=np.int32)
    # slot-major pair base offsets (static layout shared by all tiles)
    base_s = np.concatenate([[0], np.cumsum(Pk_s)]).astype(int)
    base_g = np.concatenate([[0], np.cumsum(Pk_g)]).astype(int)

    # win_block per tile (clamped into the padded source)
    sc_wbk = np.maximum(0, (t0s + tile) // BLOCK - J_sc)
    g_wbk = np.minimum(t0s // BLOCK, Np // BLOCK - J_g)
    sc_wb[:, 0] = sc_wbk
    g_wb[:, 0] = g_wbk

    # scatter pair positions stay per-tile (sc_lev is keyed at the
    # receiving tile anyway); gather positions are GLOBAL (see above)
    pair_pos_s = [dict() for _ in range(T)]
    for t in range(T):
        for k in range(K_own):
            for j, dv in enumerate(sorted(s_pairs[t][k])):
                p = base_s[k] + j
                pair_pos_s[t][(k, dv)] = p
                # mod-W wrap: lanes whose source precedes the window have no
                # edge (level bound 0) — the wrapped read is masked
                s = int(t0s[t] - dv - sc_wbk[t] * BLOCK) % (J_sc * BLOCK)
                sc_wb[t, 1 + p] = s // BLOCK
                sc_wb[t, 1 + P_s + p] = s % BLOCK
    pos_g = {}
    g_offs = [0] * max(P_g, 1)
    if common_g_offs is not None:
        # positions/offsets FORCED (fused kernel under shard_map: every
        # part bakes the same static lane residues); this part's pairs
        # must be a subset of the common set per slot
        assert len(common_g_offs) == P_g
        g_offs[:P_g] = [int(o) for o in common_g_offs]
        for k in range(K):
            for j in range(Pk_g[k]):
                p = base_g[k] + j
                pos_g[(k, g_offs[p])] = p
        for k in range(K_own):
            for dv in g_glob[k]:
                assert (k, int(dv)) in pos_g, (
                    "part gather pair outside the common offset set")
    else:
        for k in range(K_own):
            for j, dv in enumerate(sorted(g_glob[k])):
                p = base_g[k] + j
                pos_g[(k, dv)] = p
                g_offs[p] = dv
    for (k, dv), p in pos_g.items():
        s = t0s + dv - g_wbk.astype(np.int64) * BLOCK
        # (tile, pair) combinations with no edge in that tile may fall
        # outside the window; clamp — their indicator rows are zero, so
        # the (mirror-wrapped) read is masked.  Pairs present in a tile
        # are in-window by the J_g sizing.
        s = np.clip(s, 0, J_g * BLOCK - 1)
        g_wb[:, 1 + p] = s // BLOCK
        g_wb[:, 1 + P_g + p] = s % BLOCK

    # per-(pair, node) tensors: scatter level bounds keyed at the RECEIVING
    # (n1) node; gather indicators keyed at the HOME (n0) node
    for e in np.nonzero(evalid)[0]:
        k, dv = int(slot[e]), int(d[e])
        t = int(ot[e])
        sc_lev[t, pair_pos_s[t][(k, dv)],
               int(edges[e, 1] - t0s[t])] = mesh.nlev_edge[e]
        t = int(ht[e])
        g_ind[t, pos_g[(k, dv)], int(edges[e, 0] - t0s[t])] = 1

    # ---- fused K3+K4 products (kernels_packed.update_fused_pallas) -------
    # limF is computed over the K4 scatter window, so the pm factors must
    # cover [window, window_end + maxd] (every edge homed in the window
    # reaches its n1 endpoint); J_pm adds headroom for the top-of-mesh
    # clamp (window start shifts down by delta blocks, pair q = delta +
    # d // 128, lane residue d mod 128 static).
    # the offsets actually baked into the static rolls (common union when
    # forced) drive the window/mirror bounds
    maxd_eff = max([maxd] + [int(o) for o in g_offs[:P_g]])
    J_pm = (common_J_pm if common_J_pm is not None
            else J_sc + maxd_eff // BLOCK + 2)
    # maxd < tile also bounds the scr_pm mirror reads: pair segments end
    # at most maxd + BLOCK past the window, within the tile+BLOCK tail
    fused_ok = bool(P_g > 0 and maxd_eff < tile and J_pm * BLOCK <= Np)
    pm_wb = np.zeros((T, 1 + max(P_g, 1)), dtype=np.int32)
    # rows padded to a multiple of 8: Mosaic requires DMA slice row counts
    # aligned to the (8, 128) tiling
    Rg = -(-(K + max(P_g, 1)) // 8) * 8
    gl_int = np.zeros((Rg, Np), dtype=np.int32)
    gl_int[:K] = lev_home
    if fused_ok:
        pm_wbk = np.maximum(np.minimum(sc_wbk, Np // BLOCK - J_pm), 0)
        pm_wb[:, 0] = pm_wbk
        delta = (sc_wbk - pm_wbk).astype(np.int64)
        for (k, dv), p in pos_g.items():
            pm_wb[:, 1 + p] = delta + dv // BLOCK
            m = evalid & (slot == k) & (d == dv)
            gl_int[K + p, edges[m, 0]] = 1

    return PackedPlan(
        K=K, Pk_s=tuple(Pk_s), Pk_g=tuple(Pk_g), J_sc=J_sc, J_g=J_g,
        lev_home=lev_home, einv=einv, eslot=slot,
        sc_wb=sc_wb, sc_lev=sc_lev, g_wb=g_wb, g_ind=g_ind,
        g_offs=tuple(g_offs[:P_g]), maxd=maxd, J_pm=J_pm, pm_wb=pm_wb,
        gl_int=gl_int, fused_ok=fused_ok,
    )


@dataclasses.dataclass
class PackedS2RPlan:
    """Packed (home-slot DIA) plan for the stress2rhs element->node scatter
    (reference src/reference.cpp:456-462: 3 corner contributions per
    element, accumulated per node — CPU-only there).

    Elements are homed at their MIN corner node in one of K slots; the home
    corner's contribution is an aligned read, the two other corners are
    per-(slot, offset) lane shifts.  ``hc``/``ind`` carry corner CODES
    (1..3 = which corner of the element the target node is; 0 = absent)."""

    K: int
    Pk: tuple  # per-slot GLOBAL pair counts (static)
    J: int  # window blocks
    rems: tuple  # [P] STATIC per-pair lane residues ((-d) mod 128; the
    # pair layout is global, so every 128-aligned tile shares them — the
    # K1 global-offset-plan trick enabling static rolls in the kernel)
    einv: np.ndarray  # [K, Np] int32 element id at (slot, home); -1 absent
    eslot: np.ndarray  # [E] int32
    hc: np.ndarray  # [K, Np] int32 home corner code (1..3; 0 absent)
    wb: np.ndarray  # [T, 1 + P] int32 (win_block, q...); lane residues
    # are STATIC (``rems``), not per-tile data
    ind: np.ndarray  # [T, P, tile] int32 corner code at target (0 none)


def build_packed_s2r_plan(mesh, tile: int, Np: int, *, pack_pmax: int = 16,
                          common_static: "tuple | None" = None):
    """Build the packed stress2rhs plan, or None when per-tile pair counts
    exceed ``pack_pmax`` (fall back to the one-hot scatter kernel).

    ``common_static``: (K, Pk, J) to force (sharded use)."""
    # the kernel rolls by STATIC lane residues ((-d) mod 128), valid only
    # when every tile start is 128-aligned — reject unaligned tiles loudly
    # (the same guard build_pallas_data carries for the FCT chain)
    assert tile % BLOCK == 0, (
        f"tile={tile} must be a multiple of {BLOCK} (static pair-roll "
        "residues assume 128-aligned tile starts)")
    en = mesh.elem_nodes
    E, N = mesh.n_elems, mesh.n_nodes
    T = Np // tile
    home = en.min(axis=1).astype(np.int64)
    # padded part elements are index-0 degenerate triangles (all corners
    # equal, parallel/partition.py): they must not claim home slots, or a
    # boundary part's slot count inflates to its padding count
    valid = ~((en[:, 0] == en[:, 1]) & (en[:, 1] == en[:, 2]))
    vidx = np.nonzero(valid)[0]
    slot = np.zeros(E, dtype=np.int32)
    if len(vidx):
        hv = home[vidx]
        cnt = np.bincount(hv, minlength=N)
        K_own = int(cnt.max())
        order = np.argsort(hv, kind="stable")
        offs = np.zeros(N + 1, dtype=np.int64)
        np.cumsum(cnt, out=offs[1:])
        slot[vidx[order]] = (np.arange(len(vidx)) - offs[hv[order]]).astype(
            np.int32)
    else:
        K_own = 1

    # GLOBAL distinct (slot, offset) pairs over the two non-home corners:
    # every tile addresses pair (k, d) at the same static position, so the
    # pair's lane residue (-d) mod 128 is a compile-time constant on
    # 128-aligned tiles — the K1 global-offset-plan trick
    # (kernels._bounds_dia_vals), enabling static rolls in the kernel.
    # (Structured meshes have near-identical per-tile pair sets anyway:
    # core2 has 9 global pairs = the per-tile count.)
    per_corner = []  # (corner_code, target_node, k, d) rows
    glob = [set() for _ in range(K_own)]
    for c in range(3):
        tgt = en[:, c].astype(np.int64)
        m = (tgt != home) & valid
        per_corner.append((c + 1, tgt[m], slot[m], (tgt - home)[m],
                           np.nonzero(m)[0]))
        for kk, dd in zip(slot[m], (tgt - home)[m]):
            glob[int(kk)].add(int(dd))
    Pk_own = tuple(len(s) for s in glob)
    if common_static is not None:
        K, Pk, J = common_static
        assert K_own <= K and all(a <= b for a, b in zip(Pk_own, Pk))
    else:
        if sum(Pk_own) > pack_pmax:
            return None
        K, Pk = K_own, Pk_own
        J = 0

    einv = np.full((K, Np), -1, dtype=np.int32)
    hc = np.zeros((K, Np), dtype=np.int32)
    einv[slot[valid], home[valid]] = np.arange(E, dtype=np.int32)[valid]
    home_pos = np.argmin(en, axis=1).astype(np.int32)
    hc[slot[valid], home[valid]] = home_pos[valid] + 1

    t0s = np.arange(T, dtype=np.int64) * tile
    sc_min = t0s.copy()
    for _, tgt, _k, d, _e in per_corner:
        np.minimum.at(sc_min, tgt // tile, tgt - d)
    j_own = int(((t0s + tile - 1) // BLOCK - sc_min // BLOCK + 1).max())
    if common_static is not None:
        assert j_own <= J and J * BLOCK <= Np
    else:
        J = j_own

    P = sum(Pk)
    wb = np.zeros((T, 1 + P), dtype=np.int32)
    ind = np.zeros((T, max(P, 1), tile), dtype=np.int32)
    base = np.concatenate([[0], np.cumsum(Pk)]).astype(int)
    wbk = np.maximum(0, (t0s + tile) // BLOCK - J)
    wb[:, 0] = wbk
    # global pair positions + offsets (slot-major, sorted within slot)
    pos = {}
    offs_flat = [0] * max(P, 1)
    for kk in range(K_own):
        for j, dd in enumerate(sorted(glob[kk])):
            pos[(kk, dd)] = base[kk] + j
            offs_flat[base[kk] + j] = dd
    # every tile carries every pair's q (block index; the lane residue is
    # STATIC per pair): absent pairs are masked by ind == 0, and their q
    # still addresses valid window columns
    for (kk, dd), p in pos.items():
        s = (t0s - dd - wbk.astype(np.int64) * BLOCK) % (J * BLOCK)
        wb[:, 1 + p] = s // BLOCK
    for code, tgt, k, d, _e in per_corner:
        for tt, kk, dd, j in zip(tgt // tile, k, d, tgt - (tgt // tile) * tile):
            ind[int(tt), pos[(int(kk), int(dd))], int(j)] = code

    rems = tuple(int((-dd) % BLOCK) for dd in offs_flat[:P])
    return PackedS2RPlan(K=K, Pk=tuple(Pk), J=J, rems=rems, einv=einv,
                         eslot=slot, hc=hc, wb=wb, ind=ind)

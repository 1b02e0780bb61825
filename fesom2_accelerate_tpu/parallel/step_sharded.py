"""Multi-device FCT-ALE step: shard_map over a device mesh with halo exchange.

The step keeps the reference's three-phase structure
(src/fesom2-accelerate.cu:258,342,358) but the host MPI ``exchange_nod`` of
``fct_plus``/``fct_minus`` (docs/refactoring.md:199-200,235) becomes an XLA
collective inside ``shard_map``:

    pre_comm (a1..b2, local)  ->  all_gather(owned limiter blocks)   [ICI]
                                   || b3_vertical (node-local work overlapped
                                   ||   with the collective, like the
                                   ||   reference's inter_comm phase)
    halo columns filled       ->  b3_horizontal, stage c (local)

The collective result is consumed only by b3_horizontal, so XLA's scheduler
is free to run the exchange concurrently with node-local work.

Two backends:

* ``xla``   — jnp stages per shard (any dtype; the f64 correctness path);
* ``pallas`` — the fused 4-kernel chain per shard (f32 TPU perf path),
  enabled by the partition's [H | owned | H] local layout which preserves
  the index locality the Pallas window planner needs.  All parts share one
  PallasStatic (max window blocks across parts) so shard_map sees a single
  program.

Two exchange primitives (SURVEY §2.6 "halo-exchange communication"):

* ``ppermute`` (default when the partition is neighbor-only, which holds
  whenever block size >= mesh bandwidth): packed send lists + two one-hop
  shifts over ICI — comm volume 2H per part, the direct analogue of the
  host's point-to-point ``exchange_nod``;
* ``allgather`` fallback for pathological partitions (comm volume P*B).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh.topology import Mesh
from fesom2_accelerate_tpu.model import fct_ale as single
from fesom2_accelerate_tpu.ops import stages
from fesom2_accelerate_tpu.ops.meshdata import MeshData, build_mesh_data
from fesom2_accelerate_tpu.parallel import partition as part_mod
from fesom2_accelerate_tpu.parallel.partition import PartitionedMesh


def _halo_fill(x, hmaps, B, H, axis_name="p"):
    """Rebuild the halo columns of ``x`` [.., >= 2H+B] from their owners'
    owned blocks.  One all-gather over the device axis; any padded columns
    beyond 2H+B pass through unchanged."""
    lo_part, lo_idx, hi_part, hi_idx = hmaps
    own = x[..., H:H + B]
    g = jax.lax.all_gather(own, axis_name)  # [P, .., B]
    g = jnp.moveaxis(g, 0, -2)  # [.., P, B]
    flat = g.reshape(g.shape[:-2] + (-1,))  # [.., P*B]
    lo = jnp.take(flat, lo_part * B + lo_idx, axis=-1)  # [.., H]
    hi = jnp.take(flat, hi_part * B + hi_idx, axis=-1)  # [.., H]
    tail = x[..., 2 * H + B:]
    return jnp.concatenate([lo, own, hi, tail], axis=-1)


def _halo_fill_nbr(x, smaps, B, H, n_parts, axis_name="p"):
    """Packed point-to-point halo fill: the MPI ``exchange_nod`` analogue
    (docs/refactoring.md:200), generalized to MULTI-HOP neighbor sets.

    Hop ``r`` packs, on every part at once, the owned columns its distance-r
    neighbors need (precomputed per-hop send lists) and moves one slab per
    direction via ``ppermute(shift r)``.  Received columns land in the halo
    via per-column (hop, position) maps.  Comm volume = sum of per-hop slab
    widths ~ true halo sizes — NOT P*B — for ANY stripe partition, including
    block size < mesh bandwidth where halos span several parts."""
    sends_up, sends_dn, lo_hop, lo_pos, hi_hop, hi_pos = smaps
    own = x[..., H:H + B]
    lo = jnp.zeros(x.shape[:-1] + (H,), x.dtype)
    hi = jnp.zeros(x.shape[:-1] + (H,), x.dtype)
    R = len(sends_up)
    for r in range(1, R + 1):
        up = jnp.take(own, sends_up[r - 1], axis=-1)  # for p+r's lo halo
        dn = jnp.take(own, sends_dn[r - 1], axis=-1)  # for p-r's hi halo
        fwd = [(p, p + r) for p in range(n_parts - r)]
        bwd = [(p, p - r) for p in range(r, n_parts)]
        rup = jax.lax.ppermute(up, axis_name, fwd)  # recv from p-r
        rdn = jax.lax.ppermute(dn, axis_name, bwd)  # recv from p+r
        lo = jnp.where(lo_hop == r,
                       jnp.take(rup, lo_pos, axis=-1, mode="clip"), lo)
        hi = jnp.where(hi_hop == r,
                       jnp.take(rdn, hi_pos, axis=-1, mode="clip"), hi)
    tail = x[..., 2 * H + B:]
    return jnp.concatenate([lo, own, hi, tail], axis=-1)


def _common_dia(statics):
    """Unify the DIA bounds static across parts: the GLOBAL offset set is
    the union (every part masks the slots it does not use); DIA only if
    every part admits it — shard_map compiles one program."""
    if any(s.a3f_dia_D == 0 for s in statics):
        return dict(a3f_dia_D=0, a3f_dia_offs=())
    union = sorted({int(o) for s in statics for o in s.a3f_dia_offs
                    if o != 0})  # 0 appears only as pad (never a neighbor)
    union = union or [0]
    return dict(a3f_dia_D=len(union), a3f_dia_offs=tuple(union))


def _common_packed(statics, fused: bool = False):
    """Unify the packed-layout static across parts (element-wise max of the
    per-slot pair tuples, padded to the max slot count); packed only if
    EVERY part admits it — shard_map compiles one program.

    ``fused``: build the common static for the FUSED-K34 sharded mode —
    the per-slot gather offsets become the UNION across parts (every part
    bakes the same static lane residues; absent pairs stay masked by each
    part's zero indicator rows)."""
    if any(s.pack_K == 0 for s in statics):
        return dict(pack_K=0, pack_Pk_s=(), pack_Pk_g=(),
                    pack_J_sc=0, pack_J_g=0, pack_J_pm=0,
                    pack_g_offs=(), fuse_k34=False)
    K = max(s.pack_K for s in statics)

    def merge(key):
        out = [0] * K
        for s in statics:
            for k, v in enumerate(getattr(s, key)):
                out[k] = max(out[k], v)
        return tuple(out)

    J_sc = max(s.pack_J_sc for s in statics)
    if fused:
        if any(not s.fuse_k34 for s in statics):
            raise ValueError(
                "fused sharded mode needs every part to admit the fused "
                "K3+K4 form (a part has fuse_k34 False)")
        per_slot = [set() for _ in range(K)]
        for s in statics:
            base = 0
            for k, n in enumerate(s.pack_Pk_g):
                per_slot[k].update(int(o) for o in s.pack_g_offs[base:base + n])
                base += n
        Pk_g = tuple(len(x) for x in per_slot)
        offs = []
        for k in range(K):
            offs += sorted(per_slot[k])
        maxd = max(offs) if offs else 0
        return dict(
            pack_K=K, pack_Pk_s=merge("pack_Pk_s"), pack_Pk_g=Pk_g,
            pack_J_sc=J_sc, pack_J_g=max(s.pack_J_g for s in statics),
            pack_J_pm=J_sc + maxd // 128 + 2,
            pack_g_offs=tuple(offs), fuse_k34=True,
        )

    return dict(
        pack_K=K, pack_Pk_s=merge("pack_Pk_s"), pack_Pk_g=merge("pack_Pk_g"),
        pack_J_sc=J_sc,
        pack_J_g=max(s.pack_J_g for s in statics),
        # split mode (default): the exchange/compute overlap needs the
        # separate K3 (interior sweep + fixup), so fused K34 stays off
        pack_J_pm=max(s.pack_J_pm for s in statics),
        pack_g_offs=(), fuse_k34=False,
    )


def sharded_fct_ale_step(md: MeshData, cfg: FctAleConfig, exchange,
                         state: dict) -> dict:
    """One XLA-path FCT-ALE step on this device's subdomain (runs inside
    shard_map).  ``exchange``: halo-fill callable (all-gather or ppermute)."""
    lim = single.pre_comm(md, cfg, state["ttf"], state["fct_LO"],
                          state["fct_adf_v"], state["fct_adf_h"])
    plus, minus = lim["fct_plus"], lim["fct_minus"]

    # start the halo exchange of both limiter-factor fields ...
    both = jnp.stack([plus, minus])
    both = exchange(both)

    # ... while b3_vertical (pure node-local, owned columns already final)
    # runs on the pre-exchange values — the reference's inter_comm overlap
    adf_v, adf_v2 = single.inter_comm(md, cfg, plus, minus,
                                      state["fct_adf_v"])

    plus, minus = both[0], both[1]
    adf_h, adf_h2 = single.post_comm(md, cfg, plus, minus,
                                     state["fct_adf_h"])

    out = dict(state)
    out.update(
        fct_ttf_max=lim["fct_ttf_max"], fct_ttf_min=lim["fct_ttf_min"],
        fct_plus=plus, fct_minus=minus,
    )
    if cfg.iter_yn:
        new_LO = stages.c_update_LO(
            md, state["fct_LO"], adf_v, adf_h, state["hnode_new"], cfg.dt
        )
        # halo refresh so the next iteration's a1 sees current fct_LO
        new_LO = exchange(new_LO)
        out.update(
            fct_LO=new_LO, fct_adf_v=adf_v2, fct_adf_h=adf_h2,
            fct_adf_v_limited=adf_v, fct_adf_h_limited=adf_h,
        )
    else:
        del_v, del_h = stages.c_update_solution(
            md, state["ttf"], state["hnode"], state["hnode_new"],
            state["fct_LO"], adf_v, adf_h,
            state["del_ttf_advvert"], state["del_ttf_advhoriz"], cfg.dt,
        )
        out.update(
            fct_adf_v=adf_v, fct_adf_h=adf_h,
            del_ttf_advvert=del_v, del_ttf_advhoriz=del_h,
        )
    return out


class ShardedFctAleSolver:
    """Domain-decomposed FCT-ALE over a 1-D device mesh axis ``p``.

    The global mesh is partitioned host-side (:func:`partition_mesh`); every
    per-part array is stacked to a ``[P, ...]`` leading axis and sharded over
    the devices, so each device holds exactly its subdomain.

    backend: "xla" (any dtype) or "pallas" (fused 4-kernel chain per shard,
    f32-only; state lives in the padded kernel layout).

    exchange: "auto" (ppermute when the partition is neighbor-only, else
    all-gather), "ppermute" (force; raises if not neighbor-only), or
    "allgather"."""

    def __init__(self, mesh: Mesh, cfg: FctAleConfig = FctAleConfig(),
                 devices=None, axis_name: str = "p", backend: str = "xla",
                 exchange: str = "auto",
                 part_counts: "np.ndarray | None" = None,
                 tracers: int = 1, fused: bool = False):
        self.mesh = mesh
        self.cfg = cfg
        self.axis_name = axis_name
        self.backend = backend
        # tracers > 1 (pallas only): Tb tracers row-stacked through one
        # compiled chain per shard; all Tb tracers' halos move in ONE
        # ppermute per step (the collective latency amortizes across the
        # batch).  init_state then expects per-tracer [Tb, L, N] fields
        # with shared [L, N] hnode/hnode_new.
        assert tracers == 1 or backend == "pallas", (
            "tracer batching is pallas-only")
        self.tracers = tracers
        # fused=True (pallas only): run the FUSED K3+K4 chain per shard —
        # the exchange completes BEFORE the b3h limiting instead of
        # overlapping a split K3.  The right trade on fast interconnects:
        # an ICI halo slab is ~0.2 MB (microseconds) while the split
        # chain forgoes ~0.2 ms of fusion per step to hide it
        # (BASELINE.md "Sharded-program overhead").
        assert not fused or backend == "pallas", (
            "fused sharded mode is pallas-only")
        self.fused = fused
        devices = devices if devices is not None else jax.devices()
        self.n_parts = len(devices)
        self.jax_mesh = JaxMesh(np.asarray(devices), (axis_name,))
        # part_counts: realize a 2-D RCB partition (mesh.ordering.rcb_order
        # + reorder_mesh) through the contiguous-range machinery
        self.pm: PartitionedMesh = part_mod.partition_mesh(
            mesh, self.n_parts, counts=part_counts)
        pm = self.pm

        if exchange == "auto":
            exchange = "ppermute" if self.n_parts > 1 else "allgather"
        self.exchange_mode = exchange

        shard = NamedSharding(self.jax_mesh, P(axis_name))
        self._sharding = shard
        # single-process: plain device_put.  Multi-process (multi-host): every
        # process holds the full host-side array (mesh setup is redundant per
        # process, like each MPI rank building its subdomain) and contributes
        # only its addressable shards.
        self._multiproc = any(
            d.process_index != jax.process_index() for d in devices
        )

        def put(x):
            if not self._multiproc:
                return jax.device_put(x, shard)
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, shard, lambda idx: x[idx]
            )

        self._put = put

        def put_stacked(arrays):
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *arrays)
            return jax.tree.map(put, stacked)

        if exchange == "ppermute":
            emaps = (tuple(pm.hop_send_up), tuple(pm.hop_send_dn),
                     pm.halo_lo_hop, pm.halo_lo_pos,
                     pm.halo_hi_hop, pm.halo_hi_pos)
        else:
            emaps = (jnp.asarray(pm.halo_lo_src_part),
                     jnp.asarray(pm.halo_lo_src_idx),
                     jnp.asarray(pm.halo_hi_src_part),
                     jnp.asarray(pm.halo_hi_src_idx))
        self._hmaps = jax.tree.map(put, emaps)
        B, H = pm.B, pm.H
        n_parts = self.n_parts

        def make_exchange(maps):
            if self.exchange_mode == "ppermute":
                return functools.partial(
                    _halo_fill_nbr, smaps=maps, B=B, H=H, n_parts=n_parts,
                    axis_name=axis_name,
                )
            return functools.partial(
                _halo_fill, hmaps=maps, B=B, H=H, axis_name=axis_name
            )

        if backend == "pallas":
            from fesom2_accelerate_tpu.ops.pallas import step as pstep

            assert cfg.dtype == jnp.float32, "pallas backend is f32-only"
            # per-part halo-column masks drive the interior/boundary b3h
            # split: K3 overlaps the exchange, the fixup follows it
            halo_masks = []
            for p in range(self.n_parts):
                if fused:
                    # no interior/fixup split: the exchange completes
                    # before the fused K34 consumes the factors
                    halo_masks.append(None)
                    continue
                hm = np.zeros(pm.local_meshes[p].n_nodes, dtype=bool)
                hm[:pm.H] = True
                hm[pm.H + pm.B:pm.H + pm.B + pm.H] = True
                halo_masks.append(hm)
            # pass A: independent statics; pass B: rebuild under the common
            # (max) static so shard_map sees one program on every device
            statics = [pstep.build_pallas_data(m, halo_mask=hm, xp=np)[1]
                       for m, hm in zip(pm.local_meshes, halo_masks)]
            common = dataclasses.replace(
                statics[0],
                Np=max(s.Np for s in statics),
                Ep=max(s.Ep for s in statics),
                Edp=max(s.Edp for s in statics),
                K_lo=max(s.K_lo for s in statics),
                K_hi=max(s.K_hi for s in statics),
                a3f_lo_nblocks=max(s.a3f_lo_nblocks for s in statics),
                a3f_hi_nblocks=max(s.a3f_hi_nblocks for s in statics),
                ne_lo_nblocks=max(s.ne_lo_nblocks for s in statics),
                ne_hi_nblocks=max(s.ne_hi_nblocks for s in statics),
                b3h_lo_nblocks=max(s.b3h_lo_nblocks for s in statics),
                b3h_hi_nblocks=max(s.b3h_hi_nblocks for s in statics),
                a2_nblocks=max(s.a2_nblocks for s in statics),
                n_fix_tiles=max(s.n_fix_tiles for s in statics),
                a3f_un_nblocks=max(s.a3f_un_nblocks for s in statics),
                **_common_dia(statics),
                **_common_packed(statics, fused=fused),
            )
            pds = [pstep.build_pallas_data(m, common=common, halo_mask=hm,
                                           xp=np)[0]
                   for m, hm in zip(pm.local_meshes, halo_masks)]
            self.ps = common
            # surface any fast-form fallback LOUDLY: the round-3 regression
            # (boundary parts knocking every shard onto the ~1.8x-slower
            # one-hot kernels) stayed invisible precisely because this
            # degradation was silent (VERDICT r3 weak #1)
            self.degraded = []
            if common.pack_K == 0:
                self.degraded.append("packed->one-hot")
            if common.a3f_dia_D == 0:
                self.degraded.append("dia->one-hot")
            if self.degraded:
                import warnings

                parts_bad = [
                    p for p, s in enumerate(statics)
                    if s.pack_K == 0 or s.a3f_dia_D == 0
                ]
                warnings.warn(
                    "ShardedFctAleSolver: fast kernel forms degraded "
                    f"({', '.join(self.degraded)}); parts failing "
                    f"admissibility: {parts_bad} — every shard falls back "
                    "to the one-hot kernels", RuntimeWarning, stacklevel=2)
                if self.tracers > 1:
                    # the batched grids exist only for the packed+DIA
                    # kernels — fail at construction, not first step
                    raise ValueError(
                        "tracers>1 requires the packed+DIA production "
                        f"forms; this mesh degrades ({self.degraded}) to "
                        "the one-hot kernels — run with tracers=1")
            # host-side stacked pad maps: init_state must pad with LOCAL
            # arrays (the stacked device md is global in multi-process runs)
            self._padmaps = jax.tree.map(
                lambda *xs: np.stack(xs), *[pstep.pad_maps(p) for p in pds])
            self.md = put_stacked(pds)
            self._pstep = pstep

            Tb = self.tracers

            def local_step(pd, hmaps, state):
                pd = jax.tree.map(lambda x: x[0], pd)
                hmaps = jax.tree.map(lambda x: x[0], hmaps)
                state = jax.tree.map(lambda x: x[0], state)
                if Tb > 1:
                    out = pstep.fct_ale_step_pallas_padded_batched(
                        pd, common, cfg, state, Tb,
                        exchange=make_exchange(hmaps),
                    )
                else:
                    out = pstep.fct_ale_step_pallas_padded(
                        pd, common, cfg, state, exchange=make_exchange(hmaps)
                    )
                return jax.tree.map(lambda x: x[None], out)

        else:
            self.degraded = []  # xla backend has no fast-form fallback
            mds = [build_mesh_data(m, dtype=cfg.dtype, xp=np)
                   for m in pm.local_meshes]
            self.md = put_stacked(mds)

            def local_step(md, hmaps, state):
                md = jax.tree.map(lambda x: x[0], md)
                hmaps = jax.tree.map(lambda x: x[0], hmaps)
                state = jax.tree.map(lambda x: x[0], state)
                out = sharded_fct_ale_step(md, cfg, make_exchange(hmaps),
                                           state)
                return jax.tree.map(lambda x: x[None], out)

        smapped = jax.shard_map(
            local_step,
            mesh=self.jax_mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name)),
            out_specs=P(axis_name),
            # pallas_call out_shapes carry no varying-mesh-axis annotation;
            # collectives here are explicit, so skip the vma check
            check_vma=False,
        )
        # no donate_argnums: see model/fct_ale.py — donation degrades
        # XLA:TPU compile and run time drastically for this program shape.
        # Mesh data / halo maps are jit ARGUMENTS (closure-captured device
        # arrays would be inlined as HLO constants -> extreme compile times)
        self._step = jax.jit(smapped)
        self._local_step = local_step
        self._smapped = smapped

    # ---- state movement -------------------------------------------------
    def init_state(self, fields: dict) -> dict:
        pm = self.pm
        out = {}
        for k, v in fields.items():
            if v.shape[-1] == self.mesh.n_nodes:
                loc = part_mod.scatter_node_field(pm, v)
            elif v.shape[-1] == self.mesh.n_edges:
                loc = part_mod.scatter_edge_field(pm, v)
            else:
                raise ValueError(f"unknown field layout for {k}: {v.shape}")
            out[k] = jnp.asarray(loc, dtype=self.cfg.dtype)
        if self.backend == "pallas":
            # pad each part to the kernel layout (stacked, then sharded);
            # per-part edge<->slot maps ride in the stacked PallasData
            ps = self.ps
            if self.tracers > 1:
                pad = jax.vmap(
                    lambda pm_, s: self._pstep.pad_state_batched(ps, s, pm_),
                    in_axes=0, out_axes=0)
            else:
                pad = jax.vmap(
                    lambda pm_, s: self._pstep.pad_state(ps, s, pm_),
                    in_axes=0, out_axes=0)
            out = pad(self._padmaps, out)
        return {k: self._put(v) for k, v in out.items()}

    def gather_node(self, arr) -> np.ndarray:
        if self._multiproc:
            # replicate the sharded result to every process (the host-side
            # analogue of FESOM's gather for diagnostics)
            from jax.experimental import multihost_utils

            arr = multihost_utils.process_allgather(arr, tiled=True)
        return part_mod.gather_node_field(self.pm, np.asarray(arr))

    # ---- checkpoint / resume --------------------------------------------
    # Checkpoints store GLOBAL natural-layout state (gather on save,
    # re-scatter on load), so they are portable across partition counts,
    # backends, and process topologies — the property the reference could
    # not have (its state lives in host-FESOM per-rank arrays).

    def gather_state(self, state: dict) -> dict:
        """Sharded state -> global natural-layout numpy dict."""
        from fesom2_accelerate_tpu.ops.pallas.step import _EDGE_FIELDS

        if self._multiproc:
            from jax.experimental import multihost_utils

            state = {k: multihost_utils.process_allgather(v, tiled=True)
                     for k, v in state.items()}
        state = {k: np.asarray(v) for k, v in state.items()}
        if self.backend == "pallas":
            ps, Tb = self.ps, self.tracers
            if Tb > 1:
                unpad = jax.vmap(
                    lambda pm_, s: self._pstep.unpad_state_batched(
                        ps, s, Tb, pm_),
                    in_axes=0, out_axes=0)
            else:
                unpad = jax.vmap(
                    lambda pm_, s: self._pstep.unpad_state(ps, s, pm_),
                    in_axes=0, out_axes=0)
            state = {k: np.asarray(v)
                     for k, v in unpad(self._padmaps, state).items()}
        out = {}
        for k, v in state.items():
            if k in _EDGE_FIELDS:
                out[k] = part_mod.gather_edge_field(self.pm, v)
            else:
                out[k] = part_mod.gather_node_field(self.pm, v)
        return out

    def save_checkpoint(self, path, state: dict, step: int = 0,
                        use_orbax: "bool | None" = None) -> None:
        from fesom2_accelerate_tpu.runtime import checkpoint as ckpt

        # gather_state contains a COLLECTIVE (process_allgather) in
        # multi-process runs — every process must participate; only the
        # file write is gated to process 0
        gathered = self.gather_state(state)
        if not self._multiproc or jax.process_index() == 0:
            ckpt.save_checkpoint(path, gathered, self.mesh, self.cfg,
                                 step=step, use_orbax=use_orbax)

    def load_checkpoint(self, path):
        """Returns (sharded device state, step) — scatters the global
        checkpoint through init_state, so a run saved at P parts resumes
        at THIS solver's partition/backend."""
        from fesom2_accelerate_tpu.runtime import checkpoint as ckpt

        st, step = ckpt.load_checkpoint(path, self.mesh, self.cfg)
        return self.init_state(st), step

    # ---- stepping -------------------------------------------------------
    def step(self, state: dict) -> dict:
        return self._step(self.md, self._hmaps, state)

    def run(self, state: dict, n_steps: int) -> dict:
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if n_steps not in self._scan_cache:
            smapped = self._smapped

            @jax.jit
            def scan_steps(md, hmaps, s):
                def body(c, _):
                    new = smapped(md, hmaps, c)
                    return {k: new[k] for k in c}, None

                s, _ = jax.lax.scan(body, s, None, length=n_steps)
                return s

            self._scan_cache[n_steps] = scan_steps
        return self._scan_cache[n_steps](self.md, self._hmaps, state)

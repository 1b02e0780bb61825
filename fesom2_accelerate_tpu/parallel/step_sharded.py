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
is free to run the exchange concurrently with b3_vertical.

Current exchange primitive is an all-gather of the padded owned block (simple
and correct at small device counts); a neighbor-only ``ppermute`` pipeline
with packed send lists is the planned upgrade for large meshes (SURVEY §2.6).
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


def _halo_fill(x, src_part, src_idx, B, axis_name="p"):
    """Replace the halo columns of ``x`` [.., B+H] with values gathered from
    their owners' owned blocks.  One all-gather over the device axis."""
    own = x[..., :B]
    g = jax.lax.all_gather(own, axis_name)  # [P, .., B]
    g = jnp.moveaxis(g, 0, -2)  # [.., P, B]
    flat = g.reshape(g.shape[:-2] + (-1,))  # [.., P*B]
    halo = jnp.take(flat, src_part * B + src_idx, axis=-1)  # [.., H]
    return jnp.concatenate([own, halo], axis=-1)


def sharded_fct_ale_step(md: MeshData, cfg: FctAleConfig, B: int,
                         src_part, src_idx, state: dict,
                         axis_name: str = "p") -> dict:
    """One FCT-ALE step on this device's subdomain (runs inside shard_map)."""
    lim = single.pre_comm(md, cfg, state["ttf"], state["fct_LO"],
                          state["fct_adf_v"], state["fct_adf_h"])
    plus, minus = lim["fct_plus"], lim["fct_minus"]

    # start the halo exchange of both limiter-factor fields ...
    both = jnp.stack([plus, minus])
    both = _halo_fill(both, src_part, src_idx, B, axis_name)

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
        new_LO = _halo_fill(new_LO, src_part, src_idx, B, axis_name)
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
    the devices, so each device holds exactly its subdomain."""

    def __init__(self, mesh: Mesh, cfg: FctAleConfig = FctAleConfig(),
                 devices=None, axis_name: str = "p"):
        self.mesh = mesh
        self.cfg = cfg
        self.axis_name = axis_name
        devices = devices if devices is not None else jax.devices()
        self.n_parts = len(devices)
        self.jax_mesh = JaxMesh(np.asarray(devices), (axis_name,))
        self.pm: PartitionedMesh = part_mod.partition_mesh(mesh, self.n_parts)

        # stacked per-part MeshData, sharded over the leading axis
        mds = [build_mesh_data(m, dtype=cfg.dtype) for m in self.pm.local_meshes]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *mds)
        shard = NamedSharding(self.jax_mesh, P(axis_name))
        self.md = jax.tree.map(lambda x: jax.device_put(x, shard), stacked)
        self.src_part = jax.device_put(
            jnp.asarray(self.pm.halo_src_part), shard
        )
        self.src_idx = jax.device_put(jnp.asarray(self.pm.halo_src_idx), shard)
        self._sharding = shard

        def local_step(md, src_part, src_idx, state):
            # shard_map blocks carry a leading length-1 device axis
            md = jax.tree.map(lambda x: x[0], md)
            state = jax.tree.map(lambda x: x[0], state)
            out = sharded_fct_ale_step(
                md, cfg, self.pm.B, src_part[0], src_idx[0], state,
                axis_name,
            )
            return jax.tree.map(lambda x: x[None], out)

        smapped = jax.shard_map(
            local_step,
            mesh=self.jax_mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
            out_specs=P(axis_name),
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
            out[k] = jax.device_put(
                jnp.asarray(loc, dtype=self.cfg.dtype), self._sharding
            )
        return out

    def gather_node(self, arr) -> np.ndarray:
        return part_mod.gather_node_field(self.pm, np.asarray(arr))

    # ---- stepping -------------------------------------------------------
    def step(self, state: dict) -> dict:
        return self._step(self.md, self.src_part, self.src_idx, state)

    def run(self, state: dict, n_steps: int) -> dict:
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if n_steps not in self._scan_cache:
            smapped = self._smapped

            @jax.jit
            def scan_steps(md, src_part, src_idx, s):
                def body(c, _):
                    new = smapped(md, src_part, src_idx, c)
                    return {k: new[k] for k in c}, None

                s, _ = jax.lax.scan(body, s, None, length=n_steps)
                return s

            self._scan_cache[n_steps] = scan_steps
        return self._scan_cache[n_steps](self.md, self.src_part,
                                         self.src_idx, state)

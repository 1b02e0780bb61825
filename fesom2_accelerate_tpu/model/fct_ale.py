"""Single-device FCT-ALE solver driver.

The TPU analogue of the reference's orchestration layer
(src/fesom2-accelerate.cu:258-379) — but where the reference splits the chain
into pre/inter/post-comm phases with per-variable H2D/D2H transfers and
stream/event ordering, here the whole step is ONE jitted function on
device-resident state: the reference's per-step transfer overhead
(src/fesom2-accelerate.cu:268,338-339,355,364-365,378) has no equivalent.

The phase split survives as three composable functions (``pre_comm``,
``inter_comm``, ``post_comm``) because the multi-device path
(fesom2_accelerate_tpu.parallel) inserts the halo exchange between them,
exactly where host FESOM2 calls ``exchange_nod`` (docs/refactoring.md:200,235).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh.topology import Mesh
from fesom2_accelerate_tpu.ops import stages
from fesom2_accelerate_tpu.ops.meshdata import MeshData, build_mesh_data


def pre_comm(md: MeshData, cfg: FctAleConfig, ttf, fct_LO, fct_adf_v,
             fct_adf_h):
    """Stages a1..b2 -> limiter factors (reference
    fct_ale_pre_comm_acc_, src/fesom2-accelerate.cu:258-340)."""
    tmax, tmin = stages.a1(md, fct_LO, ttf)
    if cfg.vlimit == 1:
        # fused a2+a3: the element-cluster reduce collapses to a node-
        # neighbor max over incident edges (see stages.a3_vlimit1_fused) —
        # no UV array is ever materialized.  Exact for |values| < bignumber,
        # which is the reference's own padding assumption.
        tmax2, tmin2 = stages.a3_vlimit1_fused(md, tmax, tmin, fct_LO)
    else:
        UV_max, UV_min = stages.a2(md, tmax, tmin, cfg.bignumber)
        tmax2, tmin2 = stages.a3(md, UV_max, UV_min, tmax, fct_LO,
                                 cfg.vlimit)
    fct_plus, fct_minus = stages.b1_vertical(md, fct_adf_v)
    fct_plus, fct_minus = stages.b1_horizontal(
        md, fct_plus, fct_minus, fct_adf_h
    )
    fct_plus, fct_minus = stages.b2(
        md, fct_plus, fct_minus, tmax2, tmin2, cfg.dt, cfg.flux_eps
    )
    return dict(
        fct_ttf_max=tmax2, fct_ttf_min=tmin2,
        fct_plus=fct_plus, fct_minus=fct_minus,
    )


def inter_comm(md: MeshData, cfg: FctAleConfig, fct_plus, fct_minus,
               fct_adf_v):
    """b3 vertical — node-local work the reference overlaps with the MPI
    wait (fct_ale_inter_comm_acc_, src/fesom2-accelerate.cu:342-356)."""
    return stages.b3_vertical(md, fct_plus, fct_minus, fct_adf_v, cfg.iter_yn)


def post_comm(md: MeshData, cfg: FctAleConfig, fct_plus, fct_minus,
              fct_adf_h):
    """b3 horizontal, after exchanged limiter factors are available
    (fct_ale_post_comm_acc_, src/fesom2-accelerate.cu:358-379)."""
    return stages.b3_horizontal(
        md, fct_plus, fct_minus, fct_adf_h, cfg.iter_yn
    )


def fct_ale_step(md: MeshData, cfg: FctAleConfig, state: dict) -> dict:
    """Full a->b->c chain on one device.  ``state`` carries the field dict of
    :func:`fesom2_accelerate_tpu.mesh.generate.random_fields`."""
    lim = pre_comm(md, cfg, state["ttf"], state["fct_LO"],
                   state["fct_adf_v"], state["fct_adf_h"])
    fct_plus, fct_minus = lim["fct_plus"], lim["fct_minus"]
    adf_v, adf_v2 = inter_comm(md, cfg, fct_plus, fct_minus,
                               state["fct_adf_v"])
    adf_h, adf_h2 = post_comm(md, cfg, fct_plus, fct_minus,
                              state["fct_adf_h"])

    out = dict(state)
    out.update(
        fct_ttf_max=lim["fct_ttf_max"], fct_ttf_min=lim["fct_ttf_min"],
        fct_plus=fct_plus, fct_minus=fct_minus,
    )
    if cfg.iter_yn:
        new_LO = stages.c_update_LO(
            md, state["fct_LO"], adf_v, adf_h, state["hnode_new"], cfg.dt
        )
        # swap in the residual fluxes for the next FCT iteration
        # (docs/refactoring.md:287-289)
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


class FctAleSolver:
    """Owns the device-resident mesh data and the jitted step.

    Usage::

        solver = FctAleSolver(mesh, FctAleConfig(dtype=jnp.float32))
        state = solver.init_state(fields)      # host numpy -> device
        state = solver.step(state)             # one FCT-ALE step
        state = solver.run(state, n_steps=10)  # lax.scan'd iteration

    backend: "xla" (jnp stages, any dtype — the f64 correctness path) or
    "pallas" (windowed one-hot MXU kernels for the irregular stages,
    f32-only — the TPU performance path, ops/pallas/)."""

    def __init__(self, mesh: Mesh, cfg: FctAleConfig = FctAleConfig(),
                 backend: str = "xla", tile: "int | None" = None,
                 chunk: "int | None" = None,
                 scatter_chunk: "int | None" = None, form: str = "auto"):
        self.mesh = mesh
        self.cfg = cfg
        self.backend = backend
        # CRITICAL: mesh data is passed as a jit ARGUMENT, never closed over.
        # Closure-captured device arrays are inlined into the HLO as literal
        # constants, which makes XLA/Mosaic compiles orders of magnitude
        # slower (measured 287s vs 0.6s for one identical Pallas kernel) and
        # adds per-call dispatch overhead.
        if backend == "pallas":
            from fesom2_accelerate_tpu.ops.pallas import step as pstep

            assert cfg.dtype == jnp.float32, "pallas backend is f32-only"
            # form: "auto" picks the packed/DIA fast forms when the mesh
            # admits them; "onehot" forces the fallback kernels (the
            # tuner's / on-chip parity probe's form axis); "packed"
            # requires the fast forms (raises otherwise)
            kw = {}
            if form == "onehot":
                kw = dict(dia_max=0, pack_pmax=0)
            self.pd, self.ps = pstep.build_pallas_data(
                mesh, tile=tile, chunk=chunk, scatter_chunk=scatter_chunk,
                **kw)
            if form == "packed" and not (self.ps.pack_K
                                         and self.ps.a3f_dia_D):
                raise ValueError("mesh does not admit the packed/DIA forms")
            self.md = self.pd.md
            self._mesh_arg = self.pd
            ps, c = self.ps, self.cfg

            def step_fn(mesh_arg, state):
                return pstep.fct_ale_step_pallas(mesh_arg, ps, c, state)

            # multi-step runs carry PADDED state through the scan so the
            # per-step pad/slice work happens once, not every step
            def scan_step_fn(mesh_arg, state):
                return pstep.fct_ale_step_pallas_padded(mesh_arg, ps, c,
                                                        state)

            # pad/unpad take the mesh arg too: the packed edge layout's
            # edge<->slot maps live in PallasData (step.pad_state)
            self._scan_pre = lambda m, s: pstep.pad_state(ps, s, m)
            self._scan_post = lambda m, s: pstep.unpad_state(ps, s, m)
            self._scan_step_fn = scan_step_fn
        else:
            self.md = build_mesh_data(mesh, dtype=cfg.dtype)
            self._mesh_arg = self.md
            c = self.cfg

            def step_fn(mesh_arg, state):
                return fct_ale_step(mesh_arg, c, state)

            self._scan_pre = self._scan_post = lambda m, s: s
            self._scan_step_fn = step_fn

        self._step_fn = step_fn
        # NOTE: no donate_argnums — buffer donation makes XLA:TPU compile the
        # gather-heavy step ~60x slower and the compiled step ~50x slower on
        # this backend (measured: 309s/64ms vs 4.7s/1.1ms per pi-mesh step)
        self._step = jax.jit(step_fn)

    def init_state(self, fields: dict) -> dict:
        return {
            k: jnp.asarray(v, dtype=self.cfg.dtype) for k, v in fields.items()
        }

    def step(self, state: dict) -> dict:
        return self._step(self._mesh_arg, state)

    def run(self, state: dict, n_steps: int) -> dict:
        """n_steps of the step function under lax.scan (on-device loop)."""
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if n_steps not in self._scan_cache:
            step_fn = self._scan_step_fn
            pre, post = self._scan_pre, self._scan_post

            @jax.jit
            def scan_steps(mesh_arg, s):
                s = pre(mesh_arg, s)

                def body(c, _):
                    new = step_fn(mesh_arg, c)
                    # carry keeps the input structure: drop diagnostics
                    return {k: new[k] for k in c}, None

                s, _ = jax.lax.scan(body, s, None, length=n_steps)
                return post(mesh_arg, s)

            self._scan_cache[n_steps] = scan_steps
        return self._scan_cache[n_steps](self._mesh_arg, state)

    # ---- multi-tracer batching (pallas backend) --------------------------
    # The host model advects many tracers per timestep over one mesh; the
    # reference runs one full library call per tracer (reference
    # include/fesom2-accelerate.h:213-236).  Here Tb tracers run through a
    # single compiled chain on a (tiles, tracers) grid: connectivity/int
    # maps and per-pass overheads amortize by Tb (ops/pallas/step.py).

    def init_state_tracers(self, fields: dict) -> dict:
        """Upload multi-tracer state to the device ONCE (per-tracer fields
        [Tb, L, N] family, ``hnode``/``hnode_new`` shared [L, N]) — like
        :meth:`init_state`, so repeated step/run calls do not re-transfer
        host arrays through the (slow) tunnel."""
        return {k: jnp.asarray(v, dtype=self.cfg.dtype)
                for k, v in fields.items()}

    def step_tracers(self, state: dict) -> dict:
        """One step on multi-tracer state: per-tracer fields [Tb, L, N]
        family, ``hnode``/``hnode_new`` shared [L, N].  Natural shapes in
        and out."""
        assert self.backend == "pallas", "tracer batching is pallas-only"
        from fesom2_accelerate_tpu.ops.pallas import step as pstep

        Tb = state["ttf"].shape[0]
        if not hasattr(self, "_trc_step_cache"):
            self._trc_step_cache = {}
        if Tb not in self._trc_step_cache:
            ps, c = self.ps, self.cfg

            def stepf(pd, s):
                return pstep.fct_ale_step_pallas_batched(pd, ps, c, s)

            self._trc_step_cache[Tb] = jax.jit(stepf)
        return self._trc_step_cache[Tb](
            self.pd, {k: jnp.asarray(v, self.cfg.dtype)
                      for k, v in state.items()})

    def run_tracers(self, state: dict, n_steps: int) -> dict:
        """n_steps of the batched step under lax.scan (padded carry)."""
        assert self.backend == "pallas", "tracer batching is pallas-only"
        from fesom2_accelerate_tpu.ops.pallas import step as pstep

        Tb = state["ttf"].shape[0]
        if not hasattr(self, "_trc_run_cache"):
            self._trc_run_cache = {}
        key = (Tb, n_steps)
        if key not in self._trc_run_cache:
            ps, c = self.ps, self.cfg

            @jax.jit
            def scan_steps(pd, s):
                s = pstep.pad_state_batched(ps, s, pd)

                def body(carry, _):
                    new = pstep.fct_ale_step_pallas_padded_batched(
                        pd, ps, c, carry, Tb)
                    return {k: new[k] for k in carry}, None

                s, _ = jax.lax.scan(body, s, None, length=n_steps)
                return pstep.unpad_state_batched(ps, s, Tb, pd)

            self._trc_run_cache[key] = scan_steps
        return self._trc_run_cache[key](
            self.pd, {k: jnp.asarray(v, self.cfg.dtype)
                      for k, v in state.items()})

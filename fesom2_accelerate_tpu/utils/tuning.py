"""Autotuning harness for the Pallas kernels.

The reference ships one kernel_tuner module per kernel that sweeps launch
configurations, validates each against a numpy reference, and reports the
effective bandwidth of the best (kernels/fct_ale_a1.py:57-96).  This is the
TPU equivalent, one entry per kernel family:

* ``tune_kernels``  — K1 bounds (dia/one-hot), K2 limit, K3 b3h, K4 update
  (packed/one-hot), sweeping (form, tile, chunk, scatter_chunk); every
  configuration's full chain is validated against the f64 numpy oracle
  before it is timed (the reference's ``answer=`` discipline), and each
  kernel is timed inside a jitted lax.scan with a forced data dependency
  (true device time on the tunneled backend).
* ``tune_a2``       — the standalone a2 element-bounds kernel.
* ``tune_step``     — the whole fused step.
* ``tune_stress2rhs`` — the second workload's scatter kernel.

Results carry the achieved GB/s against the reference-style bytes models
(runtime/profiling.py) and can be dumped to JSON like the reference's
``--store`` flag (scripts/tune.py).  The shipped defaults (step.TILE,
step.TILE_ONEHOT, chunk sizes) are the winners of these sweeps on the
CORE2 preset — see perf/tune_*.json.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


@dataclasses.dataclass
class TuneResult:
    params: dict
    ms: float
    gbps: float
    max_relerr: float
    ok: bool


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[0] if isinstance(x, tuple) else x))


def best(results):
    ok = [r for r in results if r.ok]
    return min(ok, key=lambda r: r.ms) if ok else None


def store(results, path):
    with open(path, "w") as f:
        json.dump([dataclasses.asdict(r) for r in results], f, indent=2)


def _relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1.0))


def _kernel_bytes(mesh, itemsize=4):
    """Per-family reference-style bytes models (BASELINE.md table)."""
    nod = int(np.sum(mesh.nlev_nod - 1))
    edge = int(np.sum(mesh.nlev_edge))
    deg_d = int(np.sum(mesh.node_edges_num * (mesh.nlev_nod - 1)))
    vint = int(np.sum(mesh.nlev_nod))
    f = itemsize
    return {
        # a1+a2+a3 fused: read lo/ttf, neighbor gather per incidence,
        # write tmax/tmin
        "bounds": (4 * nod + 2 * deg_d) * f,
        # b1v+b1h+b2+b3v: read adf_v, tt pair, area_inv, adf_h per
        # incidence; write pm pair, limited adf_v
        "limit": (2 * vint + 5 * nod + deg_d) * f,
        # b3h: gather pm at both ends, read + write adf_h
        "b3h": 6 * edge * f,
        # c: read 7 node fields + adf_v + adf_h per incidence; write 2
        "update": (9 * nod + vint + deg_d) * f,
    }


def default_configs(packed_ok: bool):
    """The swept launch-configuration space (form, tile, chunks)."""
    cfgs = []
    if packed_ok:
        for tile in (256, 512, 1024, 2048):
            cfgs.append(dict(form="packed", tile=tile))
    for tile, chunk, sc in ((256, 1024, 512), (256, 512, 256),
                            (512, 1024, 512)):
        cfgs.append(dict(form="onehot", tile=tile, chunk=chunk,
                         scatter_chunk=sc))
    return cfgs


class _Chain:
    """Per-config kernel callables K1..K4 (form-dispatched), built once."""

    def __init__(self, mesh, config, cfg):
        from fesom2_accelerate_tpu.ops.pallas import step as pstep

        kw = dict(tile=config["tile"])
        if config["form"] == "onehot":
            kw.update(pack_pmax=0, dia_max=0,
                      chunk=config.get("chunk"),
                      scatter_chunk=config.get("scatter_chunk"))
        self.pd, self.ps = pstep.build_pallas_data(mesh, **kw)
        self.pstep = pstep
        self.cfg = cfg
        self.packed = self.ps.pack_K > 0
        if config["form"] == "packed" and not self.packed:
            raise ValueError("mesh does not admit the packed layout")

    def k1(self, pd, lo, ttf):
        from fesom2_accelerate_tpu.ops.pallas import kernels

        ps, cfg = self.ps, self.cfg
        if ps.a3f_dia_D:
            from fesom2_accelerate_tpu.ops.pallas.step import _dia_rems

            return kernels.bounds_dia_dma_pallas(
                lo, ttf, pd.a3f_dia_wb, pd.a3f_dia_lev, pd.nlev_nod_row,
                tile=ps.tile, nblocks=ps.a3f_un_nblocks, D=ps.a3f_dia_D,
                rems=_dia_rems(ps), vlimit=cfg.vlimit)
        return kernels.bounds_pallas(
            lo, ttf, pd.a3f_lidx_lo, pd.a3f_lev_lo, pd.a3f_lidx_hi,
            pd.a3f_lev_hi, pd.a3f_wb, pd.nlev_nod_row, tile=ps.tile,
            nblocks_lo=ps.a3f_lo_nblocks, nblocks_hi=ps.a3f_hi_nblocks,
            K_lo=ps.K_lo, K_hi=ps.K_hi, vlimit=cfg.vlimit, chunk=ps.chunk)

    def k2(self, pd, s, tt):
        from fesom2_accelerate_tpu.ops.pallas import kernels, kernels_packed

        ps, cfg = self.ps, self.cfg
        if self.packed:
            return kernels_packed.limit_packed_pallas(
                s["fct_adf_v"], tt, pd.area_inv_pad, s["fct_adf_h"],
                pd.pk_lev_home, pd.pk_sc_lev, pd.pk_sc_wb, pd.nlev_nod_row,
                tile=ps.tile, J=ps.pack_J_sc, K=ps.pack_K, Pk=ps.pack_Pk_s,
                L=ps.L, dt=float(cfg.dt), flux_eps=float(cfg.flux_eps))[:2]
        return kernels.limit_pallas(
            s["fct_adf_v"], tt, pd.area_inv_pad, s["fct_adf_h"],
            pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb,
            pd.nlev_nod_row, tile=ps.tile, nblocks_lo=ps.ne_lo_nblocks,
            nblocks_hi=ps.ne_hi_nblocks, L=ps.L, dt=float(cfg.dt),
            flux_eps=float(cfg.flux_eps), chunk=ps.scatter_chunk)[:2]

    def k3(self, pd, s, pm):
        from fesom2_accelerate_tpu.ops.pallas import kernels, kernels_packed

        ps = self.ps
        if self.packed:
            return kernels_packed.b3h_packed_pallas(
                pm, s["fct_adf_h"], pd.pk_lev_home, pd.pk_g_ind, pd.pk_g_wb,
                tile=ps.tile, J=ps.pack_J_g, K=ps.pack_K, Pk=ps.pack_Pk_g,
                with_resid=False)[0]
        return kernels.b3h_pallas(
            pm, s["fct_adf_h"], pd.b3h_lidx_lo, pd.b3h_lidx_hi, pd.b3h_wb,
            pd.nlev_edge_row, tile=ps.tile, nblocks_lo=ps.b3h_lo_nblocks,
            nblocks_hi=ps.b3h_hi_nblocks, chunk=ps.chunk)[0]

    def k4(self, pd, s, av, ah):
        from fesom2_accelerate_tpu.ops.pallas import kernels, kernels_packed

        ps, cfg = self.ps, self.cfg
        if self.packed:
            return kernels_packed.update_packed_pallas(
                av, s["ttf"], s["hnode"], s["hnode_new"], s["fct_LO"],
                s["del_ttf_advvert"], s["del_ttf_advhoriz"],
                pd.area_inv_pad, ah, pd.pk_lev_home, pd.pk_sc_lev,
                pd.pk_sc_wb, pd.nlev_nod_row, tile=ps.tile, J=ps.pack_J_sc,
                K=ps.pack_K, Pk=ps.pack_Pk_s, L=ps.L, dt=float(cfg.dt),
                iter_yn=cfg.iter_yn)
        return kernels.update_pallas(
            av, s["ttf"], s["hnode"], s["hnode_new"], s["fct_LO"],
            s["del_ttf_advvert"], s["del_ttf_advhoriz"], pd.area_inv_pad,
            ah, pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb,
            pd.nlev_nod_row, tile=ps.tile, nblocks_lo=ps.ne_lo_nblocks,
            nblocks_hi=ps.ne_hi_nblocks, L=ps.L, dt=float(cfg.dt),
            iter_yn=cfg.iter_yn, chunk=ps.scatter_chunk)


def tune_kernels(mesh, configs=None, iters=30, rtol=2e-5, preset_name=""):
    """Sweep per-kernel launch configs; validate the FULL chain of each
    config against the f64 oracle, then time each kernel under scan.

    Returns {family: [TuneResult, ...]}."""
    import jax
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh.generate import random_fields
    from fesom2_accelerate_tpu.ops import oracle
    from fesom2_accelerate_tpu.ops.pallas import step as pstep

    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    fields = random_fields(mesh, seed=0, dtype=np.float32)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=1, dt=float(cfg.dt), flux_eps=float(cfg.flux_eps))
    nb = _kernel_bytes(mesh)

    # packed admissibility probe (cheap, host-only)
    probe = pstep.build_pallas_data(mesh, xp=np)[1]
    if configs is None:
        configs = default_configs(probe.pack_K > 0)

    out = {f: [] for f in ("bounds", "limit", "b3h", "update")}
    eps = jnp.float32(1e-30)
    for config in configs:
        ch = _Chain(mesh, config, cfg)
        pd, ps = ch.pd, ch.ps
        state = pstep.pad_state(
            ps, {k: jnp.asarray(v) for k, v in fields.items()}, pd)
        Lp, L, N = ps.Lp, ps.L, ps.N

        # ---- validate the chain vs the oracle --------------------------
        tt = ch.k1(pd, state["fct_LO"], state["ttf"])
        pm, av = ch.k2(pd, state, tt)
        ah = ch.k3(pd, state, pm)
        o1, o2 = ch.k4(pd, state, av, ah)
        ah_nat = (pstep._unpack_edge_field(ps, pd, ah) if ch.packed
                  else ah[:L, :ps.Ed])
        errs = {
            "bounds": max(_relerr(tt[:L, :N], ref["fct_ttf_max"]),
                          _relerr(tt[Lp:Lp + L, :N], ref["fct_ttf_min"])),
            "limit": max(_relerr(pm[:L, :N], ref["fct_plus"]),
                         _relerr(pm[Lp:Lp + L, :N], ref["fct_minus"]),
                         _relerr(av[:L + 1, :N], ref["fct_adf_v"])),
            "b3h": _relerr(ah_nat, ref["fct_adf_h"]),
            "update": max(_relerr(o1[:L, :N], ref["del_ttf_advvert"]),
                          _relerr(o2[:L, :N], ref["del_ttf_advhoriz"])),
        }

        # ---- time each family under scan (forced dependency) ----------
        def scan_k1(pd, s):
            def body(lo, _):
                t = ch.k1(pd, lo, s["ttf"])
                return lo + eps * t[:Lp], None
            return jax.lax.scan(body, s["fct_LO"], None, length=iters)[0]

        def scan_k2(pd, s):
            def body(t, _):
                p, _a = ch.k2(pd, s, t)
                return t + eps * p, None
            return jax.lax.scan(body, tt, None, length=iters)[0]

        def scan_k3(pd, s):
            def body(p, _):
                a = ch.k3(pd, s, p)
                if ch.packed:
                    d = a[:2 * Lp, :ps.Np]
                else:
                    d = jnp.concatenate([a[:Lp, :ps.Np], a[:Lp, :ps.Np]])
                return p + eps * d, None
            return jax.lax.scan(body, pm, None, length=iters)[0]

        def scan_k4(pd, s):
            def body(a, _):
                x1, x2 = ch.k4(pd, s, a, ah)
                return a + eps * jnp.concatenate(
                    [x1, x2])[:a.shape[0]], None
            return jax.lax.scan(body, av, None, length=iters)[0]

        scans = {"bounds": scan_k1, "limit": scan_k2, "b3h": scan_k3,
                 "update": scan_k4}
        for fam, scan in scans.items():
            jf = jax.jit(scan)
            _sync(jf(pd, state))
            t0 = time.perf_counter()
            _sync(jf(pd, state))
            ms = (time.perf_counter() - t0) / iters * 1e3
            form = config["form"]
            if fam == "bounds":
                form = "dia" if ps.a3f_dia_D else "onehot"
            out[fam].append(TuneResult(
                params={**config, "kernel_form": form,
                        "preset": preset_name},
                ms=round(ms, 4),
                gbps=round(nb[fam] / (ms * 1e-3) / 1e9, 2),
                max_relerr=errs[fam],
                ok=bool(errs[fam] < rtol),
            ))
    return out


def tune_a2(mesh, tiles=(128, 256, 512), iters=20, rtol=1e-5):
    """Sweep a2_pallas tile sizes; validate vs oracle; report bandwidth."""
    import jax
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.mesh.generate import random_fields
    from fesom2_accelerate_tpu.ops import oracle
    from fesom2_accelerate_tpu.ops.pallas import kernels
    from fesom2_accelerate_tpu.ops.pallas import step as pstep

    fields = random_fields(mesh, seed=0, dtype=np.float32)
    mk = oracle.masks(mesh)
    tmax64, tmin64 = oracle.a1(
        mesh, mk, fields["fct_LO"].astype(np.float64),
        fields["ttf"].astype(np.float64),
    )
    UV_ref = oracle.a2(mesh, mk, tmax64, tmin64)

    elem_active = int(np.sum(mesh.nlev_elem - 1))
    nbytes = (6 * elem_active + 2 * mesh.n_layers * mesh.n_elems) * 4

    results = []
    for tile in tiles:
        pd, ps = pstep.build_pallas_data(mesh, tile=tile)
        L, Lp = ps.L, ps.Lp
        tmax = np.zeros((Lp, ps.Np), np.float32)
        tmin = np.zeros((Lp, ps.Np), np.float32)
        tmax[:L, : ps.N] = tmax64
        tmin[:L, : ps.N] = tmin64
        src = jnp.asarray(np.concatenate([tmax, tmin]), jnp.float32)

        def fn(src, lidx, wb, nlev):
            return kernels.a2_pallas(src, lidx, wb, nlev, tile=tile,
                                     nblocks=ps.a2_nblocks, bignumber=1e3)

        jf = jax.jit(fn)
        out = jf(src, pd.a2_lidx, pd.a2_wb, pd.nlev_elem_row)
        _sync(out)
        got_max = np.asarray(out[:L, : ps.E], np.float64)
        got_min = np.asarray(out[Lp:Lp + L, : ps.E], np.float64)
        err = max(
            np.abs(got_max - UV_ref[0]).max() / max(np.abs(UV_ref[0]).max(), 1),
            np.abs(got_min - UV_ref[1]).max() / max(np.abs(UV_ref[1]).max(), 1),
        )
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(src, pd.a2_lidx, pd.a2_wb, pd.nlev_elem_row)
        _sync(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        results.append(TuneResult(
            params=dict(tile=tile, nblocks=ps.a2_nblocks),
            ms=round(ms, 4),
            gbps=round(nbytes / (ms * 1e-3) / 1e9, 2),
            max_relerr=float(err),
            ok=bool(err < rtol),
        ))
    return results


def tune_step(mesh, tiles=(256, 512, 1024, 2048, 4096), steps=10, rtol=1e-4,
              preset_name=""):
    """Sweep the fused Pallas step's tile size; validate each configuration
    against the f64 numpy oracle; report time + throughput.

    The whole-step analogue of the reference's per-kernel tuning
    (kernel_tuner `tune_kernel` with `answer=`, kernels/fct_ale_a1.py:57-96):
    every swept configuration is also a correctness test.  (tile=128 is
    excluded by default: Mosaic promotes the [Edp, 1] id columns to SMEM at
    that tile count and overflows its 1 MiB budget on CORE2-scale meshes.)"""
    import jax
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh.generate import random_fields
    from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver
    from fesom2_accelerate_tpu.ops import oracle
    from fesom2_accelerate_tpu.runtime.profiling import (
        fct_ale_step_bytes,
        grid_points,
    )

    fields = random_fields(mesh, seed=0, dtype=np.float32)
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=1, dt=0.5, flux_eps=1e-7,
    )
    nbytes = fct_ale_step_bytes(mesh, 4)
    gp = grid_points(mesh)

    results = []
    for tile in tiles:
        solver = FctAleSolver(mesh, cfg, backend="pallas", tile=tile)
        state = solver.init_state(fields)
        out = solver.step(state)
        err = 0.0
        for k in ("fct_plus", "fct_minus", "del_ttf_advvert",
                  "del_ttf_advhoriz", "fct_adf_h"):
            a = np.asarray(out[k], np.float64)
            err = max(err, np.abs(a - ref[k]).max()
                      / max(np.abs(ref[k]).max(), 1.0))
        run = solver.run(state, steps)
        _sync(run["fct_adf_h"])
        t0 = time.perf_counter()
        run = solver.run(state, steps)
        _sync(run["fct_adf_h"])
        ms = (time.perf_counter() - t0) / steps * 1e3
        results.append(TuneResult(
            params=dict(tile=tile, preset=preset_name,
                        form="packed" if solver.ps.pack_K else "onehot"),
            ms=round(ms, 4),
            gbps=round(nbytes / (ms * 1e-3) / 1e9, 2),
            max_relerr=float(err),
            ok=bool(err < rtol),
        ))
    return results


def tune_stress2rhs(mesh, tiles=(128, 256, 512, 1024, 2048), iters=300,
                    rtol=1e-5, forms=("packed", "onehot")):
    """Sweep the stress2rhs scatter over (form, tile) vs the XLA backend
    (the f64-vs-oracle gate lives in the CPU test suite; on-device the XLA
    f32 path is the available reference).

    Timing is SCAN-CHAINED (the carry feeds the next call) — ``iters``
    un-chained dispatches with one trailing sync measure dispatch
    pipelining, not device time (the round-2 bench.py lesson; this sweep
    regressed it in round 3, VERDICT weak #4).  ``iters`` defaults to 300:
    the tunneled backend adds ~25-50 ms RPC latency per TIMED CALL, so a
    30-iteration scan overstates a ~0.3 ms kernel by ~1 ms/call — the
    round-4 '1.01 ms' stress2rhs figure was exactly this artifact
    (BASELINE.md round-5 note)."""
    import jax
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.model.stress2rhs import Stress2RhsSolver
    from fesom2_accelerate_tpu.runtime.profiling import stress2rhs_bytes

    rng = np.random.default_rng(7)
    E, N = mesh.n_elems, mesh.n_nodes
    host = (np.abs(rng.standard_normal(E)) + 0.1, rng.standard_normal(E),
            *rng.standard_normal((3, E)), rng.standard_normal((6, E)),
            rng.standard_normal(E), rng.standard_normal(N),
            *rng.standard_normal((2, N)))
    ref = Stress2RhsSolver(mesh, dtype=jnp.float32, backend="xla")(*host)
    nbytes = stress2rhs_bytes(mesh, 4)
    results = []
    for form in forms:
        for tile in tiles:
            try:
                solver = Stress2RhsSolver(mesh, dtype=jnp.float32,
                                          backend="pallas", tile=tile,
                                          form=form)
            except (ValueError, AssertionError):
                continue  # form not admissible on this mesh at this tile
            dargs = [jnp.asarray(a, jnp.float32) for a in host]
            out = solver(*dargs)
            err = max(_relerr(out[0], ref[0]), _relerr(out[1], ref[1]))

            # resident-state per-substep call, like bench.py: element state
            # packed once (packed form) or passed per call (one-hot)
            eps = jnp.asarray(1e-30, jnp.float32)
            rhs_m = dargs[-1]
            if getattr(solver, "_packed", False):
                packed_el = solver.pack_elem_inputs(*dargs[:7])
                extra = (solver._pk_wb, solver._pk_hc, solver._pk_ind,
                         packed_el, dargs[7])

                def call1(extra, ra, rm, _s=solver):
                    return _s._call_packed(*extra, ra, rm)
            else:
                extra = (solver._wb2, *solver._ids, *dargs[:-2])

                def call1(extra, ra, rm, _s=solver):
                    return _s._fn(*extra, ra, rm)

            @jax.jit
            def scan_calls(extra, rhs_a, rhs_m, _call1=call1):
                def body(ra, _):
                    u, _v = _call1(extra, ra, rhs_m)
                    return ra + eps * u, None

                out, _ = jax.lax.scan(body, rhs_a, None, length=iters)
                return out

            _sync(scan_calls(extra, dargs[-2], rhs_m))
            t0 = time.perf_counter()
            _sync(scan_calls(extra, dargs[-2], rhs_m))
            ms = (time.perf_counter() - t0) / iters * 1e3
            results.append(TuneResult(
                params=dict(tile=tile, form=form),
                ms=round(ms, 4),
                gbps=round(nbytes / (ms * 1e-3) / 1e9, 2),
                max_relerr=float(err),
                ok=bool(err < rtol),
            ))
    return results

"""Autotuning harness for the Pallas kernels.

The reference ships one kernel_tuner module per kernel that sweeps launch
configurations, validates each against a numpy reference, and reports the
effective bandwidth of the best (kernels/fct_ale_a1.py:57-96).  This is the
TPU equivalent: sweep the Pallas tile size / contraction chunk, validate
each configuration against the numpy oracle, time it, and report achieved
bandwidth against the bytes models.

Results can be dumped to JSON like the reference's ``--store`` flag.
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


def tune_step(mesh, tiles=(256, 512), steps=10, rtol=1e-4,
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
    from fesom2_accelerate_tpu.ops.pallas import step as pstep
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
            params=dict(tile=tile, preset=preset_name),
            ms=round(ms, 4),
            gbps=round(nbytes / (ms * 1e-3) / 1e9, 2),
            max_relerr=float(err),
            ok=bool(err < rtol),
        ))
    return results


def best(results):
    ok = [r for r in results if r.ok]
    return min(ok, key=lambda r: r.ms) if ok else None


def store(results, path):
    with open(path, "w") as f:
        json.dump([dataclasses.asdict(r) for r in results], f, indent=2)

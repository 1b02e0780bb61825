#!/usr/bin/env python
"""Multi-device scaling harness: grid-points/s/chip at 1..N subdomains.

On real multi-chip hardware this measures halo-overlap scaling efficiency
(BASELINE.md target: >=80% at N>=2 hosts).  On a single-chip or CPU host it
still validates the sharded path end-to-end and reports per-device
throughput over the virtual device mesh (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
for an 8-way functional run).

A HARNESS, not a smoke test: at every device count the sharded result is
checked against the single-device solver (fails the run on mismatch), and
``--min-efficiency`` turns the per-chip efficiency into a hard gate on
real multi-chip hardware (virtual CPU meshes share one socket's memory
bandwidth, so efficiency there is reported but only gated if asked).

Prints one JSON line per device count + a final summary line.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="pi")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max-devices", type=int, default=0,
                    help="0 = all available")
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--min-efficiency", type=float, default=0.0,
                    help="fail below this per-chip efficiency at N>=2 "
                    "(use >=0.8 on real multi-chip hardware)")
    ap.add_argument("--check-rtol", type=float, default=2e-6,
                    help="sharded-vs-single tolerance (f32 summation order)")
    args = ap.parse_args()

    import os

    import jax

    # honor JAX_PLATFORMS even against accelerator plugins that ignore the
    # env var (the tunneled axon backend does — same guard as
    # __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    import jax.numpy as jnp

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver
    from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver
    from fesom2_accelerate_tpu.runtime.profiling import grid_points

    mesh = generate_planar_mesh(preset=args.preset)
    fields = random_fields(mesh, seed=0, dtype=np.float64)
    cfg = FctAleConfig(dt=0.5, iter_yn=True, dtype=jnp.float32,
                       flux_eps=1e-7)
    gp = grid_points(mesh)

    devices = jax.devices()
    nmax = args.max_devices or len(devices)
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= nmax]

    if args.backend == "pallas" and devices[0].platform == "cpu":
        # plain interpret=True on the virtual CPU mesh (NOT the TPU-sim,
        # whose global per-kernel barrier deadlocks under shard_map when
        # the virtual devices oversubscribe the host cores)
        from fesom2_accelerate_tpu.ops.pallas import kernels as pk

        pk.set_interpret(True)

    # single-device reference for the exactness gate (same n_steps)
    ref_solver = FctAleSolver(mesh, cfg, backend=args.backend)
    ref_state = ref_solver.run(ref_solver.init_state(fields), args.steps)
    ref_lo = np.asarray(ref_state["fct_LO"], np.float64)
    scale = max(np.abs(ref_lo).max(), 1.0)

    base_gps = None
    failures = []
    rows = []
    for n in counts:
        solver = ShardedFctAleSolver(mesh, cfg, devices=devices[:n],
                                     backend=args.backend)
        state = solver.init_state(fields)
        out = solver.run(state, args.steps)
        # exactness gate: every device count must reproduce the
        # single-device integration (owned nodes)
        got = solver.gather_node(out["fct_LO"])
        got = np.asarray(got, np.float64)[: ref_lo.shape[0]]
        relerr = float(np.abs(got - ref_lo).max() / scale)
        ok = relerr < args.check_rtol
        if not ok:
            failures.append(f"devices={n}: fct_LO relerr {relerr:.2e}")
        float(jnp.sum(out["fct_LO"]))  # sync
        t0 = time.perf_counter()
        out = solver.run(state, args.steps)
        float(jnp.sum(out["fct_LO"]))
        dt = (time.perf_counter() - t0) / args.steps
        gps = gp / dt
        per_chip = gps / n
        if base_gps is None:
            base_gps = per_chip
        eff = per_chip / base_gps
        if n >= 2 and args.min_efficiency and eff < args.min_efficiency:
            failures.append(f"devices={n}: efficiency {eff:.3f} < "
                            f"{args.min_efficiency}")
        row = {
            "metric": f"fct_ale_sharded_{args.preset}",
            "devices": n,
            "value": round(gps, 1),
            "unit": "grid-points/s",
            "per_chip": round(per_chip, 1),
            "efficiency_vs_1": round(eff, 4),
            "step_ms": round(dt * 1e3, 3),
            "exact_vs_single": ok,
            "relerr_vs_single": relerr,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "summary": "scaling",
        "preset": args.preset,
        "backend": args.backend,
        "counts": counts,
        "all_exact": not any(f.startswith("devices") and "relerr" in f
                             for f in failures),
        "failures": failures,
    }))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Multi-device scaling harness: grid-points/s/chip at 1..N subdomains.

On real multi-chip hardware this measures halo-overlap scaling efficiency
(BASELINE.md target: >=80% at N>=2 hosts).  On a single-chip or CPU host it
still validates the sharded path end-to-end and reports per-device
throughput over the virtual device mesh (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
for an 8-way functional run).

Prints one JSON line per device count.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="pi")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max-devices", type=int, default=0,
                    help="0 = all available")
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
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

    base_gps = None
    for n in counts:
        solver = ShardedFctAleSolver(mesh, cfg, devices=devices[:n],
                                     backend=args.backend)
        state = solver.init_state(fields)
        out = solver.run(state, args.steps)
        float(jnp.sum(out["fct_LO"]))  # sync
        t0 = time.perf_counter()
        out = solver.run(state, args.steps)
        float(jnp.sum(out["fct_LO"]))
        dt = (time.perf_counter() - t0) / args.steps
        gps = gp / dt
        per_chip = gps / n
        if base_gps is None:
            base_gps = per_chip
        print(json.dumps({
            "metric": f"fct_ale_sharded_{args.preset}",
            "devices": n,
            "value": round(gps, 1),
            "unit": "grid-points/s",
            "per_chip": round(per_chip, 1),
            "efficiency_vs_1": round(per_chip / base_gps, 4),
            "step_ms": round(dt * 1e3, 3),
        }))


if __name__ == "__main__":
    main()

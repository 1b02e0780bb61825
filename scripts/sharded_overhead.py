#!/usr/bin/env python
"""Quantify the NON-communication overhead of the sharded program on ONE chip.

The ≥80% multi-host scaling target (BASELINE.md) has two cost components:
(1) the ICI/DCN halo exchange — unmeasurable on this 1-chip rig, and
(2) everything decomposition adds to the compiled program itself:
shard_map plumbing, the (trivial at P=1) exchange collective, and the
boundary-tile fixup recompute that pays for overlapping K3 with the
exchange.  Component (2) IS measurable here, in two pieces:

* ``sharded_1dev``:  the 1-device ShardedFctAleSolver scan vs the plain
  solver scan — bounds the shard_map + collective-plumbing tax;
* ``fixup_overlap``: the full-mesh padded chain with a synthetic
  bandwidth-wide halo mask and identity exchange vs the plain chain —
  bounds the fixup-recompute tax a real boundary part pays per step.

Writes perf/sharded_overhead.json.  Usage:
    python scripts/sharded_overhead.py [--preset core2] [--steps 300]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# prefer the installed package (pip install -e .); fall back to the
# checkout layout so a clean clone still runs without an install step
try:  # noqa: SIM105
    import fesom2_accelerate_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="core2")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="perf/sharded_overhead.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver
    from fesom2_accelerate_tpu.ops.pallas import step as pstep
    from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver

    dev = jax.devices()[0]
    mesh = generate_planar_mesh(preset=args.preset)
    fields = random_fields(mesh, seed=0, dtype=np.float64)
    fields32 = {k: v.astype(np.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)

    def sync(out):
        k = "fct_adf_h" if "fct_adf_h" in out else next(iter(out))
        return float(jnp.sum(out[k]))

    def best3(fn):
        sync(fn())  # warmup/compile
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn())
            dt = min(dt, (time.perf_counter() - t0) / args.steps)
        return dt

    record = {"device": str(getattr(dev, "device_kind", dev)),
              "preset": args.preset, "steps": args.steps,
              "unix_time": int(time.time())}

    # ---- baseline: the plain fused chain --------------------------------
    solver = FctAleSolver(mesh, cfg, backend="pallas")
    state = solver.init_state(fields32)
    t_plain = best3(lambda: solver.run(state, args.steps))
    record["plain_step_ms"] = round(t_plain * 1e3, 3)
    print(f"plain chain: {t_plain * 1e3:.3f} ms/step", flush=True)

    # ---- 1-device sharded program ---------------------------------------
    sh = ShardedFctAleSolver(mesh, cfg, devices=[dev], backend="pallas")
    assert sh.ps.pack_K > 0 and sh.degraded == []
    sstate = sh.init_state(fields32)
    t_sh = best3(lambda: sh.run(sstate, args.steps))
    record["sharded_1dev_step_ms"] = round(t_sh * 1e3, 3)
    record["sharded_1dev_overhead_ms"] = round((t_sh - t_plain) * 1e3, 3)
    print(f"sharded (P=1): {t_sh * 1e3:.3f} ms/step "
          f"(+{(t_sh - t_plain) * 1e3:.3f})", flush=True)

    # ---- fixup-overlap program (boundary part emulation) ----------------
    bw = int(np.abs(np.diff(mesh.edges.astype(np.int64), axis=1)).max())
    H = min(max(bw, 128), mesh.n_nodes // 4)
    halo = np.zeros(mesh.n_nodes, dtype=bool)
    halo[:H] = True
    halo[mesh.n_nodes - H:] = True
    pdf, psf = pstep.build_pallas_data(mesh, halo_mask=halo)
    assert psf.n_fix_tiles > 0 and psf.pack_K > 0

    def ident(x):
        return x

    @jax.jit
    def scan_fix(pd, s):
        def body(c, _):
            new = pstep.fct_ale_step_pallas_padded(pd, psf, cfg, c,
                                                   exchange=ident)
            return {k: new[k] for k in c}, None

        s, _ = jax.lax.scan(body, s, None, length=args.steps)
        return s

    pstate = pstep.pad_state(psf, fields32, pdf)
    pstate = {k: jnp.asarray(v) for k, v in pstate.items()}
    t_fix = best3(lambda: scan_fix(pdf, pstate))
    record["fixup_overlap_step_ms"] = round(t_fix * 1e3, 3)
    record["fixup_overhead_ms"] = round((t_fix - t_plain) * 1e3, 3)
    record["fixup_halo_width"] = H
    record["fixup_n_fix_tiles"] = psf.n_fix_tiles
    print(f"fixup overlap (H={H}, {psf.n_fix_tiles} fix tiles): "
          f"{t_fix * 1e3:.3f} ms/step (+{(t_fix - t_plain) * 1e3:.3f})",
          flush=True)

    record["sharded_1dev_efficiency"] = round(t_plain / t_sh, 4)
    record["fixup_efficiency"] = round(t_plain / t_fix, 4)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()

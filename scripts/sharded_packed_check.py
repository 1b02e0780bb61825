#!/usr/bin/env python
"""Sharded-production-form evidence artifact (round-4 verdict task 1).

Proves, on the 8-way virtual CPU mesh, that the domain-decomposed solver
runs the PRODUCTION kernel forms on every part — packed home-slot K2/K3/K4
(pack_K > 0), DIA K1 (a3f_dia_D > 0), neighbor-only ppermute exchange —
and still matches the single-device step exactly where it must.  Writes
``perf/sharded_packed.json``.  (Per-shard on-chip timing is not
measurable on this rig's single tunneled chip; the functional virtual-mesh
record is the committed evidence, per the round-3 verdict.)

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/sharded_packed_check.py
"""

import json
import os
import sys

# prefer the installed package (pip install -e .); fall back to the
# checkout layout so a clean clone still runs without an install step
try:  # noqa: SIM105
    import fesom2_accelerate_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver
    from fesom2_accelerate_tpu.ops.pallas import kernels as pk
    from fesom2_accelerate_tpu.ops.pallas import step as pstep
    from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver

    record = {"n_devices": len(jax.devices()), "presets": {}}
    ok_all = True
    for preset in ("small", "pi"):
        mesh = generate_planar_mesh(preset=preset)
        fields = random_fields(mesh, seed=3)
        f32 = {k: v.astype(np.float32) for k, v in fields.items()}
        cfg = FctAleConfig(dt=0.7, dtype=jnp.float32, flux_eps=1e-7)

        ref = FctAleSolver(mesh, cfg)
        ref_out = ref.step(ref.init_state(f32))

        pk.set_interpret(True)
        try:
            sh = ShardedFctAleSolver(mesh, cfg, backend="pallas")
            per_part = [
                dict(part=p,
                     pack_K=int(s.pack_K), dia_D=int(s.a3f_dia_D))
                for p, s in enumerate(
                    pstep.build_pallas_data(m, halo_mask=None, xp=np)[1]
                    for m in sh.pm.local_meshes)
            ]
            out = sh.step(sh.init_state(f32))
        finally:
            pk.set_interpret(False)

        errs = {}
        for k in ("fct_plus", "fct_minus", "del_ttf_advvert",
                  "del_ttf_advhoriz"):
            got = sh.gather_node(out[k])[: mesh.n_layers]
            r = np.asarray(ref_out[k])
            errs[k] = float(np.abs(got - r).max() / max(np.abs(r).max(), 1.0))
        entry = dict(
            n_parts=sh.n_parts,
            exchange=sh.exchange_mode,
            common_pack_K=int(sh.ps.pack_K),
            common_dia_D=int(sh.ps.a3f_dia_D),
            degraded=sh.degraded,
            per_part=per_part,
            max_relerr_vs_single=max(errs.values()),
            errs=errs,
        )
        entry["ok"] = (sh.ps.pack_K > 0 and sh.ps.a3f_dia_D > 0
                       and sh.exchange_mode == "ppermute"
                       and not sh.degraded
                       and entry["max_relerr_vs_single"] < 2e-6)
        ok_all = ok_all and entry["ok"]
        record["presets"][preset] = entry
        print(preset, json.dumps({k: v for k, v in entry.items()
                                  if k != "per_part"}), flush=True)

    record["ok"] = ok_all
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "perf", "sharded_packed.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(("PASS" if ok_all else "FAIL"), "->", out_path)
    sys.exit(0 if ok_all else 2)


if __name__ == "__main__":
    main()

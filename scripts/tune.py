#!/usr/bin/env python
"""Per-kernel autotuning sweeps on the real chip, with stored artifacts.

The TPU counterpart of running the reference's ``python kernels/*.py
--store`` harnesses (kernels/fct_ale_a1.py:98-120): every swept launch
configuration is validated against the f64 numpy oracle before it is timed,
and the results (ms, achieved GB/s vs the bytes models, max relerr) are
written to one JSON artifact per kernel family under perf/.

Usage: python scripts/tune.py [--preset core2] [--families bounds,limit]
       [--outdir perf]
"""

import argparse
import dataclasses
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="core2")
    ap.add_argument("--families", default="kernels,a2,step,stress2rhs",
                    help="comma list: kernels (K1-K4), a2, step, stress2rhs")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--outdir", default="perf")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fesom2_accelerate_tpu.mesh import generate_planar_mesh
    from fesom2_accelerate_tpu.utils import tuning

    mesh = generate_planar_mesh(preset=args.preset)
    os.makedirs(args.outdir, exist_ok=True)
    fams = args.families.split(",")

    def dump(name, results):
        path = os.path.join(args.outdir, f"tune_{args.preset}_{name}.json")
        tuning.store(results, path)
        b = tuning.best(results)
        print(json.dumps({"family": name, "stored": path,
                          "best": dataclasses.asdict(b) if b else None}))

    def attempt(fn, *fargs, **fkw):
        """One retry on transient tunnel/runtime failures: a dropped
        remote_compile connection must not discard the other families'
        sweeps (a 40-minute run died that way in round 4)."""
        for last in (False, True):
            try:
                return fn(*fargs, **fkw)
            except Exception as e:  # noqa: BLE001 - log and retry once
                print(json.dumps({"family_error": fn.__name__,
                                  "error": f"{type(e).__name__}: {e}"[:300],
                                  "retrying": not last}), file=sys.stderr)
                if last:
                    return None

    if "kernels" in fams:
        per = attempt(tuning.tune_kernels, mesh, iters=args.iters,
                      preset_name=args.preset)
        for fam, results in (per or {}).items():
            dump(fam, results)
    if "a2" in fams:
        results = attempt(tuning.tune_a2, mesh)
        if results:
            dump("a2", results)
    if "step" in fams:
        results = attempt(tuning.tune_step, mesh, steps=args.iters,
                          preset_name=args.preset)
        if results:
            dump("step", results)
    if "stress2rhs" in fams:
        results = attempt(tuning.tune_stress2rhs, mesh)
        if results:
            dump("stress2rhs", results)


if __name__ == "__main__":
    main()

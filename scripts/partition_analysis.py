#!/usr/bin/env python
"""Stripes-vs-RCB partition analysis: where do 1-D stripes stop sufficing?

The production sharded path runs 1-D stripe partitions (packed+DIA kernels
survive them); RCB 2-D partitions fall back to the ~5-6x slower one-hot
kernels because the [H | owned | H] local numbering gives halo-crossing
edges ~one distinct lane offset per part row (round-4 verdict weak #4).
This script quantifies the trade across partition counts: per-part halo
fractions, padded-size inflation, packed admissibility, and a cost model
combining both — committed to perf/partition_analysis.json and summarized
in BASELINE.md.

Usage: JAX_PLATFORMS=cpu python scripts/partition_analysis.py
"""

import json
import os
import sys

import numpy as np

# prefer the installed package (pip install -e .); fall back to the
# checkout layout so a clean clone still runs without an install step
try:  # noqa: SIM105
    import fesom2_accelerate_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

# one-hot whole-step cost vs packed+DIA fused chain, core2 round-5
# (per-kernel artifacts: one-hot K1..K4 2.83+2.71+2.68+1.98 = 10.2 ms vs
# 1.83 fused) — the slowdown an RCB part's fallback pays
ONEHOT_SLOWDOWN = 5.6


def analyze(mesh, name, parts_list):
    from fesom2_accelerate_tpu.mesh.ordering import rcb_order, reorder_mesh
    from fesom2_accelerate_tpu.ops.pallas.packed import build_packed_plan
    from fesom2_accelerate_tpu.parallel.partition import partition_mesh

    N = mesh.n_nodes
    bw = int(np.abs(np.diff(mesh.edges.astype(np.int64), axis=1)).max())
    rows = []
    for P in parts_list:
        row = {"mesh": name, "N": N, "bandwidth": bw, "P": P}
        for scheme in ("stripes", "rcb"):
            if scheme == "stripes":
                m, counts = mesh, None
            else:
                perm, counts = rcb_order(mesh, P)
                m = reorder_mesh(mesh, perm)
                if isinstance(m, tuple):
                    m = m[0]
            try:
                pm = partition_mesh(m, P, counts=counts)
            except Exception as e:  # degenerate split
                row[scheme] = {"error": str(e)[:80]}
                continue
            B, H = pm.B, pm.H
            halo = (pm.halo_lo_count + pm.halo_hi_count)
            own = pm.owned_count
            # packed admissibility of a middle part's local mesh
            lm = pm.local_meshes[len(pm.local_meshes) // 2]
            tile = 256
            Np = -(-lm.n_nodes // tile) * tile
            pk = build_packed_plan(lm, tile, Np)
            inflation = pm.n_local / (N / P)  # padded local vs ideal share
            halo_frac = float((halo / np.maximum(own, 1)).max())
            slowdown = 1.0 if pk is not None else ONEHOT_SLOWDOWN
            row[scheme] = {
                "B": int(B), "H": int(H),
                "max_halo_frac": round(halo_frac, 3),
                "padded_inflation": round(float(inflation), 3),
                "neighbor_radius": int(pm.neighbor_radius),
                "packed_admissible": pk is not None,
                "est_cost_multiplier": round(
                    float(inflation) * slowdown, 2),
            }
        rows.append(row)
        print(json.dumps(row))
    return rows


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from fesom2_accelerate_tpu.mesh import generate_planar_mesh

    out = []
    out += analyze(generate_planar_mesh(preset="pi"), "pi", (8, 64))
    out += analyze(generate_planar_mesh(preset="core2"), "core2",
                   (8, 64, 256))
    os.makedirs("perf", exist_ok=True)
    with open("perf/partition_analysis.json", "w") as f:
        json.dump(out, f, indent=1)
    print("-> perf/partition_analysis.json")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-kernel timing of the fused Pallas chain on the real chip.

Each kernel is iterated inside one jitted lax.scan with a forced data
dependency (carry feeds the next iteration's input), so the reported time
is true device time, free of per-call dispatch/RPC overhead — the
per-kernel analogue of the reference's kernel_tuner timing
(reference kernels/fct_ale_a1.py:93-95).

Usage: python scripts/perf_kernels.py [--preset core2] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="core2")
    # >= 150 iterations: the tunneled backend costs ~25 ms dispatch+sync
    # per jitted call; short scans attribute that tax to the kernel
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.ops.pallas import kernels
    from fesom2_accelerate_tpu.ops.pallas import step as pstep

    mesh = generate_planar_mesh(preset=args.preset)
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    pd, ps = pstep.build_pallas_data(mesh)
    fields = random_fields(mesh, seed=0, dtype=np.float32)
    state = pstep.pad_state(ps, {k: jnp.asarray(v) for k, v in fields.items()})

    L, Lp, Lpv = ps.L, ps.Lp, ps.Lpv
    dt = float(cfg.dt)

    def k1(pd, lo, ttf):
        return kernels.bounds_pallas(
            lo, ttf, pd.a3f_lidx_lo, pd.a3f_lev_lo,
            pd.a3f_lidx_hi, pd.a3f_lev_hi, pd.a3f_wb, pd.nlev_nod_row,
            tile=ps.tile, nblocks_lo=ps.a3f_lo_nblocks,
            nblocks_hi=ps.a3f_hi_nblocks, K_lo=ps.K_lo, K_hi=ps.K_hi,
            vlimit=cfg.vlimit)

    tt0 = k1(pd, state["fct_LO"], state["ttf"])

    def k2(pd, s, tt):
        return kernels.limit_pallas(
            s["fct_adf_v"], tt, pd.area_inv_pad, s["fct_adf_h"],
            pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb,
            pd.nlev_nod_row, tile=ps.tile, nblocks_lo=ps.ne_lo_nblocks,
            nblocks_hi=ps.ne_hi_nblocks, L=L, dt=dt,
            flux_eps=float(cfg.flux_eps), chunk=ps.scatter_chunk)

    pm0, av0, _ = k2(pd, state, tt0)

    def k3(pd, s, pm):
        return kernels.b3h_pallas(
            pm, s["fct_adf_h"], pd.b3h_lidx_lo, pd.b3h_lidx_hi, pd.b3h_wb,
            pd.nlev_edge_row, tile=ps.tile, nblocks_lo=ps.b3h_lo_nblocks,
            nblocks_hi=ps.b3h_hi_nblocks, chunk=ps.chunk)

    ah0, _ = k3(pd, state, pm0)

    def k4(pd, s, av, ah):
        return kernels.update_pallas(
            av, s["ttf"], s["hnode"], s["hnode_new"],
            s["fct_LO"], s["del_ttf_advvert"], s["del_ttf_advhoriz"],
            pd.area_inv_pad, ah, pd.starts_col, pd.ends_col,
            pd.nlev_edge_row, pd.ne_wb, pd.nlev_nod_row, tile=ps.tile,
            nblocks_lo=ps.ne_lo_nblocks, nblocks_hi=ps.ne_hi_nblocks, L=L,
            dt=dt, iter_yn=cfg.iter_yn, chunk=ps.scatter_chunk)

    def bench(name, make_scan, n=args.iters):
        jf = jax.jit(make_scan)
        out = jf(pd, state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = jf(pd, state)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(json.dumps({"kernel": name, "ms": round(ms, 4)}))
        return ms

    eps = jnp.float32(1e-30)

    def scan_k1(pd, s):
        def body(lo, _):
            tt = k1(pd, lo, s["ttf"])
            return lo + eps * tt[:Lp], None
        out, _ = jax.lax.scan(body, s["fct_LO"], None, length=args.iters)
        return out

    def scan_k2(pd, s):
        def body(tt, _):
            pm, _, _ = k2(pd, s, tt)
            return tt + eps * pm, None
        out, _ = jax.lax.scan(body, tt0, None, length=args.iters)
        return out

    def scan_k3(pd, s):
        def body(pm, _):
            ah, res = k3(pd, s, pm)
            return pm + eps * jnp.concatenate([ah[:Lp, :ps.Np],
                                               res[:Lp, :ps.Np]]), None
        out, _ = jax.lax.scan(body, pm0, None, length=args.iters)
        return out

    def scan_k4(pd, s):
        def body(av, _):
            o1, o2 = k4(pd, s, av, ah0)
            return av + eps * jnp.concatenate(
                [o1, o2])[:av0.shape[0]], None
        out, _ = jax.lax.scan(body, av0, None, length=args.iters)
        return out

    def scan_whole(pd, s):
        def body(c, _):
            new = pstep.fct_ale_step_pallas_padded(pd, ps, cfg, c)
            return {k: new[k] for k in c}, None
        out, _ = jax.lax.scan(body, s, None, length=args.iters)
        return out

    total = 0.0
    total += bench("K1_bounds", scan_k1)
    total += bench("K2_limit", scan_k2)
    total += bench("K3_b3h", scan_k3)
    total += bench("K4_update", scan_k4)
    whole_ms = bench("whole_step", scan_whole)
    print(json.dumps({
        "sum_kernels_ms": round(total, 4),
        "whole_ms": round(whole_ms, 4),
        "static": {
            "tile": ps.tile, "Np": ps.Np, "Ep": ps.Ep, "Edp": ps.Edp,
            "K_lo": ps.K_lo, "K_hi": ps.K_hi,
            "J": {"a3f_lo": ps.a3f_lo_nblocks, "a3f_hi": ps.a3f_hi_nblocks,
                  "ne_lo": ps.ne_lo_nblocks, "ne_hi": ps.ne_hi_nblocks,
                  "b3h_lo": ps.b3h_lo_nblocks, "b3h_hi": ps.b3h_hi_nblocks,
                  "a2": ps.a2_nblocks},
        },
    }))


if __name__ == "__main__":
    main()

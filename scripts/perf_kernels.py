#!/usr/bin/env python
"""Per-kernel timing of the fused Pallas chain on the real chip.

Each kernel is iterated inside one jitted lax.scan with a forced data
dependency (carry feeds the next iteration's input), so the reported time
is true device time, free of per-call dispatch/RPC overhead — the
per-kernel analogue of the reference's kernel_tuner timing
(reference kernels/fct_ale_a1.py:93-95).

Times whatever forms the production build selects (packed/DIA on
bandwidth-ordered meshes, one-hot otherwise); ``--onehot`` forces the
one-hot fallback forms for comparison.

Usage: python scripts/perf_kernels.py [--preset core2] [--iters 100]
       [--tile 256] [--onehot] [--store out.json]
"""

import argparse
import json
import os
import sys
import time

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
    # >= 100 iterations: the tunneled backend costs ~25 ms dispatch+sync
    # per jitted call; short scans attribute that tax to the kernel
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--onehot", action="store_true",
                    help="force the one-hot kernel forms")
    ap.add_argument("--store", default=None, help="write results JSON here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.ops.pallas import kernels, kernels_packed
    from fesom2_accelerate_tpu.ops.pallas import step as pstep

    mesh = generate_planar_mesh(preset=args.preset)
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    kw = dict(tile=args.tile) if args.tile else {}
    if args.onehot:
        kw.update(pack_pmax=0, dia_max=0)
    pd, ps = pstep.build_pallas_data(mesh, **kw)
    fields = random_fields(mesh, seed=0, dtype=np.float32)
    state = pstep.pad_state(
        ps, {k: jnp.asarray(v) for k, v in fields.items()}, pd)

    L, Lp, Lpv = ps.L, ps.Lp, ps.Lpv
    dt = float(cfg.dt)
    packed = ps.pack_K > 0

    def k1(pd, lo, ttf):
        if ps.a3f_dia_D:
            # the PRODUCTION form: double-buffered DMA window + static rolls
            return kernels.bounds_dia_dma_pallas(
                lo, ttf, pd.a3f_dia_wb, pd.a3f_dia_lev, pd.nlev_nod_row,
                tile=ps.tile, nblocks=ps.a3f_un_nblocks, D=ps.a3f_dia_D,
                rems=pstep._dia_rems(ps), vlimit=cfg.vlimit)
        return kernels.bounds_pallas(
            lo, ttf, pd.a3f_lidx_lo, pd.a3f_lev_lo,
            pd.a3f_lidx_hi, pd.a3f_lev_hi, pd.a3f_wb, pd.nlev_nod_row,
            tile=ps.tile, nblocks_lo=ps.a3f_lo_nblocks,
            nblocks_hi=ps.a3f_hi_nblocks, K_lo=ps.K_lo, K_hi=ps.K_hi,
            vlimit=cfg.vlimit)

    tt0 = k1(pd, state["fct_LO"], state["ttf"])

    def k2(pd, s, tt):
        if packed:
            return kernels_packed.limit_packed_pallas(
                s["fct_adf_v"], tt, pd.area_inv_pad, s["fct_adf_h"],
                pd.pk_lev_home, pd.pk_sc_lev, pd.pk_sc_wb, pd.nlev_nod_row,
                tile=ps.tile, J=ps.pack_J_sc, K=ps.pack_K, Pk=ps.pack_Pk_s,
                L=L, dt=dt, flux_eps=float(cfg.flux_eps))
        return kernels.limit_pallas(
            s["fct_adf_v"], tt, pd.area_inv_pad, s["fct_adf_h"],
            pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb,
            pd.nlev_nod_row, tile=ps.tile, nblocks_lo=ps.ne_lo_nblocks,
            nblocks_hi=ps.ne_hi_nblocks, L=L, dt=dt,
            flux_eps=float(cfg.flux_eps), chunk=ps.scatter_chunk)

    pm0, av0 = k2(pd, state, tt0)[:2]

    def k3(pd, s, pm):
        if packed:
            return kernels_packed.b3h_packed_pallas(
                pm, s["fct_adf_h"], pd.pk_lev_home, pd.pk_g_ind, pd.pk_g_wb,
                tile=ps.tile, J=ps.pack_J_g, K=ps.pack_K, Pk=ps.pack_Pk_g,
                with_resid=False)
        return kernels.b3h_pallas(
            pm, s["fct_adf_h"], pd.b3h_lidx_lo, pd.b3h_lidx_hi, pd.b3h_wb,
            pd.nlev_edge_row, tile=ps.tile, nblocks_lo=ps.b3h_lo_nblocks,
            nblocks_hi=ps.b3h_hi_nblocks, chunk=ps.chunk)

    ah0 = k3(pd, state, pm0)[0]

    def k4(pd, s, av, ah):
        if packed:
            return kernels_packed.update_packed_pallas(
                av, s["ttf"], s["hnode"], s["hnode_new"], s["fct_LO"],
                s["del_ttf_advvert"], s["del_ttf_advhoriz"],
                pd.area_inv_pad, ah, pd.pk_lev_home, pd.pk_sc_lev,
                pd.pk_sc_wb, pd.nlev_nod_row, tile=ps.tile, J=ps.pack_J_sc,
                K=ps.pack_K, Pk=ps.pack_Pk_s, L=L, dt=dt,
                iter_yn=cfg.iter_yn)
        return kernels.update_pallas(
            av, s["ttf"], s["hnode"], s["hnode_new"],
            s["fct_LO"], s["del_ttf_advvert"], s["del_ttf_advhoriz"],
            pd.area_inv_pad, ah, pd.starts_col, pd.ends_col,
            pd.nlev_edge_row, pd.ne_wb, pd.nlev_nod_row, tile=ps.tile,
            nblocks_lo=ps.ne_lo_nblocks, nblocks_hi=ps.ne_hi_nblocks, L=L,
            dt=dt, iter_yn=cfg.iter_yn, chunk=ps.scatter_chunk)

    results = []

    def bench(name, make_scan, n=args.iters):
        jf = jax.jit(make_scan)
        out = jf(pd, state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = jf(pd, state)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        rec = {"kernel": name, "ms": round(ms, 4)}
        results.append(rec)
        print(json.dumps(rec))
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
            pm = k2(pd, s, tt)[0]
            return tt + eps * pm, None
        out, _ = jax.lax.scan(body, tt0, None, length=args.iters)
        return out

    def scan_k3(pd, s):
        def body(pm, _):
            ah = k3(pd, s, pm)[0]
            if packed:
                d = ah[:2 * Lp, :ps.Np]
            else:
                d = jnp.concatenate([ah[:Lp, :ps.Np], ah[:Lp, :ps.Np]])
            return pm + eps * d, None
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

    def k34(pd, s, av, pm):
        return kernels_packed.update_fused_pallas(
            av, s["ttf"], s["hnode"], s["hnode_new"], s["fct_LO"],
            s["del_ttf_advvert"], s["del_ttf_advhoriz"], pd.area_inv_pad,
            pm, s["fct_adf_h"], pd.pk_gl_int, pd.pk_lev_home, pd.pk_sc_lev,
            pd.pk_sc_wb, pd.pk_pm_wb, pd.nlev_nod_row, tile=ps.tile,
            J=ps.pack_J_sc, J_pm=ps.pack_J_pm, K=ps.pack_K,
            Pk_s=ps.pack_Pk_s, Pk_g=ps.pack_Pk_g, g_offs=ps.pack_g_offs,
            L=L, dt=dt, iter_yn=cfg.iter_yn)

    def scan_k34(pd, s):
        def body(av, _):
            o1, o2, _limF = k34(pd, s, av, pm0)[:3]
            return av + eps * jnp.concatenate(
                [o1, o2])[:av0.shape[0]], None
        out, _ = jax.lax.scan(body, av0, None, length=args.iters)
        return out

    form = "packed" if packed else "onehot"
    k1form = "dia" if ps.a3f_dia_D else "onehot"
    total = 0.0
    total += bench(f"K1_bounds[{k1form}]", scan_k1)
    total += bench(f"K2_limit[{form}]", scan_k2)
    if ps.fuse_k34:
        # the production path: K3's b3h limiting fused onto K4's window
        total += bench("K34_fused[packed]", scan_k34)
        bench(f"K3_b3h[{form}]", scan_k3)  # split forms for comparison
        bench(f"K4_update[{form}]", scan_k4)
    else:
        total += bench(f"K3_b3h[{form}]", scan_k3)
        total += bench(f"K4_update[{form}]", scan_k4)
    whole_ms = bench("whole_step", scan_whole)
    summary = {
        "sum_kernels_ms": round(total, 4),
        "whole_ms": round(whole_ms, 4),
        "preset": args.preset,
        "static": {
            "tile": ps.tile, "Np": ps.Np, "Ep": ps.Ep, "Edp": ps.Edp,
            "pack_K": ps.pack_K, "pack_Pk_s": list(ps.pack_Pk_s),
            "pack_Pk_g": list(ps.pack_Pk_g), "pack_J_sc": ps.pack_J_sc,
            "pack_J_g": ps.pack_J_g, "dia_D": ps.a3f_dia_D,
            "K_lo": ps.K_lo, "K_hi": ps.K_hi,
            "J": {"a3f_lo": ps.a3f_lo_nblocks, "a3f_hi": ps.a3f_hi_nblocks,
                  "a3f_un": ps.a3f_un_nblocks,
                  "ne_lo": ps.ne_lo_nblocks, "ne_hi": ps.ne_hi_nblocks,
                  "b3h_lo": ps.b3h_lo_nblocks, "b3h_hi": ps.b3h_hi_nblocks,
                  "a2": ps.a2_nblocks},
        },
    }
    results.append(summary)
    print(json.dumps(summary))
    if args.store:
        with open(args.store, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

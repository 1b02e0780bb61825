#!/usr/bin/env python
"""Automated ON-CHIP parity probe — run each round on the real TPU.

Interpret-mode CI cannot certify the kernels: round 2's DIA bounds kernel
used negative dynamic ``pltpu.roll`` shifts that were correct in interpret
mode (every CPU test passed) yet silently miscompiled on hardware
(BASELINE.md "Round-3 correctness note").  This script is the gate that
caught it, automated (round-3 verdict asked for it as a committed
artifact):

* sweeps {packed+DIA, one-hot} x {vlimit 1,2,3} x {iter_yn} comparing the
  fused Pallas chain against the XLA f32 step ON CHIP (max relerr per
  output; the limiter bounds additionally checked bit-exact),
* runs one slow ON-CHIP f64 XLA step of the small preset against the CPU
  numpy oracle — closing the "does the chip compute the reference
  semantics" loop end-to-end (reference gate: ``real_type = double``,
  reference include/fesom2-accelerate.h:10),
* writes ``perf/parity_onchip.json``.

Usage: python scripts/parity_onchip.py [--preset pi] [--out perf/parity_onchip.json]
"""

import argparse
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


def _relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="pi")
    ap.add_argument("--out", default="perf/parity_onchip.json")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run even without a TPU (artifact marked as such)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu and not args.allow_cpu:
        print("no TPU visible — on-chip parity requires the real chip",
              file=sys.stderr)
        sys.exit(1)

    mesh = generate_planar_mesh(preset=args.preset)
    fields = random_fields(mesh, seed=0, dtype=np.float64)
    fields32 = {k: v.astype(np.float32) for k, v in fields.items()}

    record = {
        "device": str(getattr(dev, "device_kind", dev)),
        "platform": dev.platform,
        "preset": args.preset,
        "unix_time": int(time.time()),
        "cases": [],
    }

    ok_all = True
    for form in ("packed", "onehot"):
        for vlimit in (1, 2, 3):
            for iter_yn in (False, True):
                cfg = FctAleConfig(dt=0.7, vlimit=vlimit, iter_yn=iter_yn,
                                   dtype=jnp.float32, flux_eps=1e-7)
                ref = FctAleSolver(mesh, cfg, backend="xla")
                ref_out = ref.step(ref.init_state(fields32))
                sol = FctAleSolver(mesh, cfg, backend="pallas", form=form)
                out = sol.step(sol.init_state(fields32))
                keys = ["fct_plus", "fct_minus", "fct_ttf_max",
                        "fct_ttf_min", "fct_adf_v", "fct_adf_h"]
                keys += (["fct_LO"] if iter_yn
                         else ["del_ttf_advvert", "del_ttf_advhoriz"])
                errs = {k: _relerr(out[k], ref_out[k]) for k in keys}
                bounds_exact = bool(
                    np.array_equal(np.asarray(out["fct_ttf_max"]),
                                   np.asarray(ref_out["fct_ttf_max"]))
                    and np.array_equal(np.asarray(out["fct_ttf_min"]),
                                       np.asarray(ref_out["fct_ttf_min"])))
                case_ok = max(errs.values()) < 2e-6
                ok_all = ok_all and case_ok
                record["cases"].append(dict(
                    form=form, vlimit=vlimit, iter_yn=iter_yn,
                    pack_K=sol.ps.pack_K, dia_D=sol.ps.a3f_dia_D,
                    max_relerr=max(errs.values()), errs=errs,
                    bounds_bitexact=bounds_exact, ok=case_ok,
                ))
                print(f"{form} vlimit={vlimit} iter={int(iter_yn)}: "
                      f"max relerr {max(errs.values()):.2e} "
                      f"bounds_exact={bounds_exact} ok={case_ok}",
                      flush=True)

    # ---- sharded-only kernels ON CHIP (round-4 verdict task 1) -----------
    # The b3h fixup kernels (kernels.b3h_fixup_pallas, kernels_packed.
    # b3h_packed_fixup_pallas) and the interior/fixup overlap composition
    # had only ever run in interpret mode — exactly the risk class the
    # round-3 roll miscompile proved interpret mode cannot certify.  On one
    # chip: build the FULL mesh with a synthetic halo mask of realistic
    # stripe width (H ~ mesh bandwidth), drive the step with an "exchange"
    # that deterministically perturbs the halo columns, and check the
    # overlap invariant: interior-sweep-on-pre-exchange-factors + fixup ==
    # plain sweep on post-exchange factors (reference post_comm semantics,
    # src/fesom2-accelerate.cu:358-379).  Any fixup mislowering — wrong
    # tiles, wrong aliasing, missed halo-touching edges — breaks equality.
    import functools

    from fesom2_accelerate_tpu.ops.pallas import step as pstep

    bw = int(np.abs(np.diff(mesh.edges.astype(np.int64), axis=1)).max())
    H = min(max(bw, 128), mesh.n_nodes // 4)
    halo = np.zeros(mesh.n_nodes, dtype=bool)
    halo[:H] = True
    halo[mesh.n_nodes - H:] = True

    for form in ("packed", "onehot"):
        kw = dict(dia_max=0, pack_pmax=0) if form == "onehot" else {}
        for iter_yn in (False, True):
            cfg = FctAleConfig(dt=0.7, vlimit=1, iter_yn=iter_yn,
                               dtype=jnp.float32, flux_eps=1e-7)
            pd0, ps0 = pstep.build_pallas_data(mesh, **kw)
            pdf, psf = pstep.build_pallas_data(mesh, halo_mask=halo, **kw)
            assert ps0.n_fix_tiles == 0 and psf.n_fix_tiles > 0
            if form == "packed":
                assert psf.pack_K > 0, "fixup case must run the packed form"
            # 1 + 2^-10: exact in f32, so both runs see identical values
            scale = jnp.asarray(np.where(
                np.pad(halo, (0, ps0.Np - mesh.n_nodes)),
                np.float32(1.0009765625), np.float32(1.0)))

            def exch(x):
                return x * scale

            solver32 = FctAleSolver(mesh, cfg, backend="xla")
            st32 = solver32.init_state(fields32)

            def run(pd, ps):
                stepf = jax.jit(functools.partial(
                    lambda pd_, s_, ps_=ps: pstep.fct_ale_step_pallas_padded(
                        pd_, ps_, cfg, s_, exchange=exch)))
                pstate = pstep.pad_state(ps, st32, pd)
                return pstep.unpad_state(ps, stepf(pd, pstate), pd)

            ref_out = run(pd0, ps0)   # no fixup plan: K3 on exchanged pm
            out = run(pdf, psf)       # interior on pre-exchange pm + fixup
            keys = ["fct_plus", "fct_minus", "fct_adf_v", "fct_adf_h"]
            keys += (["fct_LO", "fct_adf_h_limited"] if iter_yn
                     else ["del_ttf_advvert", "del_ttf_advhoriz"])
            errs = {k: _relerr(out[k], ref_out[k]) for k in keys}
            bitexact = all(
                np.array_equal(np.asarray(out[k]), np.asarray(ref_out[k]))
                for k in keys)
            case_ok = max(errs.values()) < 2e-6
            ok_all = ok_all and case_ok
            record["cases"].append(dict(
                form=f"fixup_{form}", vlimit=1, iter_yn=iter_yn,
                n_fix_tiles=psf.n_fix_tiles, halo_width=H,
                max_relerr=max(errs.values()), errs=errs,
                bitexact=bitexact, ok=case_ok,
            ))
            print(f"fixup_{form} iter={int(iter_yn)}: "
                  f"n_fix_tiles={psf.n_fix_tiles} "
                  f"max relerr {max(errs.values()):.2e} "
                  f"bitexact={bitexact} ok={case_ok}", flush=True)

    # ---- multi-tracer batched kernels ON CHIP ----------------------------
    # (round-5 feature: (tiles, tracers) grids + per-(tile, tracer) DMA
    # windows — certify the batched lowering against per-tracer singles)
    for iter_yn in (False, True):
        cfg = FctAleConfig(dt=0.7, vlimit=1, iter_yn=iter_yn,
                           dtype=jnp.float32, flux_eps=1e-7)
        pd_b, ps_b = pstep.build_pallas_data(mesh)
        Tb = 3
        # independent VALID per-tracer fields (values below each node's
        # seabed are don't-care and legitimately differ between paths)
        per = [{k: v.astype(np.float32) for k, v in
                random_fields(mesh, seed=60 + t).items()}
               for t in range(Tb)]
        shared = {k: jnp.asarray(per[0][k]) for k in ("hnode", "hnode_new")}
        batched = dict(shared)
        for k in per[0]:
            if k not in batched:
                batched[k] = jnp.asarray(np.stack([f[k] for f in per]))
        out_b = pstep.fct_ale_step_pallas_batched(pd_b, ps_b, cfg, batched)
        errs = {}
        for t in range(Tb):
            s = {k: jnp.asarray(v) for k, v in per[t].items()}
            s.update(shared)
            out_1 = pstep.fct_ale_step_pallas(pd_b, ps_b, cfg, s)
            for k in ("fct_plus", "fct_minus", "fct_adf_v", "fct_adf_h"):
                errs[f"{k}[{t}]"] = _relerr(out_b[k][t], out_1[k])
        case_ok = max(errs.values()) == 0.0  # same kernels, same math
        ok_all = ok_all and case_ok
        record["cases"].append(dict(
            form="batched_tracers", vlimit=1, iter_yn=iter_yn, Tb=Tb,
            max_relerr=max(errs.values()), ok=case_ok,
        ))
        print(f"batched_tracers Tb={Tb} iter={int(iter_yn)}: "
              f"max relerr {max(errs.values()):.2e} ok={case_ok}",
              flush=True)

    # ---- 1-device sharded program ON CHIP --------------------------------
    # Compiles the shard_map + collective + pallas composition through the
    # real Mosaic/XLA:TPU stack (the multichip dryrun only exercises the
    # CPU interpreter).  One device: the ICI ppermute itself is not
    # exercisable on a single chip — recorded as such.
    from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver

    for iter_yn in (False, True):
        cfg = FctAleConfig(dt=0.7, vlimit=1, iter_yn=iter_yn,
                           dtype=jnp.float32, flux_eps=1e-7)
        ref = FctAleSolver(mesh, cfg, backend="xla")
        ref_out = ref.step(ref.init_state(fields32))
        sh = ShardedFctAleSolver(mesh, cfg, devices=[dev],
                                 backend="pallas")
        assert sh.ps.pack_K > 0 and sh.ps.a3f_dia_D > 0, (
            "1-device shard must take the packed+DIA production forms")
        assert sh.degraded == []
        out = sh.step(sh.init_state(fields32))
        node_keys = ["fct_plus", "fct_minus", "fct_ttf_max", "fct_ttf_min"]
        node_keys += (["fct_LO"] if iter_yn
                      else ["del_ttf_advvert", "del_ttf_advhoriz"])
        errs = {}
        for k in node_keys:
            got = sh.gather_node(out[k])[: mesh.n_layers]
            errs[k] = _relerr(got, np.asarray(ref_out[k]))
        got = sh.gather_node(out["fct_adf_v"])[: mesh.n_layers + 1]
        errs["fct_adf_v"] = _relerr(got, np.asarray(ref_out["fct_adf_v"]))
        case_ok = max(errs.values()) < 2e-6
        ok_all = ok_all and case_ok
        record["cases"].append(dict(
            form="sharded_1dev", vlimit=1, iter_yn=iter_yn,
            pack_K=sh.ps.pack_K, dia_D=sh.ps.a3f_dia_D,
            max_relerr=max(errs.values()), errs=errs, ok=case_ok,
        ))
        print(f"sharded_1dev iter={int(iter_yn)}: "
              f"max relerr {max(errs.values()):.2e} ok={case_ok}",
              flush=True)

    # ---- end-to-end f64 semantics gate ON CHIP ---------------------------
    # (TPU f64 is emulated and slow — one small-preset step only)
    jax.config.update("jax_enable_x64", True)
    from fesom2_accelerate_tpu.ops import oracle

    mesh64 = generate_planar_mesh(preset="small")
    f64 = random_fields(mesh64, seed=1)
    for vlimit in (1,):
        for iter_yn in (False, True):
            cfg = FctAleConfig(dt=0.7, vlimit=vlimit, iter_yn=iter_yn,
                               dtype=jnp.float64)
            sol = FctAleSolver(mesh64, cfg, backend="xla")
            out = sol.step(sol.init_state(f64))
            ref = oracle.fct_ale_step(mesh64, f64, vlimit=vlimit,
                                      iter_yn=iter_yn, dt=0.7)
            errs = {k: _relerr(out[k], ref[k]) for k in ref}
            case_ok = max(errs.values()) < 1e-12
            ok_all = ok_all and case_ok
            record["cases"].append(dict(
                form="xla_f64_vs_oracle", vlimit=vlimit, iter_yn=iter_yn,
                max_relerr=max(errs.values()), errs=errs, ok=case_ok,
            ))
            print(f"f64 on-chip vlimit={vlimit} iter={int(iter_yn)}: "
                  f"max relerr {max(errs.values()):.2e} ok={case_ok}",
                  flush=True)

    record["ok"] = ok_all
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(("PASS" if ok_all else "FAIL"), "->", args.out)
    sys.exit(0 if ok_all else 2)


if __name__ == "__main__":
    main()

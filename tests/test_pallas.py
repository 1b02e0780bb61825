"""Pallas kernels vs numpy oracle (interpret mode on CPU, f32).

Per-mesh-scale randomized validation of the windowed one-hot contraction
kernels — the Pallas analogue of the reference's kernel_tuner answer=
methodology (kernels/fct_ale_a1.py:91)."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.ops import oracle
from fesom2_accelerate_tpu.ops.pallas.plan import build_gather_plan
from fesom2_accelerate_tpu.ops.pallas.step import (
    build_pallas_data,
    fct_ale_step_pallas,
)


def _relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1.0)


def test_gather_plan_covers_all_tiles():
    mesh = generate_planar_mesh(preset="small")
    valid = np.ones_like(mesh.elem_nodes, dtype=bool)
    p = build_gather_plan(mesh.elem_nodes, valid, 256, mesh.n_nodes)
    assert p.window == p.nblocks * p.block and p.block == 128
    # every valid local index lies inside the J-block window
    assert (p.local_idx[p.valid] < p.window).all()
    assert (p.local_idx[~p.valid] == p.window).all()
    # local + window start reproduces the original indices
    T = p.n_tiles
    base = (p.win_block.astype(np.int64) * p.block)[:, None]
    rec = (p.local_idx + base).reshape(T, p.K, p.tile).transpose(0, 2, 1)
    rec = rec.reshape(T * p.tile, p.K)[: mesh.n_elems]
    np.testing.assert_array_equal(rec, mesh.elem_nodes)


@pytest.mark.parametrize("iter_yn", [False, True])
@pytest.mark.parametrize("seed", [1, 2])
def test_pallas_step_matches_oracle(iter_yn, seed):
    mesh = generate_planar_mesh(preset="tiny", seed=seed)
    pd, ps = build_pallas_data(mesh)
    fields = random_fields(mesh, seed=seed, dtype=np.float32)
    s = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.7, iter_yn=iter_yn, dtype=jnp.float32,
                       flux_eps=1e-7)
    with pltpu.force_tpu_interpret_mode():
        out = fct_ale_step_pallas(pd, ps, cfg, s)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=1, iter_yn=iter_yn, dt=0.7, flux_eps=1e-7,
    )
    for k, v in ref.items():
        err = _relerr(out[k], v)
        assert err < 2e-5, f"{k}: relerr {err:.2e} (iter={iter_yn})"


@pytest.mark.parametrize("vlimit", [2, 3])
def test_pallas_step_vlimit23(vlimit):
    """vlimit 2/3 run fully in the fused bounds kernel (the reference GPU
    path only implemented vlimit 1: src/reference.cpp:297)."""
    mesh = generate_planar_mesh(preset="tiny")
    pd, ps = build_pallas_data(mesh)
    fields = random_fields(mesh, seed=3, dtype=np.float32)
    s = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.7, vlimit=vlimit, dtype=jnp.float32,
                       flux_eps=1e-7)
    with pltpu.force_tpu_interpret_mode():
        out = fct_ale_step_pallas(pd, ps, cfg, s)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=vlimit, dt=0.7, flux_eps=1e-7,
    )
    for k in ("fct_ttf_max", "fct_ttf_min", "fct_plus", "fct_minus",
              "fct_adf_h", "del_ttf_advvert", "del_ttf_advhoriz"):
        err = _relerr(out[k], ref[k])
        assert err < 2e-5, f"{k}: relerr {err:.2e} (vlimit={vlimit})"


@pytest.mark.parametrize("vlimit", [1, 2, 3])
def test_bounds_dia_matches_onehot(vlimit):
    """The DIA (masked lane-shift) form of K1 must agree BIT-EXACTLY with
    the one-hot contraction form: both are pure selections + max/min."""
    from fesom2_accelerate_tpu.ops.pallas import kernels

    mesh = generate_planar_mesh(preset="small")
    pd, ps = build_pallas_data(mesh)
    assert ps.a3f_dia_D > 0, "structured preset must admit the DIA form"
    fields = random_fields(mesh, seed=5, dtype=np.float32)
    Lp = ps.Lp
    lo = np.zeros((Lp, ps.Np), np.float32)
    tt = np.zeros((Lp, ps.Np), np.float32)
    lo[:ps.L, :ps.N] = fields["fct_LO"]
    tt[:ps.L, :ps.N] = fields["ttf"]
    lo, tt = jnp.asarray(lo), jnp.asarray(tt)
    with pltpu.force_tpu_interpret_mode():
        ref = kernels.bounds_pallas(
            lo, tt, pd.a3f_lidx_lo, pd.a3f_lev_lo, pd.a3f_lidx_hi,
            pd.a3f_lev_hi, pd.a3f_wb, pd.nlev_nod_row, tile=ps.tile,
            nblocks_lo=ps.a3f_lo_nblocks, nblocks_hi=ps.a3f_hi_nblocks,
            K_lo=ps.K_lo, K_hi=ps.K_hi, vlimit=vlimit, chunk=ps.chunk,
        )
        from fesom2_accelerate_tpu.ops.pallas.step import _dia_rems

        dia = kernels.bounds_dia_pallas(
            lo, tt, pd.a3f_dia_wb, pd.a3f_dia_lev, pd.nlev_nod_row,
            tile=ps.tile, nblocks=ps.a3f_un_nblocks, D=ps.a3f_dia_D,
            rems=_dia_rems(ps), vlimit=vlimit,
        )
    np.testing.assert_array_equal(
        np.asarray(dia[:, :ps.N]), np.asarray(ref[:, :ps.N])
    )

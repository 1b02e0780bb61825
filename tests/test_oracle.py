"""Vectorized numpy oracle vs literal loop transcription, stage by stage.

This pins the semantics once (SURVEY §7 hard part 4): both oracles implement
reference src/reference.cpp:306-438 + docs/refactoring.md:12-316, written in
two independent styles; agreement on randomized toy meshes is the anchor for
every accelerated path."""

import numpy as np
import pytest

from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.ops import oracle, oracle_loops

from conftest import masked_allclose


@pytest.fixture(scope="module", params=[0, 1])
def setup(request):
    mesh = generate_planar_mesh(nx=6, ny=5, nl=7, seed=request.param)
    mesh.validate()
    fields = random_fields(mesh, seed=request.param)
    mk = oracle.masks(mesh)
    return mesh, fields, mk


def test_a1(setup):
    mesh, f, mk = setup
    lmax, lmin = oracle_loops.a1(mesh, f["fct_LO"], f["ttf"])
    vmax, vmin = oracle.a1(mesh, mk, f["fct_LO"], f["ttf"])
    masked_allclose(lmax, vmax, msg="a1 max")
    masked_allclose(lmin, vmin, msg="a1 min")


def test_a2(setup):
    mesh, f, mk = setup
    tmax, tmin = oracle.a1(mesh, mk, f["fct_LO"], f["ttf"])
    lmax, lmin = oracle_loops.a2(mesh, tmax, tmin)
    vmax, vmin = oracle.a2(mesh, mk, tmax, tmin)
    masked_allclose(lmax, vmax, msg="a2 max")
    masked_allclose(lmin, vmin, msg="a2 min")


@pytest.mark.parametrize("vlimit", [1, 2, 3])
def test_a3(setup, vlimit):
    mesh, f, mk = setup
    tmax, tmin = oracle.a1(mesh, mk, f["fct_LO"], f["ttf"])
    UV_max, UV_min = oracle.a2(mesh, mk, tmax, tmin)
    if vlimit == 1:
        l = oracle_loops.a3_vlimit1(mesh, UV_max, UV_min, f["fct_LO"])
        v = oracle.a3_vlimit1(mesh, mk, UV_max, UV_min, f["fct_LO"])
    elif vlimit == 2:
        l = oracle_loops.a3_vlimit2(mesh, UV_max, UV_min, tmax, f["fct_LO"])
        v = oracle.a3_vlimit2(mesh, mk, UV_max, UV_min, tmax, f["fct_LO"])
    else:
        l = oracle_loops.a3_vlimit3(mesh, UV_max, UV_min, tmax, f["fct_LO"])
        v = oracle.a3_vlimit3(mesh, mk, UV_max, UV_min, tmax, f["fct_LO"])
    masked_allclose(l[0], v[0], msg=f"a3 v{vlimit} max")
    masked_allclose(l[1], v[1], msg=f"a3 v{vlimit} min")


def test_b1(setup):
    mesh, f, mk = setup
    lp, lm = oracle_loops.b1_vertical(mesh, f["fct_adf_v"])
    vp, vm = oracle.b1_vertical(mesh, mk, f["fct_adf_v"])
    masked_allclose(lp, vp, msg="b1v plus")
    masked_allclose(lm, vm, msg="b1v minus")
    lp2, lm2 = oracle_loops.b1_horizontal(mesh, lp, lm, f["fct_adf_h"])
    vp2, vm2 = oracle.b1_horizontal(mesh, mk, vp, vm, f["fct_adf_h"])
    masked_allclose(lp2, vp2, msg="b1h plus")
    masked_allclose(lm2, vm2, msg="b1h minus")


def _limiters(mesh, f, mk, dt=0.7):
    tmax, tmin = oracle.a1(mesh, mk, f["fct_LO"], f["ttf"])
    UV_max, UV_min = oracle.a2(mesh, mk, tmax, tmin)
    tmax2, tmin2 = oracle.a3_vlimit1(mesh, mk, UV_max, UV_min, f["fct_LO"])
    p, m = oracle.b1_vertical(mesh, mk, f["fct_adf_v"])
    p, m = oracle.b1_horizontal(mesh, mk, p, m, f["fct_adf_h"])
    return tmax2, tmin2, p, m


def test_b2(setup):
    mesh, f, mk = setup
    tmax2, tmin2, p, m = _limiters(mesh, f, mk)
    lp, lm = oracle_loops.b2(mesh, p, m, tmax2, tmin2, dt=0.7)
    vp, vm = oracle.b2(mesh, mk, p, m, tmax2, tmin2, dt=0.7)
    masked_allclose(lp, vp, msg="b2 plus")
    masked_allclose(lm, vm, msg="b2 minus")


@pytest.mark.parametrize("iter_yn", [False, True])
def test_b3(setup, iter_yn):
    mesh, f, mk = setup
    tmax2, tmin2, p, m = _limiters(mesh, f, mk)
    p, m = oracle.b2(mesh, mk, p, m, tmax2, tmin2, dt=0.7)
    lv = oracle_loops.b3_vertical(mesh, p, m, f["fct_adf_v"], iter_yn)
    vv = oracle.b3_vertical(mesh, mk, p, m, f["fct_adf_v"], iter_yn)
    lh = oracle_loops.b3_horizontal(mesh, p, m, f["fct_adf_h"], iter_yn)
    vh = oracle.b3_horizontal(mesh, mk, p, m, f["fct_adf_h"], iter_yn)
    if iter_yn:
        masked_allclose(lv[0], vv[0], msg="b3v")
        masked_allclose(lv[1], vv[1], msg="b3v residual")
        masked_allclose(lh[0], vh[0], msg="b3h")
        masked_allclose(lh[1], vh[1], msg="b3h residual")
    else:
        masked_allclose(lv, vv, msg="b3v")
        masked_allclose(lh, vh, msg="b3h")


@pytest.mark.parametrize("vlimit", [1, 2, 3])
@pytest.mark.parametrize("iter_yn", [False, True])
def test_full_chain(setup, vlimit, iter_yn):
    mesh, f, mk = setup
    out_l = oracle_loops.fct_ale_step(
        mesh, f, vlimit=vlimit, iter_yn=iter_yn, dt=0.7
    )
    out_v = oracle.fct_ale_step(
        mesh, f, vlimit=vlimit, iter_yn=iter_yn, dt=0.7, mk=mk
    )
    assert set(out_l) == set(out_v)
    for key in out_l:
        masked_allclose(out_l[key], out_v[key], rtol=1e-10, atol=1e-12,
                        msg=f"chain[{key}] vlimit={vlimit} iter={iter_yn}")


def test_stress2rhs(setup):
    mesh, _, _ = setup
    rng = np.random.default_rng(3)
    E, N = mesh.n_elems, mesh.n_nodes
    elem_area = np.abs(rng.standard_normal(E)) + 0.1
    ice_strength = rng.standard_normal(E)  # ~half <= 0: exercises skip
    sigma11, sigma12, sigma22 = rng.standard_normal((3, E))
    gradient_sca = rng.standard_normal((6, E))
    metric_factor = rng.standard_normal(E)
    inv_areamass = rng.standard_normal(N)  # some <= 0: exercises zeroing
    rhs_a, rhs_m = rng.standard_normal((2, N))

    lU, lV = oracle_loops.stress2rhs(
        mesh.elem_nodes, elem_area, ice_strength, sigma11, sigma12, sigma22,
        gradient_sca, metric_factor, inv_areamass, rhs_a, rhs_m, N,
    )
    vU, vV = oracle.stress2rhs(
        mesh.elem_nodes, mesh.node_elems, mesh.node_elems_pos,
        mesh.node_elems_num, elem_area, ice_strength, sigma11, sigma12,
        sigma22, gradient_sca, metric_factor, inv_areamass, rhs_a, rhs_m,
    )
    masked_allclose(lU, vU, msg="stress2rhs U")
    masked_allclose(lV, vV, msg="stress2rhs V")

"""XLA (jnp) compute path vs vectorized numpy oracle — per stage, full chain,
multi-step iterative integration.  f64, exact-ish tolerances."""

import jax.numpy as jnp
import numpy as np
import pytest

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver, fct_ale_step
from fesom2_accelerate_tpu.model.stress2rhs import Stress2RhsSolver
from fesom2_accelerate_tpu.ops import oracle
from fesom2_accelerate_tpu.ops.meshdata import build_mesh_data

from conftest import masked_allclose


@pytest.fixture(scope="module")
def setup():
    mesh = generate_planar_mesh(preset="small")
    mesh.validate()
    fields = random_fields(mesh, seed=7)
    mk = oracle.masks(mesh)
    md = build_mesh_data(mesh, dtype=jnp.float64)
    return mesh, fields, mk, md


@pytest.mark.parametrize("vlimit", [1, 2, 3])
@pytest.mark.parametrize("iter_yn", [False, True])
def test_full_chain_vs_oracle(setup, vlimit, iter_yn):
    mesh, fields, mk, md = setup
    cfg = FctAleConfig(vlimit=vlimit, iter_yn=iter_yn, dt=0.7,
                       dtype=jnp.float64)
    state = {k: jnp.asarray(v) for k, v in fields.items()}
    out = fct_ale_step(md, cfg, state)
    ref = oracle.fct_ale_step(mesh, fields, vlimit=vlimit, iter_yn=iter_yn,
                              dt=0.7, mk=mk)
    for key, val in ref.items():
        masked_allclose(np.asarray(out[key]), val, rtol=1e-12, atol=1e-12,
                        msg=f"xla[{key}] vlimit={vlimit} iter={iter_yn}")


def test_multistep_iterative_integration(setup):
    """N iterative-FCT steps on device (lax.scan) vs N oracle steps: the
    'allclose after N timesteps' gate from BASELINE.md."""
    mesh, fields, mk, _ = setup
    n_steps = 5
    cfg = FctAleConfig(vlimit=1, iter_yn=True, dt=0.3, dtype=jnp.float64)
    solver = FctAleSolver(mesh, cfg)
    state = solver.init_state(fields)
    state = solver.run(state, n_steps)

    ref_fields = {k: v.copy() for k, v in fields.items()}
    for _ in range(n_steps):
        out = oracle.fct_ale_step(mesh, ref_fields, vlimit=1, iter_yn=True,
                                  dt=0.3, mk=mk)
        ref_fields["fct_LO"] = out["fct_LO"]
        ref_fields["fct_adf_v"] = out["fct_adf_v"]
        ref_fields["fct_adf_h"] = out["fct_adf_h"]

    masked_allclose(np.asarray(state["fct_LO"]), ref_fields["fct_LO"],
                    rtol=1e-10, atol=1e-11, msg="fct_LO after N steps")
    masked_allclose(np.asarray(state["fct_adf_v"]), ref_fields["fct_adf_v"],
                    rtol=1e-10, atol=1e-11, msg="fct_adf_v after N steps")
    masked_allclose(np.asarray(state["fct_adf_h"]), ref_fields["fct_adf_h"],
                    rtol=1e-10, atol=1e-11, msg="fct_adf_h after N steps")


def test_f32_path_tracks_f64(setup):
    """The TPU perf dtype must track the f64 gate within documented bounds
    (SURVEY §7 hard part 2)."""
    mesh, fields, mk, _ = setup
    cfg64 = FctAleConfig(dt=0.7, dtype=jnp.float64)
    cfg32 = FctAleConfig(dt=0.7, flux_eps=1e-7, dtype=jnp.float32)
    md64 = build_mesh_data(mesh, dtype=jnp.float64)
    md32 = build_mesh_data(mesh, dtype=jnp.float32)
    s64 = {k: jnp.asarray(v, jnp.float64) for k, v in fields.items()}
    s32 = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    o64 = fct_ale_step(md64, cfg64, s64)
    o32 = fct_ale_step(md32, cfg32, s32)
    # solution increments stay close; limiter factors can differ at
    # switching points, so compare the physically meaningful outputs
    for key in ("fct_adf_v", "fct_adf_h", "del_ttf_advvert",
                "del_ttf_advhoriz"):
        a = np.asarray(o64[key])
        b = np.asarray(o32[key], dtype=np.float64)
        scale = np.maximum(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 5e-5, key


def test_stress2rhs_vs_oracle(setup):
    mesh, _, _, _ = setup
    rng = np.random.default_rng(11)
    E, N = mesh.n_elems, mesh.n_nodes
    args = dict(
        elem_area=np.abs(rng.standard_normal(E)) + 0.1,
        ice_strength=rng.standard_normal(E),
        sigma11=rng.standard_normal(E),
        sigma12=rng.standard_normal(E),
        sigma22=rng.standard_normal(E),
        gradient_sca=rng.standard_normal((6, E)),
        metric_factor=rng.standard_normal(E),
        inv_areamass=rng.standard_normal(N),
        rhs_a=rng.standard_normal(N),
        rhs_m=rng.standard_normal(N),
    )
    solver = Stress2RhsSolver(mesh, dtype=jnp.float64)
    U, V = solver(**args)
    rU, rV = oracle.stress2rhs(
        mesh.elem_nodes, mesh.node_elems, mesh.node_elems_pos,
        mesh.node_elems_num, **args,
    )
    masked_allclose(np.asarray(U), rU, msg="stress2rhs U")
    masked_allclose(np.asarray(V), rV, msg="stress2rhs V")


def test_stress2rhs_pallas_matches_oracle():
    """The Pallas scatter kernel for the sea-ice EVP workload matches the
    numpy oracle (reference src/reference.cpp:440-480 is CPU-only)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from fesom2_accelerate_tpu.mesh import generate_planar_mesh
    from fesom2_accelerate_tpu.model.stress2rhs import Stress2RhsSolver
    from fesom2_accelerate_tpu.ops import oracle

    mesh = generate_planar_mesh(preset="small")
    rng = np.random.default_rng(7)
    E, N = mesh.n_elems, mesh.n_nodes
    elem_area = np.abs(rng.standard_normal(E)) + 0.1
    ice_strength = rng.standard_normal(E)
    sigma11, sigma12, sigma22 = rng.standard_normal((3, E))
    gradient_sca = rng.standard_normal((6, E))
    metric_factor = rng.standard_normal(E)
    inv_areamass = rng.standard_normal(N)
    rhs_a, rhs_m = rng.standard_normal((2, N))
    args = (elem_area, ice_strength, sigma11, sigma12, sigma22,
            gradient_sca, metric_factor, inv_areamass, rhs_a, rhs_m)

    rU, rV = oracle.stress2rhs(
        mesh.elem_nodes, mesh.node_elems, mesh.node_elems_pos,
        mesh.node_elems_num, *args,
    )
    with pltpu.force_tpu_interpret_mode():
        solver = Stress2RhsSolver(mesh, dtype=jnp.float32, backend="pallas")
        U, V = solver(*args)
    for got, ref, name in ((U, rU, "U"), (V, rV, "V")):
        err = np.abs(np.asarray(got, np.float64) - ref).max()
        err /= max(np.abs(ref).max(), 1.0)
        assert err < 2e-6, f"stress2rhs pallas {name}: relerr {err:.2e}"


def test_f32_drift_bound_25_steps():
    """N-step (25) f32 drift vs the f64 oracle stays within the documented
    bound (BASELINE.md accuracy record; the eps-guarded b2 division is the
    sensitive op, reference kernels/fct_ale_b2.cu:10-11).  Covers BOTH f32
    paths: XLA stages and the fused Pallas chain (plain interpret)."""
    from fesom2_accelerate_tpu.ops.pallas import kernels as pk

    mesh = generate_planar_mesh(preset="tiny")
    fields = random_fields(mesh, seed=0, dtype=np.float64)
    n = 25

    def run(dtype, backend, eps):
        cfg = FctAleConfig(dt=0.5, iter_yn=True, dtype=dtype, flux_eps=eps)
        solver = FctAleSolver(mesh, cfg, backend=backend)
        return solver.run(solver.init_state(fields), n)

    ref = run(jnp.float64, "xla", 1e-16)
    f32 = run(jnp.float32, "xla", 1e-7)
    pk.set_interpret(True)
    try:
        pls = run(jnp.float32, "pallas", 1e-7)
    finally:
        pk.set_interpret(False)
    for k in ("fct_LO", "fct_adf_v", "fct_adf_h"):
        a = np.asarray(ref[k], np.float64)
        scale = max(np.abs(a).max(), 1.0)
        for name, got in (("xla", f32), ("pallas", pls)):
            d = np.abs(np.asarray(got[k], np.float64) - a).max() / scale
            assert d < 2e-5, f"{name}[{k}] drift {d:.2e} after {n} steps"


def test_stress2rhs_onehot_fallback_on_irregular_mesh():
    """RCM-ordered meshes exceed the packed pair budget: the solver must
    fall back to the one-hot scatter kernel and stay correct."""
    from jax.experimental.pallas import tpu as pltpu

    from fesom2_accelerate_tpu.mesh.generate import generate_cylinder_mesh

    out_m = generate_cylinder_mesh(48, 16, 8)
    mesh = out_m[0] if isinstance(out_m, tuple) else out_m
    rng = np.random.default_rng(3)
    E, N = mesh.n_elems, mesh.n_nodes
    host = (np.abs(rng.standard_normal(E)) + 0.1, rng.standard_normal(E),
            *rng.standard_normal((3, E)), rng.standard_normal((6, E)),
            rng.standard_normal(E), rng.standard_normal(N),
            *rng.standard_normal((2, N)))
    ref = Stress2RhsSolver(mesh, dtype=jnp.float64, backend="xla")(*host)
    with pltpu.force_tpu_interpret_mode():
        s = Stress2RhsSolver(mesh, dtype=jnp.float32, backend="pallas")
        assert not s._packed, "cylinder must take the one-hot fallback"
        out = s(*host)
    for i in (0, 1):
        a = np.asarray(out[i], np.float64)
        b = np.asarray(ref[i])
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1.0)
        assert err < 2e-5, f"row {i} relerr {err:.2e}"

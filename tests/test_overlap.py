"""Comm/compute overlap evidence for the sharded Pallas step.

The reference hides its MPI wait behind node-local b3_vertical
(inter_comm phase, reference src/fesom2-accelerate.cu:342-356).  Our step
goes further: b3v is fused into K2 (pre-exchange), and the FULL b3h
interior sweep (K3) runs on pre-exchange limiter factors, leaving only
the boundary edge tiles for a post-exchange fixup.

These tests verify the property the scheduler needs, at the dataflow
level: in the traced program, the K3 ``fct_b3h`` kernel must NOT depend
(transitively) on the ``ppermute`` halo exchange, while the
``fct_b3h_fixup`` kernel MUST.  XLA's latency-hiding scheduler is free to
(and on TPU does) run an async collective concurrently with any compute
it does not feed — dataflow independence is exactly the "overlap is
possible" condition, checked without requiring multi-chip hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver


def _iter_eqns(jaxpr):
    """All eqns in a jaxpr, recursing into sub-jaxprs."""
    from jax._src.core import Jaxpr, ClosedJaxpr

    for eqn in jaxpr.eqns:
        yield jaxpr, eqn
        for v in eqn.params.values():
            sub = None
            if isinstance(v, ClosedJaxpr):
                sub = v.jaxpr
            elif isinstance(v, Jaxpr):
                sub = v
            if sub is not None:
                yield from _iter_eqns(sub)


def _taint_analysis(jaxpr, source_prim="ppermute"):
    """Within ONE jaxpr level: which eqns transitively depend on the
    source primitive's outputs.  Returns [(eqn, tainted)]."""
    from jax._src.core import Var

    tainted = set()
    results = []
    for eqn in jaxpr.eqns:
        in_tainted = any(
            isinstance(v, Var) and v in tainted for v in eqn.invars
        )
        is_source = eqn.primitive.name == source_prim
        if in_tainted or is_source:
            for v in eqn.outvars:
                tainted.add(v)
        results.append((eqn, in_tainted))
    return results


def _find_body_jaxpr(jaxpr):
    """The (sub-)jaxpr that contains the ppermute eqns."""
    for owner, eqn in _iter_eqns(jaxpr):
        if eqn.primitive.name == "ppermute":
            return owner
    raise AssertionError("no ppermute found in the traced step")


@pytest.fixture(scope="module")
def traced_sharded_pallas_step():
    mesh = generate_planar_mesh(preset="small")
    cfg = FctAleConfig(dt=0.7, dtype=jnp.float32, flux_eps=1e-7)
    sh = ShardedFctAleSolver(mesh, cfg, backend="pallas")
    assert sh.exchange_mode == "ppermute"
    fields = random_fields(mesh, seed=3, dtype=np.float32)
    state = sh.init_state(fields)
    jaxpr = jax.make_jaxpr(sh._smapped)(sh.md, sh._hmaps, state)
    return jaxpr.jaxpr


def _pallas_deps(jaxpr):
    body = _find_body_jaxpr(jaxpr)
    deps = {}
    for eqn, tainted in _taint_analysis(body):
        if eqn.primitive.name == "pallas_call":
            deps.setdefault(eqn.params.get("name"), []).append(tainted)
    return deps


# kernel-name families: packed (production) and one-hot (fallback) variants.
# EVERY variant present in the trace is checked — if a fallback branch ever
# puts both forms in one program, the unchecked one must not silently
# depend on the exchange (advisor finding, round 3).
_BOUNDS = ("fct_bounds_dia_dma", "fct_bounds_dia", "fct_bounds")
_LIMIT = ("fct_limit_fused", "fct_limit_packed", "fct_limit")
_B3H = ("fct_b3h_packed", "fct_b3h")
_B3H_FIXUP = ("fct_b3h_packed_fixup", "fct_b3h_fixup")
_UPDATE = ("fct_update_packed", "fct_update")


def _family(deps, names):
    present = [k for k in names if k in deps]
    assert present, f"none of {names} in trace; kernels seen: {sorted(deps)}"
    return present


def test_b3h_interior_independent_of_exchange(traced_sharded_pallas_step):
    """K3 (the big post-b2 kernel) must not consume the collective: this is
    what lets XLA run the halo exchange concurrently with it."""
    deps = _pallas_deps(traced_sharded_pallas_step)
    for k in _family(deps, _B3H):
        assert deps[k] == [False], (
            f"{k} depends on the ppermute exchange — overlap impossible"
        )


def test_b3h_fixup_depends_on_exchange(traced_sharded_pallas_step):
    """The boundary fixup is the ONLY b3h work gated on the exchange."""
    deps = _pallas_deps(traced_sharded_pallas_step)
    for k in _family(deps, _B3H_FIXUP):
        assert deps[k] == [True], (
            f"{k} must consume the exchanged factors"
        )


def test_pre_exchange_kernels_independent(traced_sharded_pallas_step):
    """K1, K2 (incl. fused b3v — the reference's inter_comm overlap) run
    before/independent of the collective."""
    deps = _pallas_deps(traced_sharded_pallas_step)
    for k in _family(deps, _BOUNDS) + _family(deps, _LIMIT):
        assert deps.get(k) == [False], (k, deps.get(k))


def test_update_gated_on_fixup(traced_sharded_pallas_step):
    """Stage c consumes the fixed-up fluxes (correctness of the split)."""
    deps = _pallas_deps(traced_sharded_pallas_step)
    for k in _family(deps, _UPDATE):
        assert deps[k] == [True], (k, deps[k])


def test_overlap_step_exact_vs_serial():
    """The overlapped schedule computes EXACTLY what a serial exchange-
    then-b3h schedule computes (owned columns).

    Plain interpret=True (not the TPU-sim): see
    test_sharded.test_sharded_pallas_matches_single."""
    from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver
    from fesom2_accelerate_tpu.ops.pallas import kernels as pk

    mesh = generate_planar_mesh(preset="small")
    fields = random_fields(mesh, seed=11, dtype=np.float32)
    cfg = FctAleConfig(dt=0.7, dtype=jnp.float32, flux_eps=1e-7)

    ref = FctAleSolver(mesh, cfg)
    ref_out = ref.step(ref.init_state(fields))

    pk.set_interpret(True)
    try:
        sh = ShardedFctAleSolver(mesh, cfg, backend="pallas")
        assert sh.ps.n_fix_tiles > 0  # the overlap path is active
        assert sh.ps.pack_K > 0  # ... in the production packed form
        out = sh.step(sh.init_state(fields))
    finally:
        pk.set_interpret(False)

    for k in ("fct_plus", "fct_minus", "fct_adf_v", "del_ttf_advhoriz"):
        got = sh.gather_node(out[k])[: np.asarray(ref_out[k]).shape[0]]
        refv = np.asarray(ref_out[k])
        err = np.abs(got - refv).max() / max(np.abs(refv).max(), 1.0)
        assert err < 2e-6, f"{k} relerr {err:.2e}"

"""PACKED (home-slot DIA) edge-layout kernels vs oracle and one-hot forms.

The packed layout (ops/pallas/packed.py, ops/pallas/kernels_packed.py)
replaces the one-hot MXU contractions of K2/K3/K4 with aligned slab sums +
per-(slot, offset) lane shifts.  These tests pin:

* plan invariants (every edge lands in exactly one (slot, home) cell, pair
  shifts reconstruct the true source columns);
* pad/unpad round trip through the packed layout;
* full-step agreement with the f64 oracle AND with the one-hot form;
* the admissibility gate: an RCM-reordered cylinder mesh (large per-tile
  offset sets) must fall back to the one-hot kernels and still be correct.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.mesh.generate import generate_cylinder_mesh
from fesom2_accelerate_tpu.ops import oracle
from fesom2_accelerate_tpu.ops.pallas import step as pstep
from fesom2_accelerate_tpu.ops.pallas.packed import build_packed_plan
from fesom2_accelerate_tpu.ops.pallas.plan import BLOCK


def _relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1.0)


def test_packed_plan_invariants(small_mesh):
    mesh = small_mesh
    _, ps = pstep.build_pallas_data(mesh)
    assert ps.pack_K > 0, "structured preset must admit the packed layout"
    pk = build_packed_plan(mesh, ps.tile, ps.Np)
    # every edge in exactly one (slot, home) cell
    assert (pk.einv >= 0).sum() == mesh.n_edges
    e_ids = pk.einv[pk.einv >= 0]
    assert len(np.unique(e_ids)) == mesh.n_edges
    # home is the canonical first endpoint; level bound matches
    k, h = np.nonzero(pk.einv >= 0)
    e = pk.einv[k, h]
    np.testing.assert_array_equal(h, mesh.edges[e, 0])
    np.testing.assert_array_equal(pk.lev_home[k, h], mesh.nlev_edge[e])
    # gather pair shifts reconstruct the true other-endpoint columns
    P_g = sum(pk.Pk_g)
    base = np.concatenate([[0], np.cumsum(pk.Pk_g)])
    for t in range(pk.g_ind.shape[0]):
        for p in range(P_g):
            cols = np.nonzero(pk.g_ind[t, p])[0]
            if not len(cols):
                continue
            k = int(np.searchsorted(base, p, side="right") - 1)
            s = pk.g_wb[t, 1 + p] * BLOCK + pk.g_wb[t, 1 + P_g + p]
            src = pk.g_wb[t, 0] * BLOCK + s + cols
            home = t * ps.tile + cols
            ed = pk.einv[k, home]
            assert (ed >= 0).all()
            np.testing.assert_array_equal(src, mesh.edges[ed, 1])


def test_packed_pad_unpad_roundtrip(small_mesh):
    mesh = small_mesh
    pd, ps = pstep.build_pallas_data(mesh)
    assert ps.pack_K > 0
    rng = np.random.default_rng(0)
    v = rng.standard_normal((ps.L, ps.Ed)).astype(np.float32)
    packed = pstep._pack_edge_field(ps, pd, jnp.asarray(v))
    assert packed.shape == (ps.pack_K * ps.Lp, ps.Np)
    back = pstep._unpack_edge_field(ps, pd, packed)
    np.testing.assert_array_equal(np.asarray(back), v)


def test_unpack_masks_padded_edges(small_mesh):
    """Padded part edges (nlev_edge == 0) hold slot 0 / home 0 in the
    packed layout; _unpack_edge_field must zero their lanes instead of
    surfacing the slot-0/home-0 edge's flux (which a direct consumer of
    the local edge field would read as plausible garbage)."""
    from fesom2_accelerate_tpu.parallel.partition import partition_mesh

    pm = partition_mesh(small_mesh, 4)
    lm = next((m for m in pm.local_meshes if (m.nlev_edge == 0).any()),
              None)
    assert lm is not None, "expected at least one part with padded edges"
    pd, ps = pstep.build_pallas_data(lm)
    assert ps.pack_K > 0
    rng = np.random.default_rng(3)
    v = rng.standard_normal((ps.L, ps.Ed)).astype(np.float32)
    back = np.asarray(pstep._unpack_edge_field(
        ps, pd, pstep._pack_edge_field(ps, pd, jnp.asarray(v))))
    valid = np.asarray(lm.nlev_edge) > 0
    np.testing.assert_array_equal(back[:, valid], v[:, valid])
    assert (back[:, ~valid] == 0).all()


@pytest.mark.parametrize("iter_yn", [False, True])
def test_packed_step_matches_onehot(small_mesh, iter_yn):
    """Full packed chain vs the one-hot chain (same f32 inputs): both are
    correct to f32 rounding; summation order differs, so compare with a
    tight tolerance, and both against the f64 oracle."""
    mesh = small_mesh
    fields = random_fields(mesh, seed=11, dtype=np.float32)
    s = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.7, iter_yn=iter_yn, dtype=jnp.float32,
                       flux_eps=1e-7)
    pd_p, ps_p = pstep.build_pallas_data(mesh)
    assert ps_p.pack_K > 0
    pd_o, ps_o = pstep.build_pallas_data(mesh, pack_pmax=0)
    assert ps_o.pack_K == 0
    with pltpu.force_tpu_interpret_mode():
        out_p = pstep.fct_ale_step_pallas(pd_p, ps_p, cfg, s)
        out_o = pstep.fct_ale_step_pallas(pd_o, ps_o, cfg, s)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=1, iter_yn=iter_yn, dt=0.7, flux_eps=1e-7,
    )
    for k, v in ref.items():
        assert _relerr(out_p[k], v) < 2e-5, f"packed vs oracle: {k}"
        assert _relerr(out_p[k], out_o[k]) < 1e-5, f"packed vs onehot: {k}"


def test_cylinder_falls_back_to_onehot():
    """RCM-ordered meshes have per-tile offset sets far beyond pack_pmax:
    the gate must fall back to the one-hot kernels, which stay correct."""
    mesh = generate_cylinder_mesh(48, 32, 12)
    if isinstance(mesh, tuple):
        mesh = mesh[0]
    pd, ps = pstep.build_pallas_data(mesh)
    assert ps.pack_K == 0, "cylinder/RCM must not take the packed path"
    fields = random_fields(mesh, seed=4, dtype=np.float32)
    s = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    with pltpu.force_tpu_interpret_mode():
        out = pstep.fct_ale_step_pallas(pd, ps, cfg, s)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=1, dt=0.5, flux_eps=1e-7,
    )
    for k in ("fct_plus", "fct_minus", "fct_adf_h", "del_ttf_advhoriz"):
        assert _relerr(out[k], ref[k]) < 2e-5, k


@pytest.mark.parametrize("iter_yn", [False, True])
def test_fused_k34_matches_split(small_mesh, iter_yn):
    """The fused K3+K4 kernel (kernels_packed.update_fused_pallas — the
    default exchange-free production path since round 5) is bit-identical
    to the split K3 -> K4 chain it replaces."""
    mesh = small_mesh
    fields = random_fields(mesh, seed=17, dtype=np.float32)
    s = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.7, iter_yn=iter_yn, dtype=jnp.float32,
                       flux_eps=1e-7)
    pd_f, ps_f = pstep.build_pallas_data(mesh)
    pd_s, ps_s = pstep.build_pallas_data(mesh, fuse_k34=False)
    assert ps_f.fuse_k34, "preset must admit the fused K3+K4 form"
    assert not ps_s.fuse_k34
    with pltpu.force_tpu_interpret_mode():
        out_f = pstep.fct_ale_step_pallas(pd_f, ps_f, cfg, s)
        out_s = pstep.fct_ale_step_pallas(pd_s, ps_s, cfg, s)
    for k in out_s:
        if iter_yn and k == "fct_adf_h":
            # the h residual: split computes (1-ae)*F, fused computes
            # F - ae*F — equal up to one f32 rounding
            np.testing.assert_allclose(
                np.asarray(out_f[k]), np.asarray(out_s[k]), rtol=1e-5,
                atol=5e-7, err_msg=k)
        else:
            np.testing.assert_array_equal(
                np.asarray(out_f[k]), np.asarray(out_s[k]), err_msg=k)


def test_batched_tracers_vlimit3(small_mesh):
    """vlimit 2/3 flow through the batched K1 unchanged (the variant knob
    lives in the bounds epilogue): batched == single per tracer."""
    mesh = small_mesh
    cfg = FctAleConfig(dt=0.7, vlimit=3, dtype=jnp.float32, flux_eps=1e-7)
    pd, ps = pstep.build_pallas_data(mesh)
    per = [random_fields(mesh, seed=30 + t, dtype=np.float32)
           for t in range(2)]
    shared = {k: jnp.asarray(per[0][k]) for k in ("hnode", "hnode_new")}
    batched = dict(shared)
    for k in per[0]:
        if k not in ("hnode", "hnode_new"):
            batched[k] = jnp.asarray(np.stack([f[k] for f in per]))
    with pltpu.force_tpu_interpret_mode():
        out_b = pstep.fct_ale_step_pallas_batched(pd, ps, cfg, batched)
        s = {k: jnp.asarray(v) for k, v in per[1].items()}
        s.update(shared)
        out_1 = pstep.fct_ale_step_pallas(pd, ps, cfg, s)
    for k in ("fct_ttf_max", "fct_plus", "fct_adf_h", "del_ttf_advvert"):
        np.testing.assert_array_equal(np.asarray(out_b[k][1]),
                                      np.asarray(out_1[k]), err_msg=k)


@pytest.mark.parametrize("iter_yn", [False, True])
def test_batched_tracers_match_single(small_mesh, iter_yn):
    """Multi-tracer batching (fct_ale_step_pallas_batched): Tb tracers
    row-stacked through one compiled chain on a (tiles, tracers) grid must
    equal Tb independent single-tracer steps bit-for-bit (same kernels,
    same math, shared geometry).  Reference: one full library call per
    tracer (include/fesom2-accelerate.h:213-236)."""
    mesh = small_mesh
    Tb = 3
    cfg = FctAleConfig(dt=0.7, iter_yn=iter_yn, dtype=jnp.float32,
                       flux_eps=1e-7)
    pd, ps = pstep.build_pallas_data(mesh)
    assert ps.fuse_k34
    per = [random_fields(mesh, seed=20 + t, dtype=np.float32)
           for t in range(Tb)]
    shared = {k: jnp.asarray(per[0][k]) for k in ("hnode", "hnode_new")}
    batched = dict(shared)
    for k in per[0]:
        if k not in ("hnode", "hnode_new"):
            batched[k] = jnp.asarray(np.stack([f[k] for f in per]))
    with pltpu.force_tpu_interpret_mode():
        out_b = pstep.fct_ale_step_pallas_batched(pd, ps, cfg, batched)
        outs = []
        for t in range(Tb):
            s = {k: jnp.asarray(v) for k, v in per[t].items()}
            s.update(shared)
            outs.append(pstep.fct_ale_step_pallas(pd, ps, cfg, s))
    for k in outs[0]:
        for t in range(Tb):
            got = np.asarray(out_b[k][t] if k not in ("hnode", "hnode_new")
                             else out_b[k])
            np.testing.assert_array_equal(
                got, np.asarray(outs[t][k]), err_msg=f"{k}[t={t}]")
            if k in ("hnode", "hnode_new"):
                break


@pytest.mark.parametrize("iter_yn", [False, True])
def test_fused_k12_matches_oracle(small_mesh, iter_yn):
    """The opt-in fused K1+K2 kernel (kernels_packed.limit_fused_pallas;
    off by default — see PallasStatic.fuse_k12) matches the oracle."""
    mesh = small_mesh
    pd, ps = pstep.build_pallas_data(mesh, fuse_k12=True)
    assert ps.fuse_k12 and ps.a3f_dia_D and ps.pack_K
    fields = random_fields(mesh, seed=13, dtype=np.float32)
    s = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    cfg = FctAleConfig(dt=0.6, iter_yn=iter_yn, dtype=jnp.float32,
                       flux_eps=1e-7)
    with pltpu.force_tpu_interpret_mode():
        out = pstep.fct_ale_step_pallas(pd, ps, cfg, s)
    ref = oracle.fct_ale_step(
        mesh, {k: v.astype(np.float64) for k, v in fields.items()},
        vlimit=1, iter_yn=iter_yn, dt=0.6, flux_eps=1e-7,
    )
    for k, v in ref.items():
        assert _relerr(out[k], v) < 2e-5, f"fused[{k}]"

"""Native C++ core vs Python implementations.

The C++ library is a second, independent implementation of both the topology
derivation and the pinned FCT-ALE semantics — agreement with the numpy side
is part of the semantics gate."""

import numpy as np
import pytest

from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.mesh import native
from fesom2_accelerate_tpu.ops import oracle

from conftest import masked_allclose

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


def test_native_edges_match(small_mesh):
    m = small_mesh
    edges, edge_tri = native.build_edges(m.elem_nodes)
    np.testing.assert_array_equal(edges, m.edges)
    np.testing.assert_array_equal(edge_tri, m.edge_tri)


def test_native_ragged_match(small_mesh):
    m = small_mesh
    rows = m.elem_nodes.ravel()
    cols = np.repeat(np.arange(m.n_elems, dtype=np.int32), 3)
    pos = np.tile(np.arange(3, dtype=np.int32), m.n_elems)
    padded, counts, extra = native.ragged_to_padded(
        rows, cols, m.n_nodes, extra=pos
    )
    np.testing.assert_array_equal(padded, m.node_elems)
    np.testing.assert_array_equal(counts, m.node_elems_num)
    np.testing.assert_array_equal(extra, m.node_elems_pos)


@pytest.mark.parametrize("iter_yn", [False, True])
def test_native_reference_matches_oracle(small_mesh, iter_yn):
    m = small_mesh
    fields = random_fields(m, seed=5)
    ref = native.NativeReference(m)
    out_c = ref.step(fields, dt=0.7, iter_yn=iter_yn)
    out_py = oracle.fct_ale_step(m, fields, vlimit=1, iter_yn=iter_yn, dt=0.7)
    for k in out_py:
        masked_allclose(out_c[k], out_py[k], rtol=1e-12, atol=1e-12,
                        msg=f"native[{k}] iter={iter_yn}")


def test_native_stress2rhs(small_mesh):
    import ctypes

    m = small_mesh
    lib = native.load()
    rng = np.random.default_rng(9)
    E, N = m.n_elems, m.n_nodes
    elem_area = np.abs(rng.standard_normal(E)) + 0.1
    ice_strength = rng.standard_normal(E)
    s11, s12, s22 = rng.standard_normal((3, E))
    grad = rng.standard_normal((6, E))
    mf = rng.standard_normal(E)
    iam = rng.standard_normal(N)
    rhs_a, rhs_m = rng.standard_normal((2, N))
    U = np.empty(N)
    V = np.empty(N)

    def p(a):
        return np.ascontiguousarray(a).ctypes.data_as(ctypes.c_void_p)

    en = np.ascontiguousarray(m.elem_nodes, np.int32)
    args = [ctypes.c_int64(N), ctypes.c_int64(E),
            en.ctypes.data_as(ctypes.c_void_p)]
    holders = [np.ascontiguousarray(x, np.float64) for x in
               (elem_area, ice_strength, s11, s12, s22, grad, mf, iam,
                rhs_a, rhs_m, U, V)]
    lib.f2t_stress2rhs(*args, *[h.ctypes.data_as(ctypes.c_void_p)
                                for h in holders])
    U, V = holders[-2], holders[-1]
    rU, rV = oracle.stress2rhs(
        m.elem_nodes, m.node_elems, m.node_elems_pos, m.node_elems_num,
        elem_area, ice_strength, s11, s12, s22, grad, mf, iam, rhs_a, rhs_m,
    )
    masked_allclose(U, rU, msg="native stress2rhs U")
    masked_allclose(V, rV, msg="native stress2rhs V")

import numpy as np
import pytest

from fesom2_accelerate_tpu.mesh import generate_planar_mesh
from fesom2_accelerate_tpu.mesh.topology import build_mesh_from_elements


@pytest.mark.parametrize("preset", ["toy", "tiny", "small", "pi"])
def test_presets_valid(preset):
    m = generate_planar_mesh(preset=preset)
    m.validate()
    # Euler characteristic of a disk-like planar triangulation: V - E + F = 1
    assert m.n_nodes - m.n_edges + m.n_elems == 1


def test_edge_counts(tiny_mesh):
    m = tiny_mesh
    # every interior edge borders two triangles, boundary edges one
    interior = (m.edge_tri[:, 1] >= 0).sum()
    boundary = (m.edge_tri[:, 1] < 0).sum()
    assert interior + boundary == m.n_edges
    assert boundary > 0
    # 3 edges per triangle, interior counted twice
    assert 3 * m.n_elems == 2 * interior + boundary


def test_incidence_consistency(tiny_mesh):
    m = tiny_mesh
    # node_elems round-trip: node n appears in elem_nodes[e, pos]
    for n in range(m.n_nodes):
        for k in range(m.node_elems_num[n]):
            e = m.node_elems[n, k]
            pos = m.node_elems_pos[n, k]
            assert m.elem_nodes[e, pos] == n
        assert (m.node_elems[n, m.node_elems_num[n]:] == -1).all()
    # node_edges round trip with sign
    for n in range(m.n_nodes):
        for k in range(m.node_edges_num[n]):
            ed = m.node_edges[n, k]
            s = m.node_edges_sign[n, k]
            assert m.edges[ed, 0 if s == 1 else 1] == n
    # total edge incidences = 2 * edges
    assert m.node_edges_num.sum() == 2 * m.n_edges


def test_edge_tri_contains_edge_nodes(tiny_mesh):
    m = tiny_mesh
    for ed in range(m.n_edges):
        n1, n2 = m.edges[ed]
        for t in m.edge_tri[ed]:
            if t >= 0:
                tri = set(m.elem_nodes[t])
                assert n1 in tri and n2 in tri


def test_levels_invariants(small_mesh):
    m = small_mesh
    assert (m.nlev_nod >= 3).all() and (m.nlev_nod <= m.nl).all()
    # per-edge active layers never exceed either endpoint's active layers
    assert (m.nlev_edge <= m.nlev_nod[m.edges[:, 0]] - 1).all()
    assert (m.nlev_edge <= m.nlev_nod[m.edges[:, 1]] - 1).all()
    # variable bathymetry actually present
    assert len(np.unique(m.nlev_elem)) > 3


def test_non_manifold_rejected():
    # three triangles sharing one edge (0,1) is non-manifold
    elem_nodes = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4]], dtype=np.int32)
    nlev = np.full(3, 3, dtype=np.int32)
    xy = np.array(
        [[0, 0], [1, 0], [0.5, 1], [0.5, -1], [1.5, 1]], dtype=np.float64
    )
    with pytest.raises(ValueError):
        build_mesh_from_elements(elem_nodes, nlev, 4, xy)

"""ctypes bindings to the native mesh/reference core (native/fesom2_tpu_core).

The native library is optional: every entry point has a pure-Python
equivalent (mesh/topology.py, ops/oracle.py); when the shared object is
present (``make -C native``) the topology build switches to it for speed at
CORE2 scale, and tests cross-validate the C++ golden reference against the
numpy oracle (a second independent implementation of the pinned semantics).
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

_LIB_PATH = (
    pathlib.Path(__file__).resolve().parents[2]
    / "native" / "build" / "libfesom2_tpu_core.so"
)


def build_native(quiet: bool = True) -> bool:
    """Build the native library in place; returns True on success."""
    native_dir = _LIB_PATH.parents[1]
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


@functools.lru_cache(maxsize=1)
def load() -> "ctypes.CDLL | None":
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.f2t_count_edges.restype = ctypes.c_int64
    lib.f2t_build_edges.restype = ctypes.c_int32
    lib.f2t_ragged_to_padded.restype = ctypes.c_int32
    return lib


def available() -> bool:
    return load() is not None


def _ptr(a, dtype):
    a = np.ascontiguousarray(a, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.c_void_p)


def build_edges(elem_nodes: np.ndarray):
    """Native edge derivation; same contract as topology._build_edges."""
    lib = load()
    assert lib is not None
    elem_nodes, p_en = _ptr(elem_nodes, np.int32)
    E = elem_nodes.shape[0]
    N = int(elem_nodes.max()) + 1
    n_edges = lib.f2t_count_edges(p_en, ctypes.c_int64(E), ctypes.c_int64(N))
    if n_edges < 0:
        raise ValueError("non-manifold mesh: an edge borders > 2 triangles")
    edges = np.empty((n_edges, 2), dtype=np.int32)
    edge_tri = np.empty((n_edges, 2), dtype=np.int32)
    rc = lib.f2t_build_edges(
        p_en, ctypes.c_int64(E), ctypes.c_int64(N),
        edges.ctypes.data_as(ctypes.c_void_p),
        edge_tri.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("non-manifold mesh: an edge borders > 2 triangles")
    return edges, edge_tri


def ragged_to_padded(rows, cols, n_rows, extra=None):
    """Native transposed-incidence builder; contract of
    topology._ragged_to_padded."""
    lib = load()
    assert lib is not None
    rows, p_rows = _ptr(rows, np.int32)
    cols, p_cols = _ptr(cols, np.int32)
    n_pairs = len(rows)
    counts = np.empty(n_rows, dtype=np.int32)
    K = lib.f2t_ragged_to_padded(
        p_rows, p_cols, None, ctypes.c_int64(n_pairs),
        ctypes.c_int64(n_rows), 0, None, None,
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    padded = np.empty((n_rows, max(K, 1)), dtype=np.int32)
    if extra is not None:
        extra32, p_extra = _ptr(extra, np.int32)
        padded_extra = np.empty((n_rows, max(K, 1)), dtype=np.int32)
        lib.f2t_ragged_to_padded(
            p_rows, p_cols, p_extra, ctypes.c_int64(n_pairs),
            ctypes.c_int64(n_rows), max(K, 1),
            padded.ctypes.data_as(ctypes.c_void_p),
            padded_extra.ctypes.data_as(ctypes.c_void_p),
            counts.ctypes.data_as(ctypes.c_void_p),
        )
        return padded, counts, padded_extra.astype(extra.dtype)
    lib.f2t_ragged_to_padded(
        p_rows, p_cols, None, ctypes.c_int64(n_pairs),
        ctypes.c_int64(n_rows), max(K, 1),
        padded.ctypes.data_as(ctypes.c_void_p), None,
        counts.ctypes.data_as(ctypes.c_void_p),
    )
    return padded, counts


class NativeReference:
    """C++ golden reference for the FCT-ALE chain (f64, level-major)."""

    def __init__(self, mesh):
        self.lib = load()
        assert self.lib is not None
        self.mesh = mesh
        self.L = mesh.n_layers
        self.N = mesh.n_nodes
        self.E = mesh.n_elems
        self.Ed = mesh.n_edges
        self._nlev_nod, self.p_nlev_nod = _ptr(mesh.nlev_nod, np.int32)
        self._nlev_elem, self.p_nlev_elem = _ptr(mesh.nlev_elem, np.int32)
        self._nlev_edge, self.p_nlev_edge = _ptr(mesh.nlev_edge, np.int32)
        self._elem_nodes, self.p_elem_nodes = _ptr(mesh.elem_nodes, np.int32)
        self._edges, self.p_edges = _ptr(mesh.edges, np.int32)
        ne = np.where(mesh.node_elems >= 0, mesh.node_elems, 0)
        self._ne, self.p_ne = _ptr(ne, np.int32)
        self._ne_num, self.p_ne_num = _ptr(mesh.node_elems_num, np.int32)
        self.K = mesh.node_elems.shape[1]
        self._ai, self.p_ai = _ptr(mesh.area_inv[: self.L], np.float64)

    def _p(self, a):
        a = np.ascontiguousarray(a, dtype=np.float64)
        return a, a.ctypes.data_as(ctypes.c_void_p)

    def step(self, fields, dt=1.0, flux_eps=1e-16, bignumber=1e3,
             iter_yn=False):
        """Full a->b->c chain (vlimit=1).  Returns dict like the oracle."""
        L, N, E, Ed = self.L, self.N, self.E, self.Ed
        i64 = ctypes.c_int64
        lo, p_lo = self._p(fields["fct_LO"])
        ttf, p_ttf = self._p(fields["ttf"])
        tmax = np.empty((L, N))
        tmin = np.empty((L, N))
        self.lib.f2t_a1(i64(L), i64(N), self.p_nlev_nod, p_lo, p_ttf,
                        *(x.ctypes.data_as(ctypes.c_void_p)
                          for x in (tmax, tmin)))
        UV_max = np.empty((L, E))
        UV_min = np.empty((L, E))
        self.lib.f2t_a2(i64(L), i64(N), i64(E), self.p_elem_nodes,
                        self.p_nlev_elem,
                        tmax.ctypes.data_as(ctypes.c_void_p),
                        tmin.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_double(bignumber),
                        UV_max.ctypes.data_as(ctypes.c_void_p),
                        UV_min.ctypes.data_as(ctypes.c_void_p))
        tmax2 = np.empty((L, N))
        tmin2 = np.empty((L, N))
        self.lib.f2t_a3_vlimit1(i64(L), i64(N), i64(E), self.p_nlev_nod,
                                self.p_ne, self.p_ne_num,
                                ctypes.c_int32(self.K),
                                UV_max.ctypes.data_as(ctypes.c_void_p),
                                UV_min.ctypes.data_as(ctypes.c_void_p), p_lo,
                                tmax2.ctypes.data_as(ctypes.c_void_p),
                                tmin2.ctypes.data_as(ctypes.c_void_p))
        adf_v, p_adf_v = self._p(fields["fct_adf_v"].copy())
        adf_h, p_adf_h = self._p(fields["fct_adf_h"].copy())
        plus = np.empty((L, N))
        minus = np.empty((L, N))
        self.lib.f2t_b1(i64(L), i64(N), i64(Ed), self.p_nlev_nod,
                        self.p_edges, self.p_nlev_edge, p_adf_v, p_adf_h,
                        plus.ctypes.data_as(ctypes.c_void_p),
                        minus.ctypes.data_as(ctypes.c_void_p))
        self.lib.f2t_b2(i64(L), i64(N), self.p_nlev_nod, self.p_ai,
                        tmax2.ctypes.data_as(ctypes.c_void_p),
                        tmin2.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_double(dt), ctypes.c_double(flux_eps),
                        plus.ctypes.data_as(ctypes.c_void_p),
                        minus.ctypes.data_as(ctypes.c_void_p))
        adf_v2 = np.zeros_like(adf_v) if iter_yn else None
        self.lib.f2t_b3_vertical(
            i64(L), i64(N), self.p_nlev_nod,
            plus.ctypes.data_as(ctypes.c_void_p),
            minus.ctypes.data_as(ctypes.c_void_p), p_adf_v,
            ctypes.c_int32(int(iter_yn)),
            adf_v2.ctypes.data_as(ctypes.c_void_p) if iter_yn else None)
        adf_h2 = np.zeros_like(adf_h) if iter_yn else None
        self.lib.f2t_b3_horizontal(
            i64(L), i64(N), i64(Ed), self.p_edges, self.p_nlev_edge,
            plus.ctypes.data_as(ctypes.c_void_p),
            minus.ctypes.data_as(ctypes.c_void_p), p_adf_h,
            ctypes.c_int32(int(iter_yn)),
            adf_h2.ctypes.data_as(ctypes.c_void_p) if iter_yn else None)
        out = dict(fct_ttf_max=tmax2, fct_ttf_min=tmin2, fct_plus=plus,
                   fct_minus=minus)
        if iter_yn:
            new_LO, p_new_LO = self._p(fields["fct_LO"].copy())
            hn, p_hn = self._p(fields["hnode_new"])
            self.lib.f2t_c_update_LO(
                i64(L), i64(N), i64(Ed), self.p_nlev_nod, self.p_edges,
                self.p_nlev_edge, p_adf_v, p_adf_h, self.p_ai, p_hn,
                ctypes.c_double(dt), p_new_LO)
            out.update(fct_LO=new_LO, fct_adf_v=adf_v2, fct_adf_h=adf_h2,
                       fct_adf_v_limited=adf_v, fct_adf_h_limited=adf_h)
        else:
            del_v, p_del_v = self._p(fields["del_ttf_advvert"].copy())
            del_h, p_del_h = self._p(fields["del_ttf_advhoriz"].copy())
            hnode, p_hnode = self._p(fields["hnode"])
            hn, p_hn = self._p(fields["hnode_new"])
            self.lib.f2t_c_update_solution(
                i64(L), i64(N), i64(Ed), self.p_nlev_nod, self.p_edges,
                self.p_nlev_edge, p_ttf, p_hnode, p_hn, p_lo, p_adf_v,
                p_adf_h, self.p_ai, ctypes.c_double(dt), p_del_v, p_del_h)
            out.update(fct_adf_v=adf_v, fct_adf_h=adf_h,
                       del_ttf_advvert=del_v, del_ttf_advhoriz=del_h)
        return out

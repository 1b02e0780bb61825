"""Checkpoint / resume of solver state.

The reference has no checkpointing (SURVEY §5 — the host model owns it); a
standalone production framework needs it, so state dicts (plus the config
and mesh fingerprint for safety) round-trip through Orbax when available
(``use_orbax=True``, the default when importable), with a numpy ``.npz``
fallback.  The format used is recorded in ``meta.json`` and loading honors
it regardless of the current environment.
"""

from __future__ import annotations

import hashlib
import json
import pathlib

import numpy as np

from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.mesh.topology import Mesh


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except ImportError:
        return None


def mesh_fingerprint(mesh: Mesh) -> str:
    h = hashlib.sha256()
    for arr in (mesh.elem_nodes, mesh.nlev_elem, mesh.edges):
        h.update(np.ascontiguousarray(arr).tobytes())
    h.update(str(mesh.nl).encode())
    return h.hexdigest()[:16]


def save_checkpoint(path, state: dict, mesh: Mesh, cfg: FctAleConfig,
                    step: int = 0, use_orbax: "bool | None" = None) -> None:
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    ocp = _orbax() if use_orbax in (None, True) else None
    if use_orbax and ocp is None:
        raise RuntimeError("use_orbax=True but orbax is not importable")
    fmt = "orbax" if ocp is not None else "npz"
    meta = dict(
        step=step,
        mesh=mesh_fingerprint(mesh),
        vlimit=cfg.vlimit,
        iter_yn=cfg.iter_yn,
        dt=cfg.dt,
        dtype=str(np.dtype(cfg.np_dtype)),
        format=fmt,
    )
    (path / "meta.json").write_text(json.dumps(meta))
    if fmt == "orbax":
        ckptr = ocp.PyTreeCheckpointer()
        target = path.resolve() / "state.orbax"
        ckptr.save(target, {k: np.asarray(v) for k, v in state.items()},
                   force=True)
    else:
        np.savez(path / "state.npz",
                 **{k: np.asarray(v) for k, v in state.items()})


def load_checkpoint(path, mesh: Mesh, cfg: FctAleConfig):
    """Returns (state dict of numpy arrays, step).  Raises on mesh or config
    mismatch — resuming onto a different mesh is a corruption hazard."""
    path = pathlib.Path(path)
    meta = json.loads((path / "meta.json").read_text())
    if meta["mesh"] != mesh_fingerprint(mesh):
        raise ValueError(
            f"checkpoint mesh {meta['mesh']} != current "
            f"{mesh_fingerprint(mesh)}"
        )
    if meta["vlimit"] != cfg.vlimit or meta["iter_yn"] != cfg.iter_yn:
        raise ValueError(f"checkpoint config mismatch: {meta}")
    fmt = meta.get("format", "npz")
    if fmt == "orbax":
        ocp = _orbax()
        if ocp is None:
            raise RuntimeError("checkpoint was written with orbax, which is "
                               "not importable here")
        restored = ocp.PyTreeCheckpointer().restore(
            path.resolve() / "state.orbax")
        state = {k: np.asarray(v) for k, v in restored.items()}
    else:
        with np.load(path / "state.npz") as z:
            state = {k: z[k] for k in z.files}
    return state, int(meta["step"])

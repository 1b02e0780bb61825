"""Multi-process (multi-host) execution of the sharded step.

The reference's multi-node story lives in host FESOM2's MPI (SURVEY §4
"Multi-node: NOT tested in-repo"); here it is first-class: two OS processes
join via ``jax.distributed.initialize`` (gloo CPU collectives standing in
for ICI/DCN), the device mesh spans both processes (2 local devices each ->
4 global), and the same shard_map + ppermute step runs unchanged.  The
result must match the single-process solver on owned nodes."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_DIR = os.path.dirname(__file__)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(backend, tmp_path, n_procs=2, timeout=420):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs, outs = [], []
    for pid in range(n_procs):
        out = os.path.join(str(tmp_path), f"w{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "multiproc_worker.py"),
             coord, str(n_procs), str(pid), backend, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return outs


@pytest.mark.parametrize("backend", ["xla"])
def test_two_process_matches_single(backend, tmp_path):
    outs = _run_workers(backend, tmp_path)

    # single-process reference over the SAME global partition (4 parts)
    import jax
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver

    mesh = generate_planar_mesh(preset="tiny")
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    solver = ShardedFctAleSolver(mesh, cfg, devices=jax.devices()[:4],
                                 backend=backend)
    fields = random_fields(mesh, seed=0, dtype=np.float32)
    state = solver.step(solver.init_state(fields))
    ref_plus = solver.gather_node(state["fct_plus"])
    ref_dv = solver.gather_node(state["del_ttf_advvert"])

    for out in outs:
        got = np.load(out)
        np.testing.assert_array_equal(got["fct_plus"], ref_plus)
        np.testing.assert_array_equal(got["del_ttf_advvert"], ref_dv)

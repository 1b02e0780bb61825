"""Worker for tests/test_multiprocess.py: one of N OS processes running the
sharded FCT-ALE step over a process-spanning device mesh (gloo CPU
collectives standing in for ICI/DCN).

Usage: python multiproc_worker.py <coordinator> <num_procs> <proc_id>
       <backend> <outfile>

Writes the gathered (global) fct_plus/del_ttf_advvert owned-node results to
<outfile> (.npz) so the parent can compare against the single-device run.
"""

import os
import sys


def main():
    coordinator, n_procs, pid, backend, outfile = sys.argv[1:6]
    n_procs, pid = int(n_procs), int(pid)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fesom2_accelerate_tpu.parallel import distributed as dist

    dist.init_distributed(coordinator_address=coordinator,
                          num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs
    devices = dist.global_devices()
    assert len(devices) == 2 * n_procs

    import numpy as np
    import jax.numpy as jnp

    from fesom2_accelerate_tpu.config import FctAleConfig
    from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
    from fesom2_accelerate_tpu.parallel import ShardedFctAleSolver

    mesh = generate_planar_mesh(preset="tiny")
    cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
    solver = ShardedFctAleSolver(mesh, cfg, devices=devices, backend=backend)
    assert solver._multiproc
    fields = random_fields(mesh, seed=0, dtype=np.float32)
    state = solver.init_state(fields)
    state = solver.step(state)
    jax.block_until_ready(state)

    plus = solver.gather_node(state["fct_plus"])
    dv = solver.gather_node(state["del_ttf_advvert"])
    np.savez(outfile, fct_plus=plus, del_ttf_advvert=dv)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()

import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver

mesh = generate_planar_mesh(preset="core2")
fields = random_fields(mesh, seed=0, dtype=np.float64)
cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
solver = FctAleSolver(mesh, cfg, backend="pallas")
state = solver.init_state(fields)
out = solver.run(state, 5)
print("warm", float(jnp.sum(out["fct_adf_h"])))
jax.profiler.start_trace("/tmp/trace_f2t")
out = solver.run(state, 5)
print("traced", float(jnp.sum(out["fct_adf_h"])))
jax.profiler.stop_trace()

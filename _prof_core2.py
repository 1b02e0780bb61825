import json, time, functools
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.runtime.tracing import time_stages, _timeit
from fesom2_accelerate_tpu.config import FctAleConfig
from fesom2_accelerate_tpu.ops.pallas import step as pstep
from fesom2_accelerate_tpu.ops.pallas import kernels
from fesom2_accelerate_tpu.ops import stages

mesh = generate_planar_mesh(preset="core2")
fields = random_fields(mesh, seed=0, dtype=np.float32)


print("=== Pallas kernels (core2, f32) ===")
pd, ps = pstep.build_pallas_data(mesh)
md = pd.md
cfg = FctAleConfig(dt=0.5, dtype=jnp.float32, flux_eps=1e-7)
L, Lp, N, Np, Ed, Edp = ps.L, ps.Lp, ps.N, ps.Np, ps.Ed, ps.Edp
print(f"N={N} Np={Np} E={ps.E} Ep={ps.Ep} Ed={Ed} Edp={Edp} L={L} Lp={Lp} "
      f"K={ps.K} KD={ps.KD}")
print(f"nblocks: a2={ps.a2_nblocks} a3={ps.a3_nblocks} ne={ps.ne_nblocks} b3h={ps.b3h_nblocks} a3f={ps.a3f_nblocks}")

state = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
pad_node = lambda x: jnp.pad(x, ((0, 0), (0, Np - x.shape[1])))
pad_edge = lambda x: jnp.pad(x, ((0, 0), (0, Edp - x.shape[1])))
ttf = pad_node(state["ttf"]); fct_LO = pad_node(state["fct_LO"])
adf_v = pad_node(state["fct_adf_v"]); adf_h = pad_edge(state["fct_adf_h"])
adf_h_pad = pstep._rowpad(adf_h, Lp)
tmax, tmin = jax.jit(stages.a1)(md, fct_LO, ttf)
src = pstep._stack2(tmax, tmin, Lp)
lo_pad = pstep._rowpad(fct_LO, Lp)

def t(name, fn, *args):
    jf = jax.jit(fn)
    ms = _timeit(jf, *args, iters=20) * 1e3
    print(f"{name:12s} {ms:8.3f} ms")
    return jf(*args)

tt = t("a3f_pallas", functools.partial(
    kernels.a3_fused_pallas, tile=pstep.TILE, nblocks=ps.a3f_nblocks, K=ps.KD),
    src, pd.a3f_lidx, pd.a3f_lev, pd.a3f_wb, pd.nlev_nod_row, lo_pad)

plus, minus = jax.jit(stages.b1_vertical)(md, adf_v)
pm_in = pstep._stack2(plus, minus, Lp)
pm = t("b1h_pallas", functools.partial(
    kernels.b1h_pallas, tile=pstep.TILE, nblocks=ps.ne_nblocks),
    pm_in, adf_h_pad, pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb)

pm2 = pm
out2 = t("b3h_pallas", functools.partial(
    kernels.b3h_pallas, tile=pstep.TILE, nblocks=ps.b3h_nblocks),
    pm2, adf_h_pad, pd.b3h_lidx, pd.b3h_wb, pd.nlev_edge_row)

dh = t("ch_pallas", functools.partial(
    kernels.ch_pallas, n_nodes_pad=Np, tile=pstep.TILE, nblocks=ps.ne_nblocks),
    adf_h_pad, pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb)

UV = t("a2_pallas", functools.partial(
    kernels.a2_pallas, tile=pstep.TILE, nblocks=ps.a2_nblocks, bignumber=1e3),
    src, pd.a2_lidx, pd.a2_wb, pd.nlev_elem_row)

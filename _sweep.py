import functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.runtime.tracing import _timeit
from fesom2_accelerate_tpu.ops.pallas import step as pstep
from fesom2_accelerate_tpu.ops.pallas import kernels
from fesom2_accelerate_tpu.ops import stages

mesh = generate_planar_mesh(preset="core2")
fields = random_fields(mesh, seed=0, dtype=np.float32)

for TILE in (256, 512, 1024):
    pstep.TILE = TILE
    pd, ps = pstep.build_pallas_data(mesh)
    md = pd.md
    L, Lp, N, Np, Ed, Edp = ps.L, ps.Lp, ps.N, ps.Np, ps.Ed, ps.Edp
    state = {k: jnp.asarray(v, jnp.float32) for k, v in fields.items()}
    pad_node = lambda x: jnp.pad(x, ((0, 0), (0, Np - x.shape[1])))
    pad_edge = lambda x: jnp.pad(x, ((0, 0), (0, Edp - x.shape[1])))
    ttf = pad_node(state["ttf"]); fct_LO = pad_node(state["fct_LO"])
    adf_v = pad_node(state["fct_adf_v"]); adf_h = pad_edge(state["fct_adf_h"])
    adf_h_pad = pstep._rowpad(adf_h, Lp)
    tmax, tmin = jax.jit(stages.a1)(md, fct_LO, ttf)
    src = pstep._stack2(tmax, tmin, Lp)
    lo_pad = pstep._rowpad(fct_LO, Lp)
    plus, minus = jax.jit(stages.b1_vertical)(md, adf_v)
    pm_in = pstep._stack2(plus, minus, Lp)

    def t(name, fn, *args):
        jf = jax.jit(fn)
        ms = _timeit(jf, *args, iters=20) * 1e3
        print(f"TILE={TILE} J: a3f={ps.a3f_nblocks} ne={ps.ne_nblocks} "
              f"b3h={ps.b3h_nblocks} | {name:4s} {ms:8.3f} ms", flush=True)
        return jf(*args)

    t("a3f", functools.partial(kernels.a3_fused_pallas, tile=TILE,
                               nblocks=ps.a3f_nblocks, K=ps.KD),
      src, pd.a3f_lidx, pd.a3f_lev, pd.a3f_wb, pd.nlev_nod_row, lo_pad)
    pm = t("b1h", functools.partial(kernels.b1h_pallas, tile=TILE,
                                    nblocks=ps.ne_nblocks),
           pm_in, adf_h_pad, pd.starts_col, pd.ends_col, pd.nlev_edge_row,
           pd.ne_wb)
    t("b3h", functools.partial(kernels.b3h_pallas, tile=TILE,
                               nblocks=ps.b3h_nblocks),
      pm, adf_h_pad, pd.b3h_lidx, pd.b3h_wb, pd.nlev_edge_row)
    t("ch", functools.partial(kernels.ch_pallas, n_nodes_pad=Np, tile=TILE,
                              nblocks=ps.ne_nblocks),
      adf_h_pad, pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb)

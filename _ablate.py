import functools
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_f2t")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fesom2_accelerate_tpu.mesh import generate_planar_mesh, random_fields
from fesom2_accelerate_tpu.mesh.ordering import reorder_mesh, bandwidth
from fesom2_accelerate_tpu.runtime.tracing import _timeit
from fesom2_accelerate_tpu.ops.pallas import step as pstep
from fesom2_accelerate_tpu.ops.pallas import kernels as KK

mesh = generate_planar_mesh(preset="core2")
import time
t0=time.perf_counter()
rmesh, perm = reorder_mesh(mesh)
print("rcm took", round(time.perf_counter()-t0,1), "s; bw", bandwidth(mesh), "->", bandwidth(rmesh))
pd, ps = pstep.build_pallas_data(mesh)
pd2, ps2 = pstep.build_pallas_data(rmesh)
print("J row-major:", ps.a2_nblocks, ps.a3_nblocks, ps.ne_nblocks, ps.b3h_nblocks, ps.a3f_nblocks)
print("J rcm      :", ps2.a2_nblocks, ps2.a3_nblocks, ps2.ne_nblocks, ps2.b3h_nblocks, ps2.a3f_nblocks)

# ablation: b1h with dots removed (DMA + VPU only)
def _b1h_nodot(wb_ref, pm_ref, *refs, Lp, TN, J):
    adf = KK._concat(refs[:J])
    s_ids = KK._concat_col(refs[J:2*J])
    e_ids = KK._concat_col(refs[2*J:3*J])
    nw = KK._concat(refs[3*J:4*J])
    out_ref = refs[4*J]
    W = adf.shape[1]
    acc = jnp.zeros((2*Lp, TN), jnp.float32)
    # touch everything without MXU: fold window into TN-wide strips by add
    x = jnp.where(KK._row_iota((Lp, W)) < nw, adf, 0.0)
    x2 = jnp.concatenate([jnp.maximum(x,0.), jnp.maximum(-x,0.)], axis=0)
    sc = (s_ids + e_ids).astype(jnp.float32)  # touch ids
    Wr = (W // TN) * TN
    for c0 in range(0, Wr, TN):
        acc = acc + x2[:, c0:c0+TN] + sc[c0:c0+TN, :1].T
    out_ref[:] = pm_ref[:] + acc

def b1h_nodot(pm_stacked, adf_h_pad, starts_col, ends_col, nlev_edge_row, wb, *, tile, nblocks):
    Lp2, Np = pm_stacked.shape
    Lp = Lp2 // 2; TN = tile; T = Np // TN; J = nblocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T,),
        in_specs=[pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)),
                  *KK._win_specs(Lp, J), *KK._win_specs_col(J, n=2),
                  *KK._win_specs(1, J)],
        out_specs=pl.BlockSpec((Lp2, TN), lambda i, wb: (0, i)))
    return pl.pallas_call(functools.partial(_b1h_nodot, Lp=Lp, TN=TN, J=J),
        grid_spec=grid_spec, compiler_params=KK._COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((Lp2, Np), jnp.float32),
    )(wb, pm_stacked, *([adf_h_pad]*J), *([starts_col]*J), *([ends_col]*J), *([nlev_edge_row]*J))

fields = random_fields(mesh, seed=0, dtype=np.float32)
md = pd.md
Lp, Np, Edp = ps.Lp, ps.Np, ps.Edp
adf_h = jnp.pad(jnp.asarray(fields["fct_adf_h"], jnp.float32), ((0,0),(0,Edp-mesh.n_edges)))
adf_h_pad = pstep._rowpad(adf_h, Lp)
pm_in = jnp.zeros((2*Lp, Np), jnp.float32)
jf = jax.jit(functools.partial(b1h_nodot, tile=pstep.TILE, nblocks=ps.ne_nblocks))
ms = _timeit(jf, pm_in, adf_h_pad, pd.starts_col, pd.ends_col, pd.nlev_edge_row, pd.ne_wb, iters=20)*1e3
print("b1h NODOT:", round(ms,3), "ms  (full b1h ~5.4)")

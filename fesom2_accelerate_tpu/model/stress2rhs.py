"""Sea-ice EVP stress divergence solver (the reference's second workload).

The reference carries ``stress2rhs`` CPU-only as future porting scope
(src/reference.cpp:440-480, docs/refactoring.md:404-462); here it is a
first-class jitted op using the same transposed node->element incidence as
stage a3, so the element->node scatter is a deterministic gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fesom2_accelerate_tpu.mesh.topology import Mesh
from fesom2_accelerate_tpu.ops import stages
from fesom2_accelerate_tpu.ops.meshdata import build_mesh_data


class Stress2RhsSolver:
    def __init__(self, mesh: Mesh, dtype=jnp.float32):
        self.mesh = mesh
        self.dtype = dtype
        self.md = build_mesh_data(mesh, dtype=dtype)
        # md as argument, not closure (HLO-constant-inlining footgun)
        self._fn = jax.jit(stages.stress2rhs)

    def __call__(self, elem_area, ice_strength, sigma11, sigma12, sigma22,
                 gradient_sca, metric_factor, inv_areamass, rhs_a, rhs_m):
        args = [
            jnp.asarray(a, dtype=self.dtype)
            for a in (elem_area, ice_strength, sigma11, sigma12, sigma22,
                      gradient_sca, metric_factor, inv_areamass, rhs_a, rhs_m)
        ]
        return self._fn(self.md, *args)

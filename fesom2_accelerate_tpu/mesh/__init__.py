from fesom2_accelerate_tpu.mesh.topology import Mesh, build_mesh_from_elements
from fesom2_accelerate_tpu.mesh.generate import (
    generate_planar_mesh,
    random_fields,
)

__all__ = [
    "Mesh",
    "build_mesh_from_elements",
    "generate_planar_mesh",
    "random_fields",
]

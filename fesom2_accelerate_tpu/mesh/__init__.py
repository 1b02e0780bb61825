from fesom2_accelerate_tpu.mesh.topology import Mesh, build_mesh_from_elements
from fesom2_accelerate_tpu.mesh.fesom_io import (
    read_fesom_mesh,
    write_fesom_mesh,
)
from fesom2_accelerate_tpu.mesh.generate import (
    generate_cylinder_mesh,
    generate_planar_mesh,
    random_fields,
)

__all__ = [
    "Mesh",
    "build_mesh_from_elements",
    "generate_cylinder_mesh",
    "generate_planar_mesh",
    "random_fields",
    "read_fesom_mesh",
    "write_fesom_mesh",
]

from fesom2_accelerate_tpu.parallel import distributed
from fesom2_accelerate_tpu.parallel.partition import (
    PartitionedMesh,
    partition_mesh,
)
from fesom2_accelerate_tpu.parallel.step_sharded import ShardedFctAleSolver

__all__ = [
    "PartitionedMesh",
    "partition_mesh",
    "ShardedFctAleSolver",
    "distributed",
]

from fesom2_accelerate_tpu.model.fct_ale import FctAleSolver
from fesom2_accelerate_tpu.model.stress2rhs import Stress2RhsSolver

__all__ = ["FctAleSolver", "Stress2RhsSolver"]

from g2o_tpu.core.solvers.dense import DenseSolver
from g2o_tpu.core.solvers.pcg import PCGSolver

__all__ = ["DenseSolver", "PCGSolver"]

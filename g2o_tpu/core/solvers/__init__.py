from g2o_tpu.core.solvers.dense import DenseSolver
from g2o_tpu.core.solvers.pcg import PCGSolver
from g2o_tpu.core.solvers.schur import SchurSolver

__all__ = ["DenseSolver", "PCGSolver", "SchurSolver"]

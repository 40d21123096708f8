from g2o_tpu.core.solvers.dense import DenseSolver
from g2o_tpu.core.solvers.pcg import PCGSolver
from g2o_tpu.core.solvers.schur import SchurSolver

__all__ = ["DenseSolver", "PCGSolver", "SchurSolver"]


def __getattr__(name):  # lazy: keep package import light
    if name == "SupernodalCholeskySolver":
        from g2o_tpu.core.solvers.supernodal import SupernodalCholeskySolver
        return SupernodalCholeskySolver
    if name == "SparseCholeskySolver":
        from g2o_tpu.core.solvers.sparse_chol import SparseCholeskySolver
        return SparseCholeskySolver
    if name == "HostCholSolver":
        from g2o_tpu.core.solvers.host_chol import HostCholSolver
        return HostCholSolver
    raise AttributeError(name)

"""Failure-diagnostics dump (reference ``writeDebug``,
``g2o/core/solver.h:128-131``): a step that fails must dump the linearized
system to an npz when ``optimizer.write_debug`` is set."""

import glob

import numpy as np

from g2o_tpu.core.graph import Graph
from g2o_tpu.core.optimizer import LevenbergMarquardt, SparseOptimizer
from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2


def test_failed_lm_step_dumps_system(tmp_path):
    # an exactly-converged problem: chi2 == 0, so every LM trial has
    # rho <= 0 and the step fails after max_trials
    g = Graph()
    g.add_vertex(0, VertexSE2, np.zeros(3), fixed=True)
    g.add_vertex(1, VertexSE2, np.array([1.0, 0.0, 0.0]))
    g.add_edge(EdgeSE2, [0, 1], np.array([1.0, 0.0, 0.0]), np.eye(3))
    p = g.compile()
    opt = SparseOptimizer(
        p, algorithm=LevenbergMarquardt(max_trials_after_failure=2),
        solver=DenseSolver())
    opt.write_debug = str(tmp_path)
    done = opt.optimize(3)
    assert done < 3  # the failed step terminated the loop

    dumps = glob.glob(str(tmp_path / "g2o_tpu_debug_it*.npz"))
    assert len(dumps) == 1
    z = np.load(dumps[0], allow_pickle=False)
    assert float(z["lambda"]) > 0
    assert "b" in z and np.all(np.isfinite(z["b"]))
    hkeys = [k for k in z.files if k.startswith("H_diag_")]
    assert hkeys, f"no Hessian diag blocks in dump: {z.files}"
    for k in hkeys:
        assert z[k].ndim == 3  # (N, d, d) blocks
    assert "reason" in z.files


def test_no_dump_on_success(tmp_path):
    g = Graph()
    g.add_vertex(0, VertexSE2, np.zeros(3), fixed=True)
    g.add_vertex(1, VertexSE2, np.array([0.9, 0.1, 0.05]))
    g.add_edge(EdgeSE2, [0, 1], np.array([1.0, 0.0, 0.0]), np.eye(3))
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    opt.write_debug = str(tmp_path)
    opt.optimize(5)
    assert opt.chi2() < 1e-10
    # successful iterations (and the final converged rejection, if any)
    # happen, but only FAILED steps dump — at most one file, at the end
    dumps = glob.glob(str(tmp_path / "*.npz"))
    assert len(dumps) <= 1

"""Host native sparse-Cholesky solver (``native/hostchol.cpp`` +
``core/solvers/host_chol.py``): exact-vs-dense steps on pose graphs,
mixed-type graphs, ternary (calib) hyper-edges, and a full LM run."""

import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.core.graph import Graph
from g2o_tpu.core.optimizer import (GaussNewton, LevenbergMarquardt,
                                    SparseOptimizer)
from g2o_tpu.core.solvers import DenseSolver, HostCholSolver
from g2o_tpu.ops import lie
from g2o_tpu.sim.generators import create_sphere
from g2o_tpu.types.sclam2d import EdgeSE2SensorCalib
from g2o_tpu.types.slam2d import (EdgeSE2, EdgeSE2PointXY, VertexPointXY,
                                  VertexSE2)

rng = np.random.default_rng(11)


def _step_matches_dense(p, lam=1e-3, tol=1e-9):
    lin = p.linearize_jit(p.data, p.estimates)
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, lam))
    dx_h = np.asarray(HostCholSolver().setup(p).solve(p.data, lin, lam))
    denom = max(np.linalg.norm(dx_d), 1e-30)
    assert np.linalg.norm(dx_h - dx_d) / denom < tol


def test_sphere_step_matches_dense():
    g = create_sphere(nodes_per_level=10, laps=4, radius=10.0, seed=7)
    _step_matches_dense(g.compile())


def test_mixed_types_and_fixed():
    g = Graph()
    for i in range(12):
        th = 0.5 * i
        g.add_vertex(i, VertexSE2,
                     np.array([np.cos(th), np.sin(th), th])
                     + rng.normal(scale=0.05, size=3), fixed=(i == 0))
    for j in range(8):
        g.add_vertex(100 + j, VertexPointXY, rng.normal(size=2) * 3)
    info3, info2 = np.eye(3) * 50, np.eye(2) * 20
    for i in range(11):
        g.add_edge(EdgeSE2, [i, i + 1],
                   np.array([1.0, 0.05, 0.5]), info3)
    g.add_edge(EdgeSE2, [11, 0], np.array([1.0, 0.0, 0.5]), info3)
    for j in range(8):
        for i in (j, (j + 3) % 12):
            g.add_edge(EdgeSE2PointXY, [i, 100 + j],
                       rng.normal(size=2), info2)
    _step_matches_dense(g.compile())


def test_ternary_calib_edges():
    """Hyper-edges: the pattern must include all vertex pairs (the
    reference builds its pattern from whatever H blocks exist,
    block_solver.hpp:142-214)."""
    g = Graph()
    poses = [np.array([0.0, 0, 0])]
    for i in range(10):
        poses.append(poses[-1] + np.array([1.0, 0.1 * rng.normal(), 0.15]))
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x, fixed=True)
    g.add_vertex(100, VertexSE2, [0.05, -0.02, 0.1])   # sensor offset
    offset_gt = np.array([0.3, 0.1, 0.2])
    info = np.eye(3) * 100
    for i in range(len(poses) - 1):
        a = lie.se2_compose(jnp.asarray(poses[i]), jnp.asarray(offset_gt))
        b = lie.se2_compose(jnp.asarray(poses[i + 1]), jnp.asarray(offset_gt))
        meas = np.asarray(lie.se2_compose(lie.se2_inverse(a), b))
        g.add_edge(EdgeSE2SensorCalib, [i, i + 1, 100], meas, info)
    p = g.compile()
    _step_matches_dense(p)
    # full optimization recovers the offset through the host direct path
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=HostCholSolver())
    opt.optimize(50)
    np.testing.assert_allclose(p.get_estimate(100), offset_gt, atol=1e-4)


def test_full_gn_run_matches_dense_trajectory():
    g = create_sphere(nodes_per_level=8, laps=3, radius=10.0, seed=3)
    p1 = g.compile()
    o1 = SparseOptimizer(p1, algorithm=GaussNewton(), solver=DenseSolver())
    o1.optimize(5)
    p2 = g.compile()
    o2 = SparseOptimizer(p2, algorithm=GaussNewton(),
                         solver=HostCholSolver())
    o2.optimize(5)
    np.testing.assert_allclose(o2.chi2(), o1.chi2(), rtol=1e-9, atol=1e-9)


def test_non_pd_returns_nan_step():
    """A genuinely indefinite system must yield a NaN step (the driver
    then rejects/escalates — reference csparse failure branch)."""
    g = Graph()
    g.add_vertex(0, VertexSE2, np.zeros(3), fixed=True)
    g.add_vertex(1, VertexSE2, np.array([1.0, 0, 0]))
    # negative information: H is negative definite on vertex 1
    g.add_edge(EdgeSE2, [0, 1], np.array([1.0, 0, 0]), -np.eye(3))
    p = g.compile()
    s = HostCholSolver().setup(p)
    lin = p.linearize_jit(p.data, p.estimates)
    dx = np.asarray(s.solve(p.data, lin, 0.0))
    assert np.isnan(dx).any()

"""End-to-end optimization tests — mirrors the reference pattern of
``unit_test/slam3d/optimization_slam3d.cpp:40-126`` (tiny graph, fixed
gauge, optimize, assert chi2 -> 0 and exact recovery)."""

import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.core.graph import Graph
from g2o_tpu.core.optimizer import (
    Dogleg,
    GaussNewton,
    LevenbergMarquardt,
    SparseOptimizer,
)
from g2o_tpu.core.solvers import DenseSolver, PCGSolver
from g2o_tpu.ops import lie
from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2, EdgeSE2PointXY, VertexPointXY
from g2o_tpu.types.slam3d import EdgeSE3, VertexSE3

rng = np.random.default_rng(3)


def build_se2_chain(n=8, noise=0.05):
    """Poses around a circle with odometry + one loop closure."""
    g = Graph()
    gt = []
    for i in range(n):
        th = 2 * np.pi * i / n
        gt.append(np.array([np.cos(th), np.sin(th), th + np.pi / 2]))
    for i in range(n):
        init = gt[i] + (0 if i == 0 else rng.normal(scale=noise, size=3))
        g.add_vertex(i, VertexSE2, init, fixed=(i == 0))
    info = np.diag([100.0, 100.0, 400.0])
    for i in range(n):
        j = (i + 1) % n
        a = jnp.asarray(gt[i])
        b = jnp.asarray(gt[j])
        meas = np.asarray(lie.se2_compose(lie.se2_inverse(a), b))
        g.add_edge(EdgeSE2, [i, j], meas, info)
    return g, gt


@pytest.mark.parametrize("algo_cls", [GaussNewton, LevenbergMarquardt, Dogleg])
def test_se2_chain_converges(algo_cls):
    g, gt = build_se2_chain()
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=algo_cls(), solver=DenseSolver())
    chi0 = opt.chi2()
    opt.optimize(20)
    chi1 = opt.chi2()
    assert chi1 < 1e-8
    assert chi1 < chi0
    # exact recovery up to the fixed gauge
    for i, gti in enumerate(gt):
        est = p.get_estimate(i)
        np.testing.assert_allclose(est[:2], gti[:2], atol=1e-5)
        dth = float(lie.normalize_angle(jnp.asarray(est[2] - gti[2])))
        assert abs(dth) < 1e-5


def test_se2_chain_pcg():
    g, _ = build_se2_chain()
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=PCGSolver(max_iter=200, tol=1e-10))
    opt.optimize(20)
    assert opt.chi2() < 1e-8


def test_se2_landmarks():
    g = Graph()
    poses = [np.array([0.0, 0, 0]), np.array([1.0, 0, 0.3]),
             np.array([2.0, 0.5, 0.6])]
    lms = [np.array([1.0, 2.0]), np.array([2.5, 1.5])]
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x + (0 if i == 0 else rng.normal(scale=0.1, size=3)),
                     fixed=(i == 0))
    for k, l in enumerate(lms):
        g.add_vertex(10 + k, VertexPointXY, l + rng.normal(scale=0.2, size=2))
    info_p = np.diag([100.0, 100.0, 100.0])
    info_l = np.diag([50.0, 50.0])
    for i in range(len(poses) - 1):
        a, b = jnp.asarray(poses[i]), jnp.asarray(poses[i + 1])
        meas = np.asarray(lie.se2_compose(lie.se2_inverse(a), b))
        g.add_edge(EdgeSE2, [i, i + 1], meas, info_p)
    for i, x in enumerate(poses):
        for k, l in enumerate(lms):
            meas = np.asarray(lie.se2_act(lie.se2_inverse(jnp.asarray(x)),
                                          jnp.asarray(l)))
            g.add_edge(EdgeSE2PointXY, [i, 10 + k], meas, info_l)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(), solver=DenseSolver())
    opt.optimize(25)
    assert opt.chi2() < 1e-10
    for k, l in enumerate(lms):
        np.testing.assert_allclose(p.get_estimate(10 + k), l, atol=1e-5)


def se3_from_rt(t, axis, angle):
    q = np.asarray(lie.so3_exp(jnp.asarray(np.asarray(axis) * angle)))
    return np.concatenate([t, q])


def test_se3_two_vertices_exact():
    """Direct analogue of the reference optimization_slam3d test."""
    g = Graph()
    x0 = lie.se3_identity()
    x1_gt = se3_from_rt(np.array([1.0, 0.5, 0.2]), [0, 0, 1.0], 0.4)
    g.add_vertex(0, VertexSE3, np.asarray(x0), fixed=True)
    # start from a perturbed estimate
    x1_init = np.asarray(
        lie.se3_oplus(jnp.asarray(x1_gt),
                      jnp.asarray([0.2, -0.1, 0.1, 0.05, -0.02, 0.08]))
    )
    g.add_vertex(1, VertexSE3, x1_init)
    meas = x1_gt  # measurement = X0^-1 X1 = X1 since X0 = I
    g.add_edge(EdgeSE3, [0, 1], meas, np.eye(6))
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(), solver=DenseSolver())
    opt.optimize(100)
    assert opt.chi2() < 1e-12
    est = p.get_estimate(1)
    np.testing.assert_allclose(est[:3], x1_gt[:3], atol=1e-6)
    qa = lie.quat_positive(jnp.asarray(est[3:]))
    qb = lie.quat_positive(jnp.asarray(x1_gt[3:]))
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb), atol=1e-6)


def test_se3_loop_with_huber():
    """A noisy SE3 loop with a robust kernel still converges."""
    n = 6
    g = Graph()
    gt = []
    for i in range(n):
        th = 2 * np.pi * i / n
        gt.append(se3_from_rt(np.array([np.cos(th), np.sin(th), 0.1 * i]),
                              [0, 0, 1.0], th))
    for i in range(n):
        init = gt[i] if i == 0 else np.asarray(
            lie.se3_oplus(jnp.asarray(gt[i]),
                          jnp.asarray(rng.normal(scale=0.05, size=6)))
        )
        g.add_vertex(i, VertexSE3, init, fixed=(i == 0))
    for i in range(n):
        j = (i + 1) % n
        meas = np.asarray(
            lie.se3_compose(lie.se3_inverse(jnp.asarray(gt[i])),
                            jnp.asarray(gt[j]))
        )
        g.add_edge(EdgeSE3, [i, j], meas, np.eye(6) * 100.0,
                   kernel="Huber", delta=5.0)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(), solver=DenseSolver())
    opt.optimize(30)
    assert opt.chi2() < 1e-8


def test_inactive_edges_ignored():
    g, _ = build_se2_chain()
    # add a wildly wrong edge, inactive — must not affect the solution
    bogus = np.array([5.0, 5.0, 1.0])
    g.add_edge(EdgeSE2, [0, 3], bogus, np.eye(3) * 1000.0, active=False)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(), solver=DenseSolver())
    opt.optimize(20)
    assert opt.chi2() < 1e-8


def test_level_filter():
    g, _ = build_se2_chain()
    g.add_edge(EdgeSE2, [0, 3], np.array([9.0, 9.0, 2.0]), np.eye(3), level=1)
    p = g.compile(level=0)
    n_edges = sum(int(b.vidx.shape[0]) for b in p.data.edges.values())
    assert n_edges == 8

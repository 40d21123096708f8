"""Incremental/online optimization — the ``g2o -inc`` analogue."""

import numpy as np
import jax.numpy as jnp
import pytest

from g2o_tpu.core.incremental import IncrementalOptimizer
from g2o_tpu.ops import lie
from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

rng = np.random.default_rng(33)


def _odometry(a, b):
    return np.asarray(lie.se2_compose(lie.se2_inverse(jnp.asarray(a)),
                                      jnp.asarray(b)))


def test_incremental_no_recompile_within_capacity():
    inc = IncrementalOptimizer(edge_chunk=64, vertex_chunk=64)
    gt = [np.array([0.0, 0, 0])]
    inc.add_vertex(0, VertexSE2, gt[0], fixed=True)
    info = np.diag([100.0, 100.0, 400.0])
    # seed with the first edge so the EDGE_SE2 batch exists, then compile
    gt.append(np.array([np.cos(0.2) * 3, np.sin(0.2) * 3, 0.2]))
    inc.add_vertex(1, VertexSE2, gt[1] + rng.normal(scale=0.05, size=3))
    inc.add_edge(EdgeSE2, [0, 1], _odometry(gt[0], gt[1]), info)
    inc.optimize(1)
    base_recompiles = inc.recompiles
    for i in range(2, 30):
        th = 0.2 * i
        gt.append(np.array([np.cos(th) * 3, np.sin(th) * 3, th]))
        noisy = gt[i] + rng.normal(scale=0.05, size=3)
        inc.add_vertex(i, VertexSE2, noisy)
        inc.add_edge(EdgeSE2, [i - 1, i], _odometry(gt[i - 1], gt[i]), info)
        if i % 10 == 0:
            inc.optimize(3)
    inc.optimize(10)
    assert inc.recompiles == base_recompiles  # all adds were in-place
    assert inc.chi2() < 1e-6
    for i in (10, 29):
        est = inc.get_estimate(i)
        np.testing.assert_allclose(est[:2], gt[i][:2], atol=1e-3)


def test_incremental_matches_batch():
    # init_from_edges off: this test compares the chi2 of the RAW estimates
    # against an identical batch graph
    inc = IncrementalOptimizer(edge_chunk=32, vertex_chunk=32,
                               init_from_edges=False)
    from g2o_tpu.core.graph import Graph
    from g2o_tpu.core.optimizer import SparseOptimizer
    from g2o_tpu.core.solvers import PCGSolver

    g = Graph()
    info = np.diag([10.0, 10.0, 40.0])
    poses = [np.array([0.0, 0, 0]), np.array([1.0, 0.1, 0.2]),
             np.array([2.0, 0.3, 0.4])]
    inc.add_vertex(0, VertexSE2, poses[0], fixed=True)
    g.add_vertex(0, VertexSE2, poses[0], fixed=True)
    inc.optimize(0)  # force compile before the remaining adds
    for i in (1, 2):
        inc.add_vertex(i, VertexSE2, poses[i])
        g.add_vertex(i, VertexSE2, poses[i])
        m = _odometry(poses[i - 1], poses[i]) + 0.01 * i
        inc.add_edge(EdgeSE2, [i - 1, i], m, info)
        g.add_edge(EdgeSE2, [i - 1, i], m, info)
    chi_inc = inc.chi2()
    p = g.compile()
    opt = SparseOptimizer(p, solver=PCGSolver())
    assert chi_inc == pytest.approx(opt.chi2(), rel=1e-10)


def test_incremental_init_from_edges():
    """A vertex first seen through an edge is initialised by the edge's
    initialEstimate rule (reference ``apps/g2o_cli/g2o.cpp:457-492``)."""
    inc = IncrementalOptimizer(edge_chunk=16, vertex_chunk=8)
    info = np.eye(3)
    inc.add_vertex(0, VertexSE2, [0.0, 0, 0], fixed=True)
    inc.optimize(0)  # compile, so the next adds take the in-place path
    # bogus raw estimate; the odometry edge should overwrite it
    inc.add_vertex(1, VertexSE2, [99.0, -99.0, 1.0])
    inc.add_edge(EdgeSE2, [0, 1], [1.0, 0.5, 0.25], info)
    est = np.asarray(inc.get_estimate(1))
    np.testing.assert_allclose(est, [1.0, 0.5, 0.25], atol=1e-12)
    # chi2 of a perfectly-propagated chain is zero before any optimization
    assert inc.chi2() < 1e-12
    # pre-compile path too: fresh optimizer, adds before the first compile
    inc2 = IncrementalOptimizer()
    inc2.add_vertex(0, VertexSE2, [0.0, 0, 0], fixed=True)
    inc2.add_vertex(1, VertexSE2, [50.0, 50.0, 3.0])
    inc2.add_edge(EdgeSE2, [0, 1], [2.0, 0.0, -0.5], info)
    np.testing.assert_allclose(np.asarray(inc2.get_estimate(1)),
                               [2.0, 0.0, -0.5], atol=1e-12)


def test_incremental_capacity_overflow_recompiles():
    inc = IncrementalOptimizer(edge_chunk=8, vertex_chunk=4)
    info = np.eye(3)
    inc.add_vertex(0, VertexSE2, [0, 0, 0], fixed=True)
    inc.optimize(0)
    r0 = inc.recompiles
    for i in range(1, 10):
        inc.add_vertex(i, VertexSE2, [float(i), 0, 0])
        inc.add_edge(EdgeSE2, [i - 1, i], [1.0, 0, 0], info)
    assert inc.chi2() < 1e-10
    assert inc.recompiles > r0  # overflowed the 4-vertex slack

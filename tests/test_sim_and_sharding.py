"""Simulator generators + multi-device SPMD step on the 8-device CPU mesh
(the distributed-test pattern the reference lacks — SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from g2o_tpu.core.optimizer import LevenbergMarquardt, SparseOptimizer
from g2o_tpu.core.solvers import DenseSolver, PCGSolver
from g2o_tpu.parallel import (
    make_fused_step,
    make_mesh,
    replicate_estimates,
    shard_problem_data,
)
from g2o_tpu.sim.generators import create_manhattan, create_sphere


def test_sphere_generator_structure():
    g = create_sphere(nodes_per_level=10, laps=4, radius=10.0, seed=1)
    assert g.num_vertices == 40
    # odometry (39) + loop closures (3 laps * 10 nodes * 3 - edge cases)
    assert g.num_edges > 39 + 60
    assert g.vertex(0).fixed


def test_sphere_optimizes():
    g = create_sphere(nodes_per_level=10, laps=4, radius=10.0, seed=1)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    chi0 = opt.chi2()
    opt.optimize(10)
    assert opt.chi2() < 0.1 * chi0


def test_manhattan_generator():
    g = create_manhattan(n_poses=150, seed=2)
    assert g.num_vertices == 150
    assert g.num_edges >= 149
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    chi0 = opt.chi2()
    opt.optimize(10)
    assert opt.chi2() < chi0


def test_fused_step_matches_host_loop():
    g = create_sphere(nodes_per_level=8, laps=3, radius=10.0, seed=3)
    p = g.compile()
    solver = DenseSolver().setup(p)
    step = make_fused_step(p, solver, donate=False)
    new_est, chi2_r, chi2 = step(p.data, p.estimates, 1e-3)
    # reference computation via the separate jitted pieces
    lin = p.linearize_jit(p.data, p.estimates)
    dx = solver.solve(p.data, lin, 1e-3)
    expect = p.apply_jit(p.data, p.estimates, dx)
    assert float(chi2_r) == pytest.approx(float(lin.chi2_robust))
    for t in expect:
        np.testing.assert_allclose(np.asarray(new_est[t]),
                                   np.asarray(expect[t]), atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    n_dev = 8
    g = create_sphere(nodes_per_level=8, laps=3, radius=10.0, seed=4)
    p = g.compile(pad_edges_to_multiple=n_dev)
    for b in p.data.edges.values():
        assert b.vidx.shape[0] % n_dev == 0

    solver = PCGSolver(max_iter=100, tol=1e-10).setup(p)
    step = make_fused_step(p, solver, donate=False)

    # single-device result
    est1, chi1, _ = step(p.data, p.estimates, 1e-3)

    # sharded result over the 8-device CPU mesh
    mesh = make_mesh(n_dev)
    data_sh = shard_problem_data(p.data, mesh)
    est_sh = replicate_estimates(p.estimates, mesh)
    est2, chi2, _ = step(data_sh, est_sh, 1e-3)

    assert float(chi1) == pytest.approx(float(chi2), rel=1e-10)
    for t in est1:
        np.testing.assert_allclose(np.asarray(est1[t]), np.asarray(est2[t]),
                                   atol=1e-8)

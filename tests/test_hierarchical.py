"""Hierarchical/multilevel optimization."""

import numpy as np
import pytest

from g2o_tpu.apps.hierarchical import optimize_hierarchical
from g2o_tpu.core.optimizer import SparseOptimizer
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.sim.generators import create_manhattan, create_sphere


def test_hierarchical_manhattan():
    g = create_manhattan(n_poses=300, seed=17)
    p0 = g.compile()
    chi0 = float(p0.chi2_jit(p0.data, p0.estimates)[0])
    res = optimize_hierarchical(g, star_radius=5, star_iterations=8,
                                skeleton_iterations=20, refine_iterations=8)
    assert res["n_stars"] > 3
    assert res["skeleton_vertices"] < 300
    # compare with flat optimization from the same start
    g2 = create_manhattan(n_poses=300, seed=17)
    p2 = g2.compile()
    opt = SparseOptimizer(p2, solver=PCGSolver(max_iter=100, tol=1e-8))
    opt.optimize(30)
    flat = opt.chi2()
    assert res["final_chi2"] < chi0 * 0.5
    assert res["final_chi2"] < flat * 1.5 + 1e-6  # competitive with flat


def test_hierarchical_sphere_small():
    g = create_sphere(nodes_per_level=10, laps=3, radius=10, seed=5)
    p0 = g.compile()
    chi0 = float(p0.chi2_jit(p0.data, p0.estimates)[0])
    res = optimize_hierarchical(g, star_radius=4, star_iterations=8,
                                skeleton_iterations=15, refine_iterations=8)
    assert res["final_chi2"] < chi0


def test_hierarchical_rejects_mixed_types():
    from g2o_tpu.sim.generators import create_ba_scene

    g, _ = create_ba_scene(n_cameras=3, n_points=10, seed=2)
    with pytest.raises(NotImplementedError):
        optimize_hierarchical(g)


def test_hierarchical_three_levels():
    g = create_manhattan(n_poses=400, seed=23)
    p0 = g.compile()
    chi0 = float(p0.chi2_jit(p0.data, p0.estimates)[0])
    res = optimize_hierarchical(g, star_radius=2, star_iterations=6,
                                skeleton_iterations=12, refine_iterations=6,
                                max_levels=3, recurse_threshold=40)
    assert res["levels"] == 3
    assert res["final_chi2"] < chi0 * 0.5


def test_hierarchical_landmarks_2d():
    """Landmark-bearing SE2+XY graph (EdgeLabeler analogue): condensed
    centre->landmark observation edges + rigid point re-anchoring must land
    within 1% of the flat optimum (``edge_labeler.h:45``)."""
    from g2o_tpu.sim.generators import create_simulator2d

    g = create_simulator2d(n_poses=250, n_landmarks=50,
                           sensors=("odometry", "pose", "pointxy"), seed=3)
    p0 = g.compile()
    chi0 = float(p0.chi2_jit(p0.data, p0.estimates)[0])
    res = optimize_hierarchical(g, star_radius=5, star_iterations=8,
                                skeleton_iterations=20, refine_iterations=10)
    g2 = create_simulator2d(n_poses=250, n_landmarks=50,
                            sensors=("odometry", "pose", "pointxy"), seed=3)
    p2 = g2.compile()
    opt = SparseOptimizer(p2, solver=PCGSolver(max_iter=100, tol=1e-8))
    opt.optimize(30)
    flat = opt.chi2()
    assert res["final_chi2"] < chi0
    assert res["final_chi2"] <= flat * 1.01 + 1e-6
    assert res["skeleton_vertices"] < 300


def test_hierarchical_landmarks_3d_offset_param():
    """SE3+TRACKXYZ with a sensor-offset parameter: exercises the
    param-bearing condensed edge path (identity offset)."""
    from g2o_tpu.sim.generators import create_simulator3d

    g = create_simulator3d(n_poses=60, n_landmarks=40,
                           sensors=("odometry", "trackxyz"), seed=7)
    p0 = g.compile()
    chi0 = float(p0.chi2_jit(p0.data, p0.estimates)[0])
    res = optimize_hierarchical(g, star_radius=4, star_iterations=8,
                                skeleton_iterations=15, refine_iterations=8)
    g2 = create_simulator3d(n_poses=60, n_landmarks=40,
                            sensors=("odometry", "trackxyz"), seed=7)
    p2 = g2.compile()
    opt = SparseOptimizer(p2, solver=PCGSolver(max_iter=100, tol=1e-8))
    opt.optimize(30)
    flat = opt.chi2()
    assert res["final_chi2"] < chi0
    assert res["final_chi2"] <= flat * 1.01 + 1e-6

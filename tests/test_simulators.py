"""Sensor-rich 2D/3D simulators end-to-end."""

import numpy as np
import pytest

from g2o_tpu.core.optimizer import LevenbergMarquardt, SparseOptimizer
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.sim.generators import create_simulator2d, create_simulator3d


def test_simulator2d_all_sensors():
    g = create_simulator2d(n_poses=60, n_landmarks=25, seed=3)
    names = {e.etype.name for e in g.edges()}
    assert {"EDGE_SE2", "EDGE_SE2_XY", "EDGE_BEARING_SE2_XY"} <= names
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=PCGSolver(max_iter=150, tol=1e-8))
    chi0 = opt.chi2()
    opt.optimize(15)
    assert opt.chi2() < chi0 * 0.5


def test_simulator2d_odometry_only():
    g = create_simulator2d(n_poses=40, n_landmarks=10,
                           sensors=("odometry",), seed=4)
    names = {e.etype.name for e in g.edges()}
    assert names == {"EDGE_SE2"}


def test_simulator3d():
    g = create_simulator3d(n_poses=40, n_landmarks=30, seed=5)
    names = {e.etype.name for e in g.edges()}
    assert {"EDGE_SE3:QUAT", "EDGE_SE3_TRACKXYZ"} <= names
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=PCGSolver(max_iter=150, tol=1e-8))
    chi0 = opt.chi2()
    opt.optimize(15)
    assert opt.chi2() < chi0


def test_simulator3d_g2o_roundtrip(tmp_path):
    from g2o_tpu.io import g2o_format

    g = create_simulator3d(n_poses=20, n_landmarks=15, seed=6)
    path = str(tmp_path / "sim3d.g2o")
    g2o_format.save(g, path)
    g2 = g2o_format.load(path)
    assert g2.num_vertices == g.num_vertices
    assert g2.num_edges == g.num_edges
    p1, p2 = g.compile(), g2.compile()
    c1 = float(p1.chi2_jit(p1.data, p1.estimates)[0])
    c2 = float(p2.chi2_jit(p2.data, p2.estimates)[0])
    assert c1 == pytest.approx(c2, rel=1e-9)

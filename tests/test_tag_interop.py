"""Exact `.g2o` tag interop with the reference for the calibration/addon
types (reference registrations: ``types/sclam2d/types_sclam2d.cpp:43-45``,
``types/slam3d_addons/types_slam3d_addons.cpp:38-46``,
``types/slam2d_addons/types_slam2d_addons.cpp:47``,
``types/slam3d/types_slam3d.cpp:48``,
``types/deprecated/slam3d/types_slam3d.cpp:43-49``): reference-format lines
must load, optimize, and save back with the reference's own tags."""

import numpy as np
import pytest

import g2o_tpu
import g2o_tpu.types  # noqa: F401  (register tags)
from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.core.types import REGISTRY
from g2o_tpu.io import g2o_format
from g2o_tpu.ops import lie


def _optimize(g, iters=15):
    p = g.compile()
    opt = g2o_tpu.SparseOptimizer(
        p, algorithm=g2o_tpu.LevenbergMarquardt(), solver=DenseSolver())
    opt.optimize(iters)
    return float(opt.chi2()), p


def _roundtrip(text):
    g = g2o_format.loads(text)
    out = g2o_format.dumps(g)
    g2 = g2o_format.loads(out)
    return g, out, g2


INFO3 = "100 0 0 100 0 100"
INFO6 = " ".join("1000" if i == j else "0"
                 for i in range(6) for j in range(i, 6))


def test_sclam2d_reference_tags():
    # reference-format odometry-calibration file
    # (``types_sclam2d.cpp:43,45`` spellings)
    text = "\n".join([
        "VERTEX_ODOM_DIFFERENTIAL 0 0.98 1.02 0.45",
        "VERTEX_SE2 1 0 0 0",
        "VERTEX_SE2 2 0.5 0.01 0.02",
        "FIX 1",
        f"EDGE_SE2_ODOM_DIFFERENTIAL_CALIB 1 2 0 1.0 1.0 0.5 {INFO3}",
    ]) + "\n"
    g, out, g2 = _roundtrip(text)
    assert "VERTEX_ODOM_DIFFERENTIAL 0" in out
    assert "EDGE_SE2_ODOM_DIFFERENTIAL_CALIB 1 2 0" in out
    # invented pre-round-3 spellings remain read aliases
    alias = text.replace("VERTEX_ODOM_DIFFERENTIAL",
                         "VERTEX_ODOM_DIFF_PARAMS").replace(
        "EDGE_SE2_ODOM_DIFFERENTIAL_CALIB", "EDGE_SE2_ODOM_DIFF_CALIB")
    ga = g2o_format.loads(alias)
    # and are WRITTEN with the reference tags
    assert "VERTEX_ODOM_DIFFERENTIAL 0" in g2o_format.dumps(ga)
    chi2, _ = _optimize(g2)
    assert np.isfinite(chi2)


def test_edge_se3_calib():
    rng = np.random.default_rng(3)

    def rand_se3():
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return np.concatenate([rng.normal(size=3), q])

    x1, x2, c = rand_se3(), rand_se3(), rand_se3()
    # consistent measurement => zero residual (reference
    # ``edge_se3_calib.cpp:40-46`` error definition)
    meas = np.asarray(lie.se3_compose(
        lie.se3_compose(lie.se3_inverse(c),
                        lie.se3_compose(lie.se3_inverse(x1), x2)), c))
    et = REGISTRY.edge_for_tag("EDGE_SE3_CALIB")
    r = np.asarray(et.residual((x1, x2, c), meas, None))
    np.testing.assert_allclose(r, 0.0, atol=1e-12)

    fmt = " ".join(f"{v:.10g}" for v in meas)
    text = "\n".join([
        "VERTEX_SE3:QUAT 0 " + " ".join(f"{v:.10g}" for v in x1),
        "VERTEX_SE3:QUAT 1 " + " ".join(f"{v:.10g}" for v in x2),
        "VERTEX_SE3:QUAT 2 " + " ".join(f"{v:.10g}" for v in c),
        "FIX 0",
        "FIX 2",
        f"EDGE_SE3_CALIB 0 1 2 {fmt} {INFO6}",
    ]) + "\n"
    g, out, g2 = _roundtrip(text)
    assert "EDGE_SE3_CALIB 0 1 2" in out
    chi2, _ = _optimize(g2)
    assert chi2 < 1e-10


def test_edge_line2d_pointxy():
    theta, rho = 0.7, 2.0
    p = np.array([1.3, -0.4])
    z = float(np.cos(theta) * p[0] + np.sin(theta) * p[1] - rho)
    et = REGISTRY.edge_for_tag("EDGE_LINE2D_POINTXY")
    r = np.asarray(et.residual((np.array([theta, rho]), p),
                               np.array([z]), None))
    np.testing.assert_allclose(r, 0.0, atol=1e-14)

    text = "\n".join([
        f"VERTEX_LINE2D 0 {theta} {rho} -1 -1",
        f"VERTEX_XY 1 {p[0]} {p[1]}",
        "FIX 1",
        f"EDGE_LINE2D_POINTXY 0 1 {z + 0.05} 400",
    ]) + "\n"
    g, out, g2 = _roundtrip(text)
    assert "EDGE_LINE2D_POINTXY 0 1" in out
    chi2, _ = _optimize(g2)
    assert chi2 < 1e-10


def test_params_stereocameracalib_roundtrip():
    line = ("PARAMS_STEREOCAMERACALIB 3 0.1 0.2 0.3 0 0 0 1 "
            "500 500 320 240 0.12")
    g = g2o_format.loads(line + "\n")
    out = g2o_format.dumps(g)
    assert out.startswith("PARAMS_STEREOCAMERACALIB 3 ")
    vals = [float(x) for x in out.split()[2:]]
    np.testing.assert_allclose(
        vals, [0.1, 0.2, 0.3, 0, 0, 0, 1, 500, 500, 320, 240, 0.12])


def test_deprecated_params_aliases():
    text = "\n".join([
        "DEPRECATED_PARAMS_SE3OFFSET 0 0 0 0 0 0 0 1",
        "DEPRECATED_PARAMS_CAMERACALIB 1 0 0 0 0 0 0 1 500 500 320 240",
    ]) + "\n"
    g = g2o_format.loads(text)
    assert len(g._parameters) == 2


def test_vertex3_edge3_euler():
    rng = np.random.default_rng(7)
    poses = []
    x = np.array([0, 0, 0, 0, 0, 0, 1.0])
    for _ in range(4):
        poses.append(x)
        d = np.concatenate([rng.normal(size=3) * 0.5,
                            rng.normal(size=3) * 0.2])
        from g2o_tpu.types.slam3d_addons import et_to_qt, qt_to_et
        step = et_to_qt(d)
        x = np.asarray(lie.se3_compose(x, step))

    from g2o_tpu.types.slam3d_addons import qt_to_et

    lines = []
    for i, p in enumerate(poses):
        et = qt_to_et(p)
        lines.append("VERTEX3 %d %s" % (i, " ".join(f"{v:.12g}" for v in et)))
    lines.append("FIX 0")
    for i in range(3):
        rel = np.asarray(lie.se3_compose(lie.se3_inverse(poses[i]),
                                         poses[i + 1]))
        et = qt_to_et(rel)
        lines.append("EDGE3 %d %d %s %s" % (
            i, i + 1, " ".join(f"{v:.12g}" for v in et), INFO6))
    text = "\n".join(lines) + "\n"

    g, out, g2 = _roundtrip(text)
    assert out.startswith("VERTEX3 0 ")
    assert "EDGE3 0 1 " in out
    # measurements and info survive the Euler<->quat round trip
    e0 = g.edges()[0]
    e0b = g2.edges()[0]
    np.testing.assert_allclose(np.asarray(e0b.measurement),
                               np.asarray(e0.measurement), atol=1e-8)
    np.testing.assert_allclose(np.asarray(e0b.information),
                               np.asarray(e0.information), rtol=1e-5)
    # consistent chain => chi2 == 0 at the loaded estimates, stays 0
    chi2, _ = _optimize(g2, iters=5)
    assert chi2 < 1e-8


def test_edge3_info_transform_matches_euler_coordinates():
    """Loading an EDGE3 line converts the Euler-coordinate information
    matrix into MQT coordinates via J^T I J with
    J = d(ET)/d(QT) at the measurement (the *intended*
    ``jac_quat3_euler3``, ``edge_se3_euler.cpp:37-55``)."""
    from g2o_tpu.types.slam3d_addons import (
        _edge3_info_from_io,
        _edge3_info_to_io,
        et_to_qt,
    )

    rng = np.random.default_rng(11)
    meas7 = et_to_qt(rng.normal(size=6) * 0.5)
    a = rng.normal(size=(6, 6))
    info_euler = a @ a.T + 6 * np.eye(6)
    info_qt = _edge3_info_from_io(info_euler, meas7)
    back = _edge3_info_to_io(info_qt, meas7)
    np.testing.assert_allclose(back, info_euler, rtol=1e-4)
    # at the identity measurement rpy = 2*q_xyz to first order, so unit
    # Euler information maps to 4x on the rotational diagonal
    eye_in = _edge3_info_from_io(np.eye(6),
                                 np.array([0, 0, 0, 0, 0, 0, 1.0]))
    np.testing.assert_allclose(eye_in, np.diag([1, 1, 1, 4, 4, 4.0]),
                               atol=1e-6)

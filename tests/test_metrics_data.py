"""Trajectory metrics (ATE/RPE) + sensor-data payload round-trip."""

import numpy as np
import pytest

import g2o_tpu.types  # noqa: F401  (registers tags)
from g2o_tpu.io import g2o_format
from g2o_tpu.utils.metrics import ate, rpe, umeyama_alignment


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(50, 3))
    th = 0.7
    R_gt = np.array([[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    t_gt = np.array([1.0, -2.0, 0.5])
    dst = (R_gt @ src.T).T + t_gt
    R, t, s = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R_gt, atol=1e-10)
    np.testing.assert_allclose(t, t_gt, atol=1e-10)
    assert s == 1.0


def test_ate_aligned_zero():
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(30, 3))
    # estimate = rotated/translated copy -> ATE after alignment ~ 0
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    est = (R @ gt.T).T + [5, 5, 5]
    assert ate(est, gt) < 1e-10
    assert ate(est, gt, align=False) > 1.0


def test_ate_se2_trajectories():
    gt = np.array([[i, 0.0, 0.1] for i in range(10)])
    est = gt.copy()
    est[:, 1] += 0.1  # constant offset removed by alignment
    assert ate(est, gt) < 1e-10
    est[5, 0] += 1.0
    assert ate(est, gt) > 0.1


def test_rpe():
    gt = np.array([[i, 0.0, 0] for i in range(10)], dtype=float)
    est = gt * 1.1  # 10% drift per step
    assert rpe(est, gt) == pytest.approx(0.1, rel=1e-6)


def test_laser_data_roundtrip():
    txt = (
        "VERTEX_SE2 0 0 0 0\n"
        "ROBOTLASER1 0 -1.5 0.01 180 30 0 0.5 0.5 0.5 1 2 3\n"
        "VERTEX_SE2 1 1 0 0\n"
        "EDGE_SE2 0 1 1 0 0 1 0 0 1 0 1\n"
    )
    g = g2o_format.loads(txt)
    assert len(g.vertex_data(0)) == 1
    assert g.vertex_data(0)[0].startswith("ROBOTLASER1")
    assert g.vertex_data(1) == []
    out = g2o_format.dumps(g)
    assert "ROBOTLASER1 0 -1.5" in out
    g2 = g2o_format.loads(out)
    assert g2.vertex_data(0) == g.vertex_data(0)


def test_robot_laser_typed_roundtrip():
    from g2o_tpu.types.data import RobotLaser, parse_vertex_payloads

    line = ("ROBOTLASER1 0 -1.5708 3.14159 0.0174533 30 0.1 0 5 "
            "1.0 2.0 3.0 4.0 30.0 0 0.5 0.2 0.1 0.45 0.18 0.1 "
            "0.3 0.05 0.5 0.5 1 1234.5 myhost 1234.6")
    rl = RobotLaser.parse(line)
    assert len(rl.ranges) == 5
    assert rl.max_range == 30
    np.testing.assert_allclose(rl.laser_pose, [0.5, 0.2, 0.1])
    np.testing.assert_allclose(rl.odom_pose, [0.45, 0.18, 0.1])
    assert rl.hostname == "myhost"
    # serialize -> parse roundtrip
    rl2 = RobotLaser.parse(rl.serialize())
    np.testing.assert_allclose(rl2.ranges, rl.ranges)
    np.testing.assert_allclose(rl2.odom_pose, rl.odom_pose)
    assert rl2.timestamp == rl.timestamp
    # cartesian drops max-range beams
    pts = rl.cartesian()
    assert pts.shape == (4, 2)
    # via graph payloads
    g = g2o_format.loads("VERTEX_SE2 0 0 0 0\n" + line + "\n")
    lasers = parse_vertex_payloads(g, 0)
    assert len(lasers) == 1 and len(lasers[0].ranges) == 5

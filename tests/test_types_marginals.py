"""New type libraries end-to-end + marginal covariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from g2o_tpu.core.graph import Graph
from g2o_tpu.core.marginals import compute_marginals
from g2o_tpu.core.optimizer import LevenbergMarquardt, SparseOptimizer
from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.ops import lie
from g2o_tpu.types.icp import EdgeVVGicp, gicp_information, gicp_measurement
from g2o_tpu.types.sclam2d import (
    EdgeSE2SensorCalib,
    VertexOdomDifferentialParams,
    EdgeSE2OdomDifferentialCalib,
    velocity_to_motion,
)
from g2o_tpu.types.slam2d import VertexSE2, EdgeSE2
from g2o_tpu.types.slam3d import VertexSE3

rng = np.random.default_rng(21)


def rand_se3():
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.concatenate([rng.normal(size=3), q])


def test_gicp_alignment():
    """Two poses observing shared surface points align exactly."""
    t0 = np.array([0, 0, 0, 0, 0, 0, 1.0])
    t1_gt = rand_se3()
    g = Graph()
    g.add_vertex(0, VertexSE3, t0, fixed=True)
    t1_init = np.asarray(lie.se3_oplus(jnp.asarray(t1_gt),
                                       jnp.asarray(rng.normal(scale=0.1, size=6))))
    g.add_vertex(1, VertexSE3, t1_init)
    for _ in range(12):
        pw = rng.normal(size=3) * 2
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        pos0 = np.asarray(lie.se3_act(lie.se3_inverse(jnp.asarray(t0)),
                                      jnp.asarray(pw)))
        pos1 = np.asarray(lie.se3_act(lie.se3_inverse(jnp.asarray(t1_gt)),
                                      jnp.asarray(pw)))
        meas = gicp_measurement(pos0, n, pos1, n)
        info = gicp_information(n, 1e-3)
        g.add_edge(EdgeVVGicp, [0, 1], meas, info + 1e-3 * np.eye(3))
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    opt.optimize(30)
    assert opt.chi2() < 1e-10
    est = p.get_estimate(1)
    np.testing.assert_allclose(est[:3], t1_gt[:3], atol=1e-5)


def test_sensor_calib_recovers_offset():
    """EdgeSE2SensorCalib estimates the laser offset."""
    offset_gt = np.array([0.3, 0.1, 0.2])
    poses = [np.array([0.0, 0, 0])]
    for i in range(10):
        poses.append(poses[-1] + np.array([1.0, 0.1 * rng.normal(), 0.15]))
    g = Graph()
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x, fixed=True)
    g.add_vertex(100, VertexSE2, [0.0, 0.0, 0.0])  # offset, bad init
    info = np.eye(3) * 100
    for i in range(len(poses) - 1):
        a = lie.se2_compose(jnp.asarray(poses[i]), jnp.asarray(offset_gt))
        b = lie.se2_compose(jnp.asarray(poses[i + 1]), jnp.asarray(offset_gt))
        meas = np.asarray(lie.se2_compose(lie.se2_inverse(a), b))
        g.add_edge(EdgeSE2SensorCalib, [i, i + 1, 100], meas, info)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    opt.optimize(50)
    est = p.get_estimate(100)
    np.testing.assert_allclose(est, offset_gt, atol=1e-4)


def test_velocity_to_motion_straight_and_arc():
    m = np.asarray(velocity_to_motion(jnp.asarray(1.0), jnp.asarray(1.0),
                                      jnp.asarray(2.0), jnp.asarray(0.5)))
    np.testing.assert_allclose(m, [2.0, 0.0, 0.0], atol=1e-12)
    # arc: vl=0.9, vr=1.1, baseline 0.5, dt=1 -> w=0.4, R=0.5*0.5*2/0.2
    m = np.asarray(velocity_to_motion(jnp.asarray(0.9), jnp.asarray(1.1),
                                      jnp.asarray(1.0), jnp.asarray(0.5)))
    w = 0.2 / 0.5
    R = 0.5 * 0.5 * (2.0 / 0.2)
    np.testing.assert_allclose(m[2], w, atol=1e-12)
    np.testing.assert_allclose(m[0], np.sin(w) * R, atol=1e-12)


def test_odom_calib_recovers_params():
    params_gt = np.array([0.95, 1.05, 0.6])
    g = Graph()
    poses = [np.array([0.0, 0, 0])]
    meas_list = []
    for i in range(25):
        vl, vr, dt = 1.0 + 0.3 * rng.random(), 1.0 + 0.3 * rng.random(), 0.5
        motion = np.asarray(velocity_to_motion(
            jnp.asarray(vl * params_gt[0]), jnp.asarray(vr * params_gt[1]),
            jnp.asarray(dt), jnp.asarray(params_gt[2])))
        poses.append(np.asarray(lie.se2_compose(jnp.asarray(poses[-1]),
                                                jnp.asarray(motion))))
        meas_list.append((vl, vr, dt))
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x, fixed=True)
    g.add_vertex(500, VertexOdomDifferentialParams, [1.0, 1.0, 0.5])
    for i, m in enumerate(meas_list):
        g.add_edge(EdgeSE2OdomDifferentialCalib, [i, i + 1, 500], m,
                   np.eye(3) * 10)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    opt.optimize(60)
    est = p.get_estimate(500)
    np.testing.assert_allclose(est, params_gt, atol=1e-3)


def test_marginals_chain():
    """Covariance grows along an odometry chain (uncertainty accumulates)."""
    g = Graph()
    n = 5
    info = np.diag([100.0, 100.0, 400.0])
    for i in range(n):
        g.add_vertex(i, VertexSE2, [float(i), 0, 0], fixed=(i == 0))
    for i in range(n - 1):
        g.add_edge(EdgeSE2, [i, i + 1], [1.0, 0, 0], info)
    p = g.compile()
    covs = compute_marginals(p, list(range(n)))
    assert covs[0].max() == 0.0  # fixed
    tr = [np.trace(covs[i]) for i in range(1, n)]
    assert all(b > a for a, b in zip(tr, tr[1:]))
    # single-link covariance = info^-1
    np.testing.assert_allclose(covs[1], np.linalg.inv(info), atol=1e-10)


def test_sparse_marginals_match_dense():
    """Sparse-factor marginal recovery (the scalable backend) must agree
    with the dense H^-1 blocks (reference solveBlocks semantics,
    ``solvers/cholmod/linear_solver_cholmod.h:160-230``)."""
    import numpy as np

    from g2o_tpu.core.marginals import (compute_cross_marginals,
                                        compute_marginals)
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=50, seed=14)
    p = g.compile()
    vids = sorted(p.vid_index)[:6]
    md = compute_marginals(p, vids, method="dense")
    ms = compute_marginals(p, vids, method="sparse")
    for v in vids:
        np.testing.assert_allclose(ms[v], md[v], rtol=1e-8, atol=1e-10)
    cd = compute_cross_marginals(p, vids[1], vids[4], method="dense")
    cs = compute_cross_marginals(p, vids[1], vids[4], method="sparse")
    np.testing.assert_allclose(cs, cd, rtol=1e-8, atol=1e-10)


def test_schur_marginals_match_dense_ba():
    """Schur-based marginal recovery on a BA scene (cameras + marginalized
    points): camera blocks from the reduced system S^-1, landmark blocks via
    Cov_jj = D_j^-1 + Y_j^T S^-1 Y_j — must equal the dense H^-1 blocks."""
    import numpy as np

    from g2o_tpu.core.marginals import compute_marginals
    from g2o_tpu.sim.generators import create_ba_scene

    g, truth = create_ba_scene(n_cameras=6, n_points=40, pixel_noise=0.5,
                               point_noise=0.2, seed=11)
    p = g.compile()
    vids = sorted(p.vid_index)
    req = vids[:3] + vids[-4:]          # a few cameras + a few points
    lam = 1e-5
    md = compute_marginals(p, req, method="dense", lam=lam)
    ms = compute_marginals(p, req, method="schur", lam=lam)
    for v in req:
        np.testing.assert_allclose(ms[v], md[v], rtol=1e-7, atol=1e-10)
    # auto picks schur when marginalized vertices exist
    ma = compute_marginals(p, req[:2], lam=lam)
    for v in req[:2]:
        np.testing.assert_allclose(ma[v], md[v], rtol=1e-7, atol=1e-10)


def test_schur_marginals_multitype_pose_landmark():
    """Multi-type (SE2 poses + PointXY landmarks) graph — the case the
    round-1 sparse path rejected.  Schur marginals must match dense H^-1
    for both vertex families."""
    import numpy as np

    from g2o_tpu.core.marginals import compute_marginals
    from g2o_tpu.sim.generators import create_simulator2d

    g = create_simulator2d(n_poses=25, n_landmarks=12,
                           sensors=("odometry", "pointxy"), seed=5)
    # marginalize every landmark (dim-2 vertices)
    for vid, rec in g.vertices().items():
        if len(np.asarray(rec.estimate)) == 2:
            g.set_marginalized(vid, True)
    p = g.compile()
    pose_vids = [v for v in p.vid_index if len(p.get_estimate(v)) == 3]
    lm_vids = [v for v in p.vid_index if len(p.get_estimate(v)) == 2]
    req = pose_vids[:3] + lm_vids[:3] + pose_vids[-2:]
    lam = 1e-6
    md = compute_marginals(p, req, method="dense", lam=lam)
    ms = compute_marginals(p, req, method="schur", lam=lam)
    for v in req:
        np.testing.assert_allclose(ms[v], md[v], rtol=1e-7, atol=1e-10)

"""Synthetic dataset generators.

TPU-framework analogues of the reference's dataset tooling:

* :func:`create_sphere` — the sphere pose-graph generator
  (``g2o/examples/sphere/create_sphere.cpp:40-231``): poses on a sphere
  (``numLaps`` laps of ``nodesPerLevel`` nodes), odometry edges between
  consecutive poses, loop-closure edges between laps, Gaussian noise on the
  edge measurements (compact-quaternion rotation noise), initial estimates
  propagated by chaining noisy odometry.
* :func:`create_manhattan` — a Manhattan-world 2D pose graph in the spirit of
  the 2D simulator (``g2o/apps/g2o_simulator/test_simulator2d.cpp:40``):
  grid random walk with 90° turns, odometry edges + loop closures between
  spatially-close revisits.
* :func:`create_ba_scene` — a synthetic bundle-adjustment problem mirroring
  ``g2o/examples/ba/ba_demo.cpp``: a grid of 3D points observed by cameras
  along a line, mono reprojection edges with pixel noise, optional outliers.

All generators are pure NumPy (host-side, run once) and return a
:class:`~g2o_tpu.core.graph.Graph`.
"""

from __future__ import annotations

import numpy as np

from g2o_tpu.core.graph import Graph


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


def _quat_from_matrix(R):
    # (x, y, z, w), w >= 0
    tr = np.trace(R)
    if tr > 0:
        w = np.sqrt(1.0 + tr) / 2.0
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2
        q = np.zeros(3)
        q[i] = s / 4
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = q
    q = np.array([x, y, z, w])
    if q[3] < 0:
        q = -q
    return q / np.linalg.norm(q)


def _quat_to_matrix(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _se3(R, t):
    return np.concatenate([t, _quat_from_matrix(R)])


def _se3_mul(a, b):
    Ra, Rb = _quat_to_matrix(a[3:]), _quat_to_matrix(b[3:])
    R = Ra @ Rb
    t = a[:3] + Ra @ b[:3]
    return _se3(R, t)


def _se3_inv(a):
    R = _quat_to_matrix(a[3:]).T
    return _se3(R, -R @ a[:3])


def create_sphere(nodes_per_level: int = 50, laps: int = 50,
                  radius: float = 100.0,
                  trans_noise=(0.01, 0.01, 0.01),
                  rot_noise=(0.005, 0.005, 0.005),
                  seed: int = 0) -> Graph:
    from g2o_tpu.types.slam3d import EdgeSE3, VertexSE3

    rng = np.random.default_rng(seed)
    n_total = nodes_per_level * laps

    # ground-truth poses on the sphere (reference ``create_sphere.cpp:103-115``)
    gt = []
    vid = 0
    for f in range(laps):
        for n in range(nodes_per_level):
            vid += 1
            rot = _rotz(-np.pi + 2 * n * np.pi / nodes_per_level) @ \
                _roty(-0.5 * np.pi + vid * np.pi / n_total)
            t = rot @ np.array([radius, 0.0, 0.0])
            gt.append(_se3(rot, t))

    # edge lists: odometry + loop closures between laps
    pairs = [(i - 1, i) for i in range(1, n_total)]
    for f in range(1, laps):
        for nn in range(nodes_per_level):
            i = (f - 1) * nodes_per_level + nn
            for n in (-1, 0, 1):
                if f == laps - 1 and n == 1:
                    continue
                j = f * nodes_per_level + nn + n
                if 0 <= j < n_total:
                    pairs.append((i, j))

    info = np.zeros((6, 6))
    info[:3, :3] = np.diag(1.0 / np.square(trans_noise))
    info[3:, 3:] = np.diag(1.0 / np.square(rot_noise))

    # noisy measurements (compact-quaternion rotation perturbation, as in the
    # reference ``create_sphere.cpp:170-200``)
    measurements = []
    for (i, j) in pairs:
        t = _se3_mul(_se3_inv(gt[i]), gt[j])
        qn = rng.normal(scale=rot_noise)
        qw = 1.0 - np.linalg.norm(qn)
        if qw < 0:
            qw = 0.0
        dq = np.concatenate([qn, [qw]])
        dq /= np.linalg.norm(dq)
        dt = rng.normal(scale=trans_noise)
        noisy = _se3_mul(t, np.concatenate([dt, dq]))
        measurements.append(noisy)

    # initial estimates: chain the noisy odometry from pose 0
    est = [gt[0]]
    for i in range(1, n_total):
        est.append(_se3_mul(est[i - 1], measurements[i - 1]))

    g = Graph()
    for i in range(n_total):
        g.add_vertex(i, VertexSE3, est[i], fixed=(i == 0))
    for (i, j), m in zip(pairs, measurements):
        g.add_edge(EdgeSE3, [i, j], m, info)
    return g


def create_manhattan(n_poses: int = 3500, step: float = 1.0,
                     trans_noise=(0.05, 0.05), rot_noise=0.02,
                     loop_radius: float = 1.5, max_loops_per_pose: int = 2,
                     seed: int = 0) -> Graph:
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    rng = np.random.default_rng(seed)

    def se2_mul(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        th = a[2] + b[2]
        th = (th + np.pi) % (2 * np.pi) - np.pi
        return np.array([a[0] + c * b[0] - s * b[1],
                         a[1] + s * b[0] + c * b[1], th])

    def se2_inv(a):
        c, s = np.cos(a[2]), np.sin(a[2])
        return np.array([-(c * a[0] + s * a[1]), s * a[0] - c * a[1], -a[2]])

    # ground-truth random grid walk with 90-degree turns
    gt = [np.zeros(3)]
    heading = 0
    for _ in range(1, n_poses):
        r = rng.random()
        if r < 0.6:
            turn = 0
        elif r < 0.8:
            turn = 1
        else:
            turn = -1
        heading = (heading + turn) % 4
        prev = gt[-1]
        th = heading * np.pi / 2
        nxt = np.array([prev[0] + step * np.cos(th),
                        prev[1] + step * np.sin(th), th])
        gt.append(nxt)

    info = np.diag([1.0 / trans_noise[0] ** 2, 1.0 / trans_noise[1] ** 2,
                    1.0 / rot_noise ** 2])

    pairs = [(i - 1, i) for i in range(1, n_poses)]
    # loop closures: revisits within loop_radius (grid hashing for O(n))
    cell = {}
    for i, p in enumerate(gt):
        key = (int(np.floor(p[0] / loop_radius)), int(np.floor(p[1] / loop_radius)))
        cell.setdefault(key, []).append(i)
    for i, p in enumerate(gt):
        found = 0
        kx = int(np.floor(p[0] / loop_radius))
        ky = int(np.floor(p[1] / loop_radius))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in cell.get((kx + dx, ky + dy), ()):
                    if j < i - 10 and found < max_loops_per_pose and \
                            np.linalg.norm(gt[i][:2] - gt[j][:2]) < loop_radius:
                        pairs.append((j, i))
                        found += 1

    measurements = []
    for (i, j) in pairs:
        t = se2_mul(se2_inv(gt[i]), gt[j])
        noise = np.array([rng.normal(scale=trans_noise[0]),
                          rng.normal(scale=trans_noise[1]),
                          rng.normal(scale=rot_noise)])
        measurements.append(se2_mul(t, noise))

    est = [gt[0]]
    for i in range(1, n_poses):
        est.append(se2_mul(est[i - 1], measurements[i - 1]))

    g = Graph()
    for i in range(n_poses):
        g.add_vertex(i, VertexSE2, est[i], fixed=(i == 0))
    for (i, j), m in zip(pairs, measurements):
        g.add_edge(EdgeSE2, [i, j], m, info)
    return g


def create_simulator2d(n_poses: int = 200, n_landmarks: int = 60,
                       world_size: float = 20.0,
                       sensors=("odometry", "pointxy", "bearing"),
                       sensor_range: float = 5.0,
                       trans_noise=(0.03, 0.03), rot_noise=0.01,
                       landmark_noise=(0.05, 0.05),
                       bearing_noise: float = 0.01,
                       seed: int = 0) -> Graph:
    """2D simulator with pluggable sensors — analogue of the reference
    ``g2o_simulator`` 2D app (``apps/g2o_simulator/test_simulator2d.cpp:40``):
    a random-walk trajectory observing scattered XY landmarks with
    range-limited point and bearing sensors, all measurements noisy."""
    from g2o_tpu.types.slam2d import (
        EdgeSE2, EdgeSE2PointXY, EdgeSE2PointXYBearing, VertexSE2,
        VertexPointXY,
    )

    rng = np.random.default_rng(seed)

    def se2_mul(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        th = (a[2] + b[2] + np.pi) % (2 * np.pi) - np.pi
        return np.array([a[0] + c * b[0] - s * b[1],
                         a[1] + s * b[0] + c * b[1], th])

    def se2_inv(a):
        c, s = np.cos(a[2]), np.sin(a[2])
        return np.array([-(c * a[0] + s * a[1]), s * a[0] - c * a[1], -a[2]])

    landmarks = rng.uniform(-world_size / 2, world_size / 2,
                            size=(n_landmarks, 2))
    gt = [np.zeros(3)]
    for _ in range(1, n_poses):
        step = np.array([0.5 + 0.3 * rng.random(), 0.0,
                         rng.normal(scale=0.3)])
        nxt = se2_mul(gt[-1], step)
        if np.abs(nxt[:2]).max() > world_size / 2:
            step[2] = np.pi / 2
            nxt = se2_mul(gt[-1], step)
        gt.append(nxt)

    g = Graph()
    info_odo = np.diag([1.0 / trans_noise[0] ** 2, 1.0 / trans_noise[1] ** 2,
                        1.0 / rot_noise ** 2])
    info_lm = np.diag([1.0 / landmark_noise[0] ** 2,
                       1.0 / landmark_noise[1] ** 2])
    info_bearing = np.array([[1.0 / bearing_noise ** 2]])

    for i, p in enumerate(gt):
        g.add_vertex(i, VertexSE2, p, fixed=(i == 0))
    seen = set()
    lm_vid0 = n_poses
    if "odometry" in sensors:
        for i in range(1, n_poses):
            t = se2_mul(se2_inv(gt[i - 1]), gt[i])
            noise = np.array([rng.normal(scale=trans_noise[0]),
                              rng.normal(scale=trans_noise[1]),
                              rng.normal(scale=rot_noise)])
            g.add_edge(EdgeSE2, [i - 1, i], se2_mul(t, noise), info_odo)
    for i, p in enumerate(gt):
        rel_all = landmarks - p[:2]
        dists = np.linalg.norm(rel_all, axis=1)
        c, s = np.cos(p[2]), np.sin(p[2])
        for k in np.nonzero(dists < sensor_range)[0]:
            vid = lm_vid0 + int(k)
            local = np.array([c * rel_all[k][0] + s * rel_all[k][1],
                              -s * rel_all[k][0] + c * rel_all[k][1]])
            if vid not in seen:
                obs = local + rng.normal(scale=landmark_noise)
                world = p[:2] + np.array([c * obs[0] - s * obs[1],
                                          s * obs[0] + c * obs[1]])
                g.add_vertex(vid, VertexPointXY, world)
                seen.add(vid)
            if "pointxy" in sensors:
                obs = local + rng.normal(scale=landmark_noise)
                g.add_edge(EdgeSE2PointXY, [i, vid], obs, info_lm)
            if "bearing" in sensors:
                b = np.arctan2(local[1], local[0]) + \
                    rng.normal(scale=bearing_noise)
                g.add_edge(EdgeSE2PointXYBearing, [i, vid], [b], info_bearing)
    return g


def create_simulator3d(n_poses: int = 100, n_landmarks: int = 80,
                       world_size: float = 15.0, sensor_range: float = 6.0,
                       trans_noise=(0.02, 0.02, 0.02),
                       rot_noise=(0.005, 0.005, 0.005),
                       landmark_noise=(0.03, 0.03, 0.03),
                       seed: int = 0) -> Graph:
    """3D simulator: SE3 trajectory + XYZ landmark observations through an
    identity sensor offset (``EDGE_SE3_TRACKXYZ``) — analogue of the 3D
    simulator app (``apps/g2o_simulator/test_simulator3d.cpp``)."""
    from g2o_tpu.types.slam3d import (
        EdgeSE3, EdgeSE3PointXYZ, VertexSE3, VertexPointXYZ,
    )

    rng = np.random.default_rng(seed)
    landmarks = rng.uniform(-world_size / 2, world_size / 2,
                            size=(n_landmarks, 3))

    gt = [np.array([0, 0, 0, 0, 0, 0, 1.0])]
    for i in range(1, n_poses):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        ang = rng.normal(scale=0.15)
        q = np.concatenate([np.sin(ang / 2) * ax, [np.cos(ang / 2)]])
        step = np.concatenate([[0.6, 0, 0], q])
        nxt = _se3_mul(gt[-1], step)
        if np.abs(nxt[:3]).max() > world_size / 2:
            turn = _se3(_rotz(np.pi / 2), np.zeros(3))
            nxt = _se3_mul(gt[-1], turn)
        gt.append(nxt)

    g = Graph()
    g.add_parameter(0, np.array([0, 0, 0, 0, 0, 0, 1.0]))  # identity offset
    info_odo = np.zeros((6, 6))
    info_odo[:3, :3] = np.diag(1.0 / np.square(trans_noise))
    info_odo[3:, 3:] = np.diag(1.0 / np.square(rot_noise))
    info_lm = np.diag(1.0 / np.square(landmark_noise))

    for i, p in enumerate(gt):
        g.add_vertex(i, VertexSE3, p, fixed=(i == 0))
    for i in range(1, n_poses):
        t = _se3_mul(_se3_inv(gt[i - 1]), gt[i])
        qn = rng.normal(scale=rot_noise)
        qw = max(1.0 - np.linalg.norm(qn), 0.0)
        dq = np.concatenate([qn, [qw]])
        dq /= np.linalg.norm(dq)
        noisy = _se3_mul(t, np.concatenate([rng.normal(scale=trans_noise), dq]))
        g.add_edge(EdgeSE3, [i - 1, i], noisy, info_odo)

    seen = set()
    lm_vid0 = n_poses
    for i, p in enumerate(gt):
        R = _quat_to_matrix(p[3:])
        for k in range(n_landmarks):
            rel = landmarks[k] - p[:3]
            if np.linalg.norm(rel) >= sensor_range:
                continue
            local = R.T @ rel
            vid = lm_vid0 + k
            if vid not in seen:
                obs = local + rng.normal(scale=landmark_noise)
                g.add_vertex(vid, VertexPointXYZ, p[:3] + R @ obs)
                seen.add(vid)
            obs = local + rng.normal(scale=landmark_noise)
            g.add_edge(EdgeSE3PointXYZ, [i, vid], obs, info_lm, param_id=0)
    return g


def create_ba_scene(n_cameras: int = 15, n_points: int = 300,
                    focal: float = 1000.0, cx: float = 320.0, cy: float = 240.0,
                    pixel_noise: float = 1.0, outlier_ratio: float = 0.0,
                    point_noise: float = 1.0, seed: int = 0):
    """Synthetic mono BA problem (reference ``ba_demo.cpp``): cameras along a
    line looking at a box of points.  Returns (Graph, ground-truth points).
    Cameras 0 and 1 are fixed (gauge + scale)."""
    from g2o_tpu.types.sba import (
        CAM_PARAM_ID, EdgeProjectXYZ2UV, VertexPointXYZ, VertexSE3Expmap,
    )

    rng = np.random.default_rng(seed)
    true_points = np.stack([
        rng.uniform(-3, 3, size=n_points),
        rng.uniform(-0.5, 0.5, size=n_points),
        rng.uniform(4, 8, size=n_points),
    ], axis=1)

    g = Graph()
    g.add_parameter(CAM_PARAM_ID, np.array([focal, cx, cy, 0.0]))

    # camera poses: world-to-camera (Tcw), translation along x
    cam_t = []
    for i in range(n_cameras):
        trans = np.array([i * 0.04 - 1.0, 0.0, 0.0])
        Tcw = _se3(np.eye(3), -trans)  # R = I, t = -C
        cam_t.append(Tcw)
        g.add_vertex(i, VertexSE3Expmap, Tcw, fixed=(i < 2))

    def project(Tcw, pw):
        R = _quat_to_matrix(Tcw[3:])
        pc = R @ pw + Tcw[:3]
        return np.array([focal * pc[0] / pc[2] + cx,
                         focal * pc[1] / pc[2] + cy]), pc[2]

    # only points visible in >= 2 cameras are added (as in the reference
    # ba_demo) — fewer observations leave the depth unconstrained
    point_vid0 = n_cameras
    vid = point_vid0
    truth_by_vid = {}
    for k in range(n_points):
        visible = []
        for i in range(n_cameras):
            uv, z = project(cam_t[i], true_points[k])
            if z <= 0 or not (0 <= uv[0] < 2 * cx and 0 <= uv[1] < 2 * cy):
                continue
            visible.append((i, uv))
        if len(visible) < 2:
            continue
        init = true_points[k] + rng.normal(scale=point_noise, size=3)
        g.add_vertex(vid, VertexPointXYZ, init, marginalized=True)
        truth_by_vid[vid] = true_points[k]
        for i, uv in visible:
            if outlier_ratio > 0 and rng.random() < outlier_ratio:
                obs = np.array([rng.uniform(0, 2 * cx), rng.uniform(0, 2 * cy)])
            else:
                obs = uv + rng.normal(scale=pixel_noise, size=2)
            g.add_edge(EdgeProjectXYZ2UV, [vid, i], obs, np.eye(2),
                       param_id=CAM_PARAM_ID)
        vid += 1
    return g, truth_by_vid

"""Plane SLAM types — analogue of the reference ``g2o/types/slam3d_addons``
(plane subset; Plücker-line types are a later-round gap).

``Plane3D`` is stored as normalized coefficients (nx, ny, nz, -d)
(``plane3d.h:54-117``):

* ``oplus(v)``: rotate the normal by azimuth/elevation increments in the
  plane's own frame, add v[2] to the distance (``plane3d.h:88-101``);
* ``ominus``: [azimuth, elevation, distance] difference in the reference
  plane's frame (``plane3d.h:103-110``);
* pose transform ``T * plane``: n' = R n, coeff3' = coeff3 - t . n'
  (``plane3d.h:121-128``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from g2o_tpu.core.types import EdgeType, VertexType, register_edge, register_vertex
from g2o_tpu.ops import lie
from g2o_tpu.types.slam3d import VertexSE3


def _azimuth(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def _elevation(v):
    return jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1))


def _plane_normalize(c):
    n = jnp.linalg.norm(c[..., :3], axis=-1, keepdims=True)
    return c / n


def _rotation_of_normal(n):
    """R = Rz(azimuth) * Ry(-elevation) (``plane3d.h:82-86``)."""
    az, el = _azimuth(n), _elevation(n)
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se = jnp.cos(el), jnp.sin(el)
    # Rz(az) @ Ry(-el)
    return jnp.stack([
        jnp.stack([ca * ce, -sa, -ca * se], axis=-1),
        jnp.stack([sa * ce, ca, -sa * se], axis=-1),
        jnp.stack([se, jnp.zeros_like(ca), ce], axis=-1),
    ], axis=-2)


def plane_oplus(c, v):
    az, el, dd = v[..., 0], v[..., 1], v[..., 2]
    s, co = jnp.sin(el), jnp.cos(el)
    n_local = jnp.stack([co * jnp.cos(az), co * jnp.sin(az), s], axis=-1)
    R = _rotation_of_normal(c[..., :3])
    n_new = jnp.einsum("...ij,...j->...i", R, n_local)
    d = -c[..., 3] + dd
    out = jnp.concatenate([n_new, -d[..., None]], axis=-1)
    return _plane_normalize(out)


def plane_ominus(ref, plane):
    """[azimuth, elevation, distance] of ``plane`` in ``ref``'s frame."""
    R = _rotation_of_normal(ref[..., :3])
    n = jnp.einsum("...ji,...j->...i", R, plane[..., :3])  # R^T * n
    d = (-ref[..., 3]) - (-plane[..., 3])
    return jnp.stack([_azimuth(n), _elevation(n), d], axis=-1)


def plane_transform(x_se3, c):
    """T * plane for an SE3 state vector."""
    n = lie.quat_rotate(x_se3[..., 3:7], c[..., :3])
    w = c[..., 3] - jnp.sum(x_se3[..., :3] * n, axis=-1)
    return _plane_normalize(jnp.concatenate([n, w[..., None]], axis=-1))


VertexPlane = register_vertex(VertexType(
    name="VERTEX_PLANE",
    rep_dim=4,
    tangent_dim=3,
    oplus=plane_oplus,
    tags=("VERTEX_PLANE",),
))


# --------------------------------------------------------------------- #
# Plücker lines (reference ``line3d.h``): state (w(3), d(3)), |d| = 1;
# minimal update via the orthonormal representation (U in SO(3), W in SO(2))
# --------------------------------------------------------------------- #

_EPS = 1e-12


def _line_to_orthonormal(l):
    w, d = l[..., :3], l[..., 3:6]
    nw = jnp.linalg.norm(w, axis=-1)
    nd = jnp.linalg.norm(d, axis=-1)
    mag = jnp.sqrt(nw * nw + nd * nd)
    W = jnp.stack([
        jnp.stack([nw / mag, -nd / mag], axis=-1),
        jnp.stack([nd / mag, nw / mag], axis=-1),
    ], axis=-2)
    u0 = w / jnp.maximum(nw, _EPS)[..., None]
    u1 = d / jnp.maximum(nd, _EPS)[..., None]
    cr = jnp.cross(w, d)
    u2 = cr / jnp.maximum(jnp.linalg.norm(cr, axis=-1), _EPS)[..., None]
    U = jnp.stack([u0, u1, u2], axis=-1)   # columns
    return U, W


def _line_from_orthonormal(U, W):
    w = U[..., :, 0] * W[..., 0, 0][..., None]
    d = U[..., :, 1] * W[..., 1, 0][..., None]
    l = jnp.concatenate([w, d], axis=-1)
    return _line_normalize(l)


def _line_normalize(l):
    n = jnp.linalg.norm(l[..., 3:6], axis=-1, keepdims=True)
    return l / jnp.maximum(n, _EPS)


def line3d_oplus(l, v):
    """Orthonormal update (``line3d.h:148-163``): U <- U R(quat(v[:3])),
    W <- W Rot2(v[3])."""
    U, W = _line_to_orthonormal(l)
    R = lie.quat_to_matrix(lie.quat_from_compact(v[..., :3]))
    c, s = jnp.cos(v[..., 3]), jnp.sin(v[..., 3])
    W2 = jnp.stack([
        jnp.stack([c, -s], axis=-1),
        jnp.stack([s, c], axis=-1),
    ], axis=-2)
    return _line_from_orthonormal(U @ R, W @ W2)


def line3d_ominus(a, b):
    """4-dof difference (``line3d.h:165-181``): quat vec of U_a^T U_b and
    the SO(2) angle of W_a^T W_b."""
    Ua, Wa = _line_to_orthonormal(a)
    Ub, Wb = _line_to_orthonormal(b)
    dU = jnp.swapaxes(Ua, -1, -2) @ Ub
    dW = jnp.swapaxes(Wa, -1, -2) @ Wb
    q = lie.quat_from_matrix(dU)
    ang = jnp.arctan2(dW[..., 1, 0], dW[..., 0, 0])
    return jnp.concatenate([q[..., :3], ang[..., None]], axis=-1)


def line3d_transform(x_se3, l):
    """T * line (Plücker): d' = R d, w' = R w + t x (R d)."""
    R_d = lie.quat_rotate(x_se3[..., 3:7], l[..., 3:6])
    R_w = lie.quat_rotate(x_se3[..., 3:7], l[..., :3])
    w = R_w + jnp.cross(x_se3[..., :3], R_d)
    return _line_normalize(jnp.concatenate([w, R_d], axis=-1))


VertexLine3D = register_vertex(VertexType(
    name="VERTEX_LINE3D",
    rep_dim=6,
    tangent_dim=4,
    oplus=line3d_oplus,
    tags=("VERTEX_LINE3D",),
))


def _edge_se3_line3d_residual(states, meas, param):
    """Reference ``EdgeSE3Line3D::computeError``
    (``edge_se3_line.cpp:73-79``): local = X^-1 * line;
    error = local.ominus(z)."""
    x, line = states
    local = line3d_transform(lie.se3_inverse(x), line)
    return line3d_ominus(local, meas)


EdgeSE3Line3D = register_edge(EdgeType(
    name="EDGE_SE3_LINE3D",
    vertex_types=(VertexSE3, VertexLine3D),
    residual_dim=4,
    residual=_edge_se3_line3d_residual,
    meas_dim=6,
    tags=("EDGE_SE3_LINE3D",),
))


def _edge_plane_residual(states, meas, param):
    """Plane-plane constraint (``edge_plane.h:44-49``): coefficient
    difference error = (p2 - p1) - z."""
    p1, p2 = states
    return (p2 - p1) - meas


EdgePlane = register_edge(EdgeType(
    name="EDGE_PLANE",
    vertex_types=(VertexPlane, VertexPlane),
    residual_dim=4,
    residual=_edge_plane_residual,
    meas_dim=4,
    tags=("EDGE_PLANE",),
))


def _edge_se3_plane_calib_residual(states, meas, param):
    """Reference ``EdgeSE3PlaneSensorCalib::computeError``
    (``edge_se3_plane_calib.h:46-56``): local = ((X * O)^-1) * plane;
    error = local.ominus(measurement)."""
    x, plane, offset = states
    w2n = lie.se3_inverse(lie.se3_compose(x, offset))
    local = plane_transform(w2n, plane)
    return plane_ominus(local, meas)


EdgeSE3PlaneCalib = register_edge(EdgeType(
    name="EDGE_SE3_PLANE_CALIB",
    vertex_types=(VertexSE3, VertexPlane, VertexSE3),
    residual_dim=3,
    residual=_edge_se3_plane_calib_residual,
    meas_dim=4,
    tags=("EDGE_SE3_PLANE_CALIB",),
))


def _edge_se3_calib_residual(states, meas, param):
    """Reference ``EdgeSE3Calib::computeError``
    (``slam3d_addons/edge_se3_calib.cpp:40-46``):
    error = toVectorMQT(Z^-1 * C^-1 * X1^-1 * X2 * C)."""
    x1, x2, calib = states
    delta = lie.se3_compose(
        lie.se3_compose(lie.se3_inverse(calib),
                        lie.se3_compose(lie.se3_inverse(x1), x2)),
        calib)
    return lie.se3_to_mqt(lie.se3_compose(lie.se3_inverse(meas), delta))


EdgeSE3Calib = register_edge(EdgeType(
    name="EDGE_SE3_CALIB",
    vertex_types=(VertexSE3, VertexSE3, VertexSE3),
    residual_dim=6,
    residual=_edge_se3_calib_residual,
    meas_dim=7,
    tags=("EDGE_SE3_CALIB",),
))


# ---- Euler-serialized SE3 (VERTEX3 / EDGE3) ------------------------------
# Same SE3 state and MQT error as VERTEX_SE3:QUAT / EDGE_SE3:QUAT, but the
# .g2o line carries [tx ty tz roll pitch yaw] and the information matrix in
# Euler coordinates (``slam3d_addons/vertex_se3_euler.cpp:38-55``,
# ``edge_se3_euler.cpp:58-104``; tags ``types_slam3d_addons.cpp:38-39``).

def euler_to_quat(rpy):
    """RPY -> quaternion (x, y, z, w) (``isometry3d_mappings.cpp:60-75``)."""
    r, p, y = rpy
    sr, cr = np.sin(r / 2), np.cos(r / 2)
    sp, cp = np.sin(p / 2), np.cos(p / 2)
    sy, cy = np.sin(y / 2), np.cos(y / 2)
    return np.array([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


def quat_to_euler(q):
    """Quaternion (x, y, z, w) -> RPY (``isometry3d_mappings.cpp:48-58``)."""
    q1, q2, q3, q0 = q  # x, y, z, w
    roll = np.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
    pitch = np.arcsin(np.clip(2 * (q0 * q2 - q3 * q1), -1.0, 1.0))
    yaw = np.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    return np.array([roll, pitch, yaw])


def et_to_qt(v6):
    """[t, rpy] -> [t, quat-xyzw] (``fromVectorET``)."""
    v6 = np.asarray(v6, dtype=float)
    return np.concatenate([v6[:3], euler_to_quat(v6[3:6])])


def qt_to_et(x7):
    """[t, quat-xyzw] -> [t, rpy] (``toVectorET``)."""
    x7 = np.asarray(x7, dtype=float)
    q = x7[3:7] / np.linalg.norm(x7[3:7])
    return np.concatenate([x7[:3], quat_to_euler(q)])


def _jac_qt_euler(x7, delta=1e-6):
    """Numeric 6x6 Jacobian d(ET)/d(QT[0:6]) at the measurement — the
    *intended* ``jac_quat3_euler3`` (``edge_se3_euler.cpp:37-55``; the
    reference's loop writes every column into ``J.col(3)``, an upstream
    bug we do not reproduce)."""
    x7 = np.asarray(x7, dtype=float)
    J = np.zeros((6, 6))
    for i in range(6):
        ta, tb = x7.copy(), x7.copy()
        ta[i] -= delta
        tb[i] += delta
        # renormalize the quaternion exactly as fromVectorQT's consumer does
        ea = qt_to_et(ta)
        eb = qt_to_et(tb)
        J[:, i] = (eb - ea) / (2 * delta)
    return J


def _edge3_info_from_io(info_euler, meas7):
    J = _jac_qt_euler(meas7)
    return J.T @ np.asarray(info_euler) @ J


def _edge3_info_to_io(info_qt, meas7):
    J = np.linalg.inv(_jac_qt_euler(meas7))
    return J.T @ np.asarray(info_qt) @ J


VertexSE3Euler = register_vertex(VertexType(
    name="VERTEX3",
    rep_dim=7,
    tangent_dim=6,
    oplus=VertexSE3.oplus,
    to_vector=qt_to_et,
    from_vector=et_to_qt,
    io_dim=6,
    tags=("VERTEX3",),
))


def _edge3_residual(states, meas, param):
    xi, xj = states
    delta = lie.se3_compose(lie.se3_inverse(xi), xj)
    return lie.se3_to_mqt(lie.se3_compose(lie.se3_inverse(meas), delta))


EdgeSE3Euler = register_edge(EdgeType(
    name="EDGE3",
    vertex_types=(VertexSE3Euler, VertexSE3Euler),
    residual_dim=6,
    residual=_edge3_residual,
    meas_dim=7,
    meas_to_vector=qt_to_et,
    meas_from_vector=et_to_qt,
    meas_io_dim=6,
    info_from_io=_edge3_info_from_io,
    info_to_io=_edge3_info_to_io,
    tags=("EDGE3",),
))

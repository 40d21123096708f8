"""Sensor-calibration SLAM types — analogue of ``g2o/types/sclam2d``.

* ``EDGE_SE2_CALIB`` (EdgeSE2SensorCalib): ternary edge estimating the laser
  offset alongside the trajectory; error =
  ``(Z^-1 * ((x1*O)^-1 * x2 * O)).toVector()``
  (``edge_se2_sensor_calib.h:45-54``).
* ``VERTEX_ODOM_DIFFERENTIAL``: 3 calibration params (k_l, k_r, baseline).
* ``EDGE_SE2_ODOM_DIFFERENTIAL_CALIB``: differential-drive odometry calib;
  measurement is a (vl, vr, dt) velocity triple; the calibrated velocities
  convert to a motion increment via the ICC construction
  (``odometry_measurement.cpp:95-117``) and the error is the SE2 difference
  to the actual relative motion (``edge_se2_odom_differential_calib.h:45-63``).
"""

from __future__ import annotations

import jax.numpy as jnp

from g2o_tpu.core.types import EdgeType, VertexType, register_edge, register_vertex
from g2o_tpu.ops import lie
from g2o_tpu.types.slam2d import VertexSE2


# reference tag registration: ``types/sclam2d/types_sclam2d.cpp:43``; the
# pre-round-3 invented spelling stays as a read alias
VertexOdomDifferentialParams = register_vertex(VertexType(
    name="VERTEX_ODOM_DIFFERENTIAL",
    rep_dim=3,
    tangent_dim=3,
    oplus=lambda x, d: x + d,
    tags=("VERTEX_ODOM_DIFFERENTIAL", "VERTEX_ODOM_DIFF_PARAMS"),
))


def _edge_se2_sensor_calib_residual(states, meas, param):
    x1, x2, offset = states
    a = lie.se2_compose(x1, offset)
    b = lie.se2_compose(x2, offset)
    delta = lie.se2_compose(lie.se2_inverse(a), b)
    return lie.se2_compose(lie.se2_inverse(meas), delta)


EdgeSE2SensorCalib = register_edge(EdgeType(
    name="EDGE_SE2_CALIB",
    vertex_types=(VertexSE2, VertexSE2, VertexSE2),
    residual_dim=3,
    residual=_edge_se2_sensor_calib_residual,
    meas_dim=3,
    tags=("EDGE_SE2_CALIB",),
))


def velocity_to_motion(vl, vr, dt, baseline):
    """ICC differential-drive forward model
    (``odometry_measurement.cpp:95-117``), jit-safe branches."""
    diff = vr - vl
    straight = jnp.abs(diff) < 1e-7
    safe_diff = jnp.where(straight, 1.0, diff)
    R = baseline * 0.5 * (vl + vr) / safe_diff
    w = safe_diff / baseline
    theta = w * dt
    c, s = jnp.cos(theta), jnp.sin(theta)
    # motion = rot(theta) * (-icc) + icc, icc = (0, R)
    x_arc = s * R
    y_arc = -c * R + R
    tv = 0.5 * (vr + vl)
    x = jnp.where(straight, tv * dt, x_arc)
    y = jnp.where(straight, 0.0, y_arc)
    th = jnp.where(straight, 0.0, theta)
    return jnp.stack([x, y, th], axis=-1)


def _edge_se2_odom_diff_calib_residual(states, meas, param):
    x1, x2, params = states
    vl, vr, dt = meas[..., 0], meas[..., 1], meas[..., 2]
    motion = velocity_to_motion(vl * params[..., 0], vr * params[..., 1],
                                dt, params[..., 2])
    delta = lie.se2_compose(lie.se2_inverse(x1), x2)
    return lie.se2_compose(lie.se2_inverse(motion), delta)


# reference tag registration: ``types/sclam2d/types_sclam2d.cpp:45``
EdgeSE2OdomDifferentialCalib = register_edge(EdgeType(
    name="EDGE_SE2_ODOM_DIFFERENTIAL_CALIB",
    vertex_types=(VertexSE2, VertexSE2, VertexOdomDifferentialParams),
    residual_dim=3,
    residual=_edge_se2_odom_diff_calib_residual,
    meas_dim=3,
    tags=("EDGE_SE2_ODOM_DIFFERENTIAL_CALIB", "EDGE_SE2_ODOM_DIFF_CALIB"),
))

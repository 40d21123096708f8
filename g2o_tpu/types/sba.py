"""Bundle-adjustment types — TPU-native analogue of the reference
``g2o/types/sba`` library (expmap variants).

Conventions (matching ``g2o/types/sba/types_six_dof_expmap.h``):

* ``VERTEX_SE3:EXPMAP``: the estimate is the world-to-camera transform
  ``Tcw`` stored as (t, q); the update is a *left* multiplication
  ``X <- SE3Quat::exp(update) * X`` with update = [omega, upsilon]
  (``types_six_dof_expmap.h:98-101``).
* ``EDGE_PROJECT_XYZ2UV:EXPMAP``: slot 0 = point, slot 1 = camera; error =
  ``obs - cam_map(Tcw * p)`` with shared ``CameraParameters``
  (focal_length, cx, cy, baseline) resolved by param id
  (``types_six_dof_expmap.h:140-152``, ``:46-65``).
* ``EDGE_PROJECT_XYZ2UVU:EXPMAP``: stereo (u_left, v_left, u_right) with
  ``u_right = u_left - focal*baseline/z`` (``stereocam_uvu_map``).
* ``EDGE_SE3:EXPMAP``: camera-camera edge, error =
  ``(X2^-1 * Z * X1).log()`` in [omega, upsilon] order
  (``types_six_dof_expmap.h:117-124``).
"""

from __future__ import annotations

import jax.numpy as jnp

from g2o_tpu.core.types import EdgeType, VertexType, register_edge, register_vertex
from g2o_tpu.ops import lie
from g2o_tpu.types.slam3d import VertexPointXYZ  # VERTEX_XYZ shares semantics

# conventional parameter id for the shared camera (ba_demo uses 0)
CAM_PARAM_ID = 0


def _expmap_oplus(x, delta):
    """X <- exp([omega, upsilon]) * X."""
    return lie.se3_normalize(lie.se3_compose(lie.se3quat_exp(delta), x))


VertexSE3Expmap = register_vertex(VertexType(
    name="VERTEX_SE3:EXPMAP",
    rep_dim=7,
    tangent_dim=6,
    oplus=_expmap_oplus,
    tags=("VERTEX_SE3:EXPMAP",),
))


def cam_map(pc, param):
    """Pinhole projection with CameraParameters (focal, cx, cy, baseline)."""
    focal, cx, cy = param[0], param[1], param[2]
    invz = 1.0 / pc[..., 2]
    return jnp.stack(
        [focal * pc[..., 0] * invz + cx, focal * pc[..., 1] * invz + cy],
        axis=-1,
    )


def _edge_project_xyz2uv_residual(states, meas, param):
    point, camera = states
    pc = lie.se3_act(camera, point)
    return meas - cam_map(pc, param)


EdgeProjectXYZ2UV = register_edge(EdgeType(
    name="EDGE_PROJECT_XYZ2UV:EXPMAP",
    vertex_types=(VertexPointXYZ, VertexSE3Expmap),
    residual_dim=2,
    residual=_edge_project_xyz2uv_residual,
    meas_dim=2,
    param_dim=4,
    tags=("EDGE_PROJECT_XYZ2UV:EXPMAP", "EDGE_PROJECT_XYZ2UV"),
))


def _edge_project_xyz2uvu_residual(states, meas, param):
    point, camera = states
    focal, cx, cy, baseline = param[0], param[1], param[2], param[3]
    pc = lie.se3_act(camera, point)
    invz = 1.0 / pc[..., 2]
    u = focal * pc[..., 0] * invz + cx
    v = focal * pc[..., 1] * invz + cy
    ur = u - focal * baseline * invz
    return meas - jnp.stack([u, v, ur], axis=-1)


EdgeProjectXYZ2UVU = register_edge(EdgeType(
    name="EDGE_PROJECT_XYZ2UVU:EXPMAP",
    vertex_types=(VertexPointXYZ, VertexSE3Expmap),
    residual_dim=3,
    residual=_edge_project_xyz2uvu_residual,
    meas_dim=3,
    param_dim=4,
    tags=("EDGE_PROJECT_XYZ2UVU:EXPMAP",),
))


def _edge_se3_expmap_residual(states, meas, param):
    x1, x2 = states
    err = lie.se3_compose(lie.se3_inverse(x2),
                          lie.se3_compose(meas, x1))
    return lie.se3quat_log(err)


EdgeSE3Expmap = register_edge(EdgeType(
    name="EDGE_SE3:EXPMAP",
    vertex_types=(VertexSE3Expmap, VertexSE3Expmap),
    residual_dim=6,
    residual=_edge_se3_expmap_residual,
    meas_dim=7,
    tags=("EDGE_SE3:EXPMAP",),
))

"""BAL (Bundle Adjustment in the Large) types — analogue of the reference
``g2o/examples/bal/bal_example.cpp:65-285``.

Camera is the 9-dof BAL parameterisation [rodrigues(3), t(3), f, k1, k2]
with an *additive* update (``VertexCameraBAL::oplusImpl``); the projection
negates after perspective division and applies radial distortion
(``bal_example.cpp:191-244``).  Where the reference needs vendored Ceres
``jet.h`` autodiff headers (``EXTERNAL/ceres``), forward-mode ``jacfwd``
through this pure function is the native replacement (SURVEY.md §2.6).
"""

from __future__ import annotations

import jax.numpy as jnp

from g2o_tpu.core.types import EdgeType, VertexType, register_edge, register_vertex
from g2o_tpu.types.slam3d import VertexPointXYZ


def _additive(x, d):
    return x + d


VertexCameraBAL = register_vertex(VertexType(
    name="VERTEX_CAMERA_BAL",
    rep_dim=9,
    tangent_dim=9,
    oplus=_additive,
    tags=("VERTEX_CAMERA_BAL",),
))


def rodrigues_rotate(omega, p):
    """Rotate p by the axis-angle vector omega (derivative-safe at 0)."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta2 < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    v = omega / theta
    cth = jnp.cos(theta)
    sth = jnp.sin(theta)
    vxp = jnp.cross(v, p)
    vdotp = jnp.sum(v * p, axis=-1, keepdims=True)
    rotated = p * cth + vxp * sth + v * vdotp * (1.0 - cth)
    # Taylor branch: p + omega x p
    return jnp.where(small, p + jnp.cross(omega, p), rotated)


def bal_project(camera, point):
    """BAL projection: world point -> pixel prediction (2,)."""
    p = rodrigues_rotate(camera[..., :3], point) + camera[..., 3:6]
    proj = -p[..., :2] / p[..., 2:3]
    r2 = jnp.sum(proj * proj, axis=-1, keepdims=True)
    f = camera[..., 6:7]
    k1 = camera[..., 7:8]
    k2 = camera[..., 8:9]
    rp = 1.0 + k1 * r2 + k2 * r2 * r2
    return f * rp * proj


def _edge_bal_residual(states, meas, param):
    camera, point = states
    return bal_project(camera, point) - meas


EdgeObservationBAL = register_edge(EdgeType(
    name="EDGE_OBSERVATION_BAL",
    vertex_types=(VertexCameraBAL, VertexPointXYZ),
    residual_dim=2,
    residual=_edge_bal_residual,
    meas_dim=2,
    tags=("EDGE_OBSERVATION_BAL",),
))

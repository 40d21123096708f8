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

"""Segment/line 2D SLAM types — analogue of ``g2o/types/slam2d_addons``.

* ``VERTEX_SEGMENT2D``: two endpoints (p1x p1y p2x p2y), additive update
  (``vertex_segment2d.h:82-86``).
* ``VERTEX_LINE2D``: (theta, rho), additive with angle normalisation
  (``vertex_line2d.h:86-90``).
* ``EDGE_SE2_SEGMENT2D``: both endpoints in the observing pose frame
  (``edge_se2_segment2d.h:49-59``).
* ``EDGE_SE2_LINE2D``: line observed from a pose
  (``edge_se2_line2d.h:45-57``).
* ``EDGE_LINE2D``: line-line difference (``edge_line2d.h:43-48``).
"""

from __future__ import annotations

import jax.numpy as jnp

from g2o_tpu.core.types import EdgeType, VertexType, register_edge, register_vertex
from g2o_tpu.ops import lie
from g2o_tpu.types.slam2d import VertexPointXY, VertexSE2


VertexSegment2D = register_vertex(VertexType(
    name="VERTEX_SEGMENT2D",
    rep_dim=4,
    tangent_dim=4,
    oplus=lambda x, d: x + d,
    tags=("VERTEX_SEGMENT2D",),
))


def _line2d_oplus(x, d):
    # state = (theta, rho, p1Id, p2Id); the endpoint ids ride along
    # un-updated (they are bookkeeping, not geometry)
    return jnp.concatenate([
        jnp.stack([lie.normalize_angle(x[..., 0] + d[..., 0]),
                   x[..., 1] + d[..., 1]], axis=-1),
        x[..., 2:4]], axis=-1)


VertexLine2D = register_vertex(VertexType(
    name="VERTEX_LINE2D",
    # (theta, rho) + the reference's serialized p1Id/p2Id endpoint-vertex
    # ids (``slam2d_addons/vertex_line2d.cpp:52-58`` reads/writes
    # ``theta rho p1Id p2Id``); -1 = unassigned
    rep_dim=4,
    tangent_dim=2,
    oplus=_line2d_oplus,
    tags=("VERTEX_LINE2D",),
))


def _edge_se2_segment2d_residual(states, meas, param):
    x, seg = states
    inv = lie.se2_inverse(x)
    e1 = lie.se2_act(inv, seg[..., 0:2])
    e2 = lie.se2_act(inv, seg[..., 2:4])
    return jnp.concatenate([e1, e2], axis=-1) - meas


EdgeSE2Segment2D = register_edge(EdgeType(
    name="EDGE_SE2_SEGMENT2D",
    vertex_types=(VertexSE2, VertexSegment2D),
    residual_dim=4,
    residual=_edge_se2_segment2d_residual,
    meas_dim=4,
    tags=("EDGE_SE2_SEGMENT2D",),
))


def _segment_line_frame(x, seg):
    """Observed segment endpoints + supporting-line (theta, rho)."""
    inv = lie.se2_inverse(x)
    p1 = lie.se2_act(inv, seg[..., 0:2])
    p2 = lie.se2_act(inv, seg[..., 2:4])
    dp = p2 - p1
    n = jnp.stack([dp[..., 1], -dp[..., 0]], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    theta = jnp.arctan2(n[..., 1], n[..., 0])
    rho = 0.5 * (jnp.sum(p1 * n, axis=-1) + jnp.sum(p2 * n, axis=-1))
    return p1, p2, theta, rho


def _edge_se2_segment2d_line_residual(states, meas, param):
    """Segment observed as its supporting line
    (``edge_se2_segment2d_line.h:51-65``)."""
    x, seg = states
    _, _, theta, rho = _segment_line_frame(x, seg)
    e_theta = lie.normalize_angle(theta - meas[..., 0])
    e_rho = rho - meas[..., 1]
    return jnp.stack([e_theta, e_rho], axis=-1)


EdgeSE2Segment2DLine = register_edge(EdgeType(
    name="EDGE_SE2_SEGMENT2D_LINE",
    vertex_types=(VertexSE2, VertexSegment2D),
    residual_dim=2,
    residual=_edge_se2_segment2d_line_residual,
    meas_dim=2,
    tags=("EDGE_SE2_SEGMENT2D_LINE",),
))


def _make_segment2d_pointline(point_num: int):
    def residual(states, meas, param):
        """One endpoint + the supporting-line direction
        (``edge_se2_segment2d_pointLine.h:53-68``)."""
        x, seg = states
        p1, p2, theta, _ = _segment_line_frame(x, seg)
        pt = p1 if point_num == 0 else p2
        e_pt = pt - meas[..., 0:2]
        e_theta = lie.normalize_angle(theta - meas[..., 2])
        return jnp.concatenate([e_pt, e_theta[..., None]], axis=-1)

    return residual


EdgeSE2Segment2DPointLine = register_edge(EdgeType(
    name="EDGE_SE2_SEGMENT2D_POINTLINE",
    vertex_types=(VertexSE2, VertexSegment2D),
    residual_dim=3,
    residual=_make_segment2d_pointline(0),
    meas_dim=3,
    tags=("EDGE_SE2_SEGMENT2D_POINTLINE",),
))

# the reference selects the endpoint via a per-edge _pointNum member; the
# second endpoint gets its own registered specialization
EdgeSE2Segment2DPointLine1 = register_edge(EdgeType(
    name="EDGE_SE2_SEGMENT2D_POINTLINE_P1",
    vertex_types=(VertexSE2, VertexSegment2D),
    residual_dim=3,
    residual=_make_segment2d_pointline(1),
    meas_dim=3,
    tags=("EDGE_SE2_SEGMENT2D_POINTLINE_P1",),
))


def _edge_se2_line2d_residual(states, meas, param):
    x, line = states
    inv = lie.se2_inverse(x)
    theta = lie.normalize_angle(line[..., 0] + inv[..., 2])
    n = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    rho = line[..., 1] + jnp.sum(n * inv[..., :2], axis=-1)
    err_theta = lie.normalize_angle(theta - meas[..., 0])
    err_rho = rho - meas[..., 1]
    return jnp.stack([err_theta, err_rho], axis=-1)


EdgeSE2Line2D = register_edge(EdgeType(
    name="EDGE_SE2_LINE2D",
    vertex_types=(VertexSE2, VertexLine2D),
    residual_dim=2,
    residual=_edge_se2_line2d_residual,
    meas_dim=2,
    tags=("EDGE_SE2_LINE2D",),
))


def _edge_line2d_residual(states, meas, param):
    l1, l2 = states
    return (l2[..., :2] - l1[..., :2]) - meas


EdgeLine2D = register_edge(EdgeType(
    name="EDGE_LINE2D",
    vertex_types=(VertexLine2D, VertexLine2D),
    residual_dim=2,
    residual=_edge_line2d_residual,
    meas_dim=2,
    tags=("EDGE_LINE2D",),
))


def _edge_line2d_pointxy_residual(states, meas, param):
    # point-on-line scalar error: n(theta)·p − rho − z
    # (reference ``slam2d_addons/edge_line2d_pointxy.h:48-52``)
    l, p = states
    theta, rho = l[..., 0], l[..., 1]
    pred = (jnp.cos(theta) * p[..., 0] + jnp.sin(theta) * p[..., 1]) - rho
    return (pred - meas[..., 0])[..., None]


EdgeLine2DPointXY = register_edge(EdgeType(
    name="EDGE_LINE2D_POINTXY",
    vertex_types=(VertexLine2D, VertexPointXY),
    residual_dim=1,
    residual=_edge_line2d_pointxy_residual,
    meas_dim=1,
    tags=("EDGE_LINE2D_POINTXY",),
))

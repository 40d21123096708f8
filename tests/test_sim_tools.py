"""The simulator companion tools: g2o_anonymize_observations and
convertSegmentLine counterparts."""

import io

import numpy as np

import g2o_tpu.types  # noqa: F401
from g2o_tpu.apps.anonymize import UNASSIGNED, anonymize
from g2o_tpu.apps.convert_segment_line import convert, line_parameters
from g2o_tpu.io import g2o_format


def test_anonymize_detaches_closures_and_landmarks():
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=300, seed=1)
    edges = list(g.edges())
    closures = sum(1 for e in edges if e.etype.name == "EDGE_SE2"
                   and abs(e.vids[0] - e.vids[1]) > 1)
    assert closures > 0
    n = anonymize(g)
    assert n == closures
    for e in g.edges():
        if e.etype.name == "EDGE_SE2":
            a, b = e.vids
            assert abs(a - b) <= 1 or UNASSIGNED in (a, b)
    # odometry chain intact
    odo = sum(1 for e in g.edges() if e.etype.name == "EDGE_SE2"
              and UNASSIGNED not in e.vids)
    assert odo >= 299 - 1
    # saved output carries the reference's UnassignedId (-1)
    buf = io.StringIO()
    g2o_format.save(g, buf)
    assert " -1 " in buf.getvalue()


def test_anonymize_landmark_edges():
    from g2o_tpu.core.graph import Graph
    from g2o_tpu.types.slam2d import EdgeSE2PointXY, VertexPointXY, VertexSE2

    g = Graph()
    g.add_vertex(0, VertexSE2, np.zeros(3), fixed=True)
    g.add_vertex(1, VertexPointXY, np.array([1.0, 0.0]))
    g.add_edge(EdgeSE2PointXY, [0, 1], np.array([1.0, 0.0]), np.eye(2))
    assert anonymize(g) == 1
    (e,) = list(g.edges())
    assert e.vids[1] == UNASSIGNED


def _segment_world(n_poses=8, n_segments=3, seed=0):
    from g2o_tpu.core.graph import Graph
    from g2o_tpu.ops import lie as _lie  # noqa: F401
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2
    from g2o_tpu.types.slam2d_addons import (EdgeSE2Segment2D,
                                             VertexSegment2D)
    import jax.numpy as jnp

    from g2o_tpu.ops import lie

    rng = np.random.default_rng(seed)
    poses = []
    steps = []
    x = np.zeros(3)
    g = Graph()
    for i in range(n_poses):
        g.add_vertex(i, VertexSE2, x)
        poses.append(x.copy())
        step = np.array([1.0, 0.0, rng.normal() * 0.2])
        steps.append(step)
        x = np.asarray(lie.se2_compose(jnp.asarray(x), jnp.asarray(step)))
    for i in range(n_poses - 1):
        g.add_edge(EdgeSE2, [i, i + 1], steps[i], np.eye(3) * 100)
    segs = []
    for k in range(n_segments):
        p1 = rng.normal(size=2) * 3 + np.array([k * 2.0, 3.0])
        p2 = p1 + rng.normal(size=2)
        vid = 100 + k
        g.add_vertex(vid, VertexSegment2D, np.concatenate([p1, p2]))
        segs.append((vid, p1, p2))
    for i, x in enumerate(poses):
        inv = np.asarray(lie.se2_inverse(jnp.asarray(x)))
        for vid, p1, p2 in segs:
            m1 = np.asarray(lie.se2_act(jnp.asarray(inv), jnp.asarray(p1)))
            m2 = np.asarray(lie.se2_act(jnp.asarray(inv), jnp.asarray(p2)))
            g.add_edge(EdgeSE2Segment2D, [i, vid],
                       np.concatenate([m1, m2]), np.eye(4) * 10)
    return g


def test_convert_segment_line_zero_residual():
    """A noise-free segment world converts to a line world whose chi2 is
    already ~0 (line params + endpoint observations all consistent)."""
    g = _segment_world()
    out = convert(g)
    names = {e.etype.name for e in out.edges()}
    assert "EDGE_SE2_LINE2D" in names
    assert "EDGE_LINE2D_POINTXY" in names
    assert "EDGE_SE2_XY" in names
    # every line vertex carries its endpoint ids (reference p1Id/p2Id)
    nlines = 0
    for vid, rec in out.vertices().items():
        if rec.vtype.name == "VERTEX_LINE2D":
            nlines += 1
            assert rec.estimate[2] >= 0 and rec.estimate[3] >= 0
    assert nlines == 3
    p = out.compile()
    chi2, _ = p.chi2_jit(p.data, p.estimates)
    assert float(chi2) < 1e-8

    # round-trips through the text format
    buf = io.StringIO()
    g2o_format.save(out, buf)
    g2 = g2o_format.load(io.StringIO(buf.getvalue()))
    p2 = g2.compile()
    chi2b, _ = p2.chi2_jit(p2.data, p2.estimates)
    assert float(chi2b) < 1e-6


def test_line_parameters_matches_point_on_line():
    rng = np.random.default_rng(3)
    for _ in range(5):
        p1, p2 = rng.normal(size=2), rng.normal(size=2)
        theta, rho = line_parameters(p1, p2)
        n = np.array([np.cos(theta), np.sin(theta)])
        assert abs(n @ p1 - rho) < 1e-12
        assert abs(n @ p2 - rho) < 1e-12

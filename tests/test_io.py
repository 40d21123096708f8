import numpy as np

from g2o_tpu.io import g2o_format
import g2o_tpu.types  # noqa: F401

SAMPLE = """\
VERTEX_SE2 0 0.0 0.0 0.0
FIX 0
VERTEX_SE2 1 1.0 0.1 0.2
VERTEX_XY 2 2.0 3.0
EDGE_SE2 0 1 1.0 0.0 0.2 100 0 0 100 0 400
EDGE_SE2_XY 1 2 0.5 0.7 50 0 50
"""


def test_load():
    g = g2o_format.loads(SAMPLE)
    assert g.num_vertices == 3
    assert g.num_edges == 2
    assert g.vertex(0).fixed
    assert not g.vertex(1).fixed
    np.testing.assert_allclose(g.vertex(1).estimate, [1.0, 0.1, 0.2])
    e = g.edges()[0]
    np.testing.assert_allclose(e.information,
                               np.diag([100.0, 100.0, 400.0]))
    e2 = g.edges()[1]
    np.testing.assert_allclose(e2.information, np.diag([50.0, 50.0]))


def test_roundtrip():
    g = g2o_format.loads(SAMPLE)
    text = g2o_format.dumps(g)
    g2 = g2o_format.loads(text)
    assert g2.num_vertices == g.num_vertices
    assert g2.num_edges == g.num_edges
    for vid in (0, 1, 2):
        np.testing.assert_allclose(g2.vertex(vid).estimate,
                                   g.vertex(vid).estimate)
        assert g2.vertex(vid).fixed == g.vertex(vid).fixed
    for a, b in zip(g.edges(), g2.edges()):
        assert a.vids == b.vids
        np.testing.assert_allclose(a.measurement, b.measurement)
        np.testing.assert_allclose(a.information, b.information)


def test_se3_roundtrip():
    g = g2o_format.loads(
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "VERTEX_SE3:QUAT 1 1 2 3 0.1 0.2 0.3 0.927361849549\n"
        "EDGE_SE3:QUAT 0 1 1 2 3 0.1 0.2 0.3 0.927361849549 "
        + " ".join(["1" if i in (0, 6, 11, 15, 18, 20) else "0"
                    for i in range(21)])
        + "\n"
    )
    assert g.num_vertices == 2
    e = g.edges()[0]
    np.testing.assert_allclose(e.information, np.eye(6))
    text = g2o_format.dumps(g)
    g2 = g2o_format.loads(text)
    np.testing.assert_allclose(g2.edges()[0].measurement, e.measurement)
    np.testing.assert_allclose(g2.edges()[0].information, np.eye(6))


def test_params_and_param_edges():
    txt = (
        "PARAMS_SE3OFFSET 0 0 0 0 0 0 0 1\n"
        "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "VERTEX_TRACKXYZ 1 1 2 3\n"
        "EDGE_SE3_TRACKXYZ 0 1 0 1 2 3 1 0 0 1 0 1\n"
    )
    g = g2o_format.loads(txt)
    assert g.num_edges == 1
    e = g.edges()[0]
    assert e.param_id == (0,)
    np.testing.assert_allclose(g.parameter(0), [0, 0, 0, 0, 0, 0, 1])
    out = g2o_format.dumps(g)
    g2 = g2o_format.loads(out)
    assert g2.edges()[0].param_id == (0,)


def test_dynamic_arity_lotsofxy_roundtrip():
    """Variable-arity 'EDGE_SE2_LOTSOFXY ids || k meas info' lines
    (reference ``optimizable_graph.cpp:575-590`` dynamic multi-edge path +
    ``edge_se2_lotsofxy.cpp`` read/write)."""
    import numpy as np

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.types.slam2d import (VertexPointXY, VertexSE2,
                                      make_edge_se2_lots_of_xy)

    g = Graph()
    g.add_vertex(0, VertexSE2, [0.1, -0.2, 0.3], fixed=True)
    for i in range(3):
        g.add_vertex(10 + i, VertexPointXY, [1.0 + i, 2.0 - i])
    meas = np.arange(6) * 0.5
    info = np.eye(6) + 0.1
    g.add_edge(make_edge_se2_lots_of_xy(3), [0, 10, 11, 12], meas, info)
    text = g2o_format.dumps(g)
    assert "EDGE_SE2_LOTSOFXY 0 10 11 12 || 3 " in text
    g2 = g2o_format.loads(text)
    e = g2.edges()[0]
    assert e.etype.name == "EDGE_SE2_LOTSOFXY_3"
    np.testing.assert_allclose(e.measurement, meas)
    np.testing.assert_allclose(e.information, info)


def test_deprecated_slam3d_tags():
    """DEPRECATED_* tag spellings load as the modern types (reference
    ``types/deprecated/slam3d/types_slam3d.cpp:39-52``)."""
    text = """DEPRECATED_VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1
DEPRECATED_VERTEX_SE3:QUAT 1 1 0 0 0 0 0 1
FIX 0
DEPRECATED_EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 1 0 0 0 0 0 1 0 0 0 0 1 0 0 0 1 0 0 1 0 0 1
"""
    g = g2o_format.loads(text)
    assert g.num_vertices == 2 and g.num_edges == 1
    assert g.edges()[0].etype.name == "EDGE_SE3:QUAT"


def test_save_subset_vertices():
    """saveSubset vset overload (optimizable_graph.cpp:719): only subset
    vertices, only edges fully inside the subset."""
    g = g2o_format.loads(SAMPLE)
    text = g2o_format.dumps(g, vertex_subset=[0, 1])
    g2 = g2o_format.loads(text)
    assert sorted(g2.vertices()) == [0, 1]
    assert g2.num_edges == 1           # EDGE_SE2_XY touches vertex 2 -> out
    assert g2.edges()[0].vids == (0, 1)
    assert g2.vertex(0).fixed


def test_save_subset_edges():
    """saveSubset eset overload (optimizable_graph.cpp:749): the given
    edges plus exactly their vertices."""
    g = g2o_format.loads(SAMPLE)
    eset = [e for e in g.edges() if 2 in e.vids]
    text = g2o_format.dumps(g, edge_subset=eset)
    g2 = g2o_format.loads(text)
    assert sorted(g2.vertices()) == [1, 2]
    assert g2.num_edges == 1
    assert g2.edges()[0].vids == (1, 2)


def test_save_level_filter():
    """save(level=) writes only edges at that level
    (optimizable_graph.cpp:681)."""
    from g2o_tpu.core.graph import Graph
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    g = Graph()
    g.add_vertex(0, VertexSE2, np.zeros(3))
    g.add_vertex(1, VertexSE2, np.array([1.0, 0, 0]))
    g.add_edge(EdgeSE2, [0, 1], np.array([1.0, 0, 0]), np.eye(3), level=0)
    g.add_edge(EdgeSE2, [0, 1], np.array([1.1, 0, 0]), np.eye(3), level=1)
    t0 = g2o_format.dumps(g, level=0)
    t1 = g2o_format.dumps(g, level=1)
    assert g2o_format.loads(t0).num_edges == 1
    assert g2o_format.loads(t1).num_edges == 1
    np.testing.assert_allclose(
        g2o_format.loads(t1).edges()[0].measurement[0], 1.1)

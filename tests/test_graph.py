"""Graph bookkeeping — analogue of ``unit_test/general/graph_operations.cpp``."""

import numpy as np
import pytest

from g2o_tpu.core.graph import Graph
from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2, VertexPointXY


def test_add_remove():
    g = Graph()
    g.add_vertex(0, VertexSE2, [0, 0, 0])
    g.add_vertex(1, VertexSE2, [1, 0, 0])
    g.add_edge(EdgeSE2, [0, 1], [1, 0, 0], np.eye(3))
    assert g.num_vertices == 2 and g.num_edges == 1
    assert g.remove_vertex(1)
    assert g.num_vertices == 1 and g.num_edges == 0
    assert not g.remove_vertex(99)


def test_duplicate_vertex_rejected():
    g = Graph()
    g.add_vertex(0, VertexSE2, [0, 0, 0])
    with pytest.raises(ValueError):
        g.add_vertex(0, VertexSE2, [1, 1, 1])


def test_type_checks():
    g = Graph()
    g.add_vertex(0, VertexSE2, [0, 0, 0])
    g.add_vertex(1, VertexPointXY, [0, 0])
    with pytest.raises(ValueError):
        g.add_edge(EdgeSE2, [0, 1], [1, 0, 0], np.eye(3))
    with pytest.raises(ValueError):
        g.add_edge(EdgeSE2, [0, 7], [1, 0, 0], np.eye(3))
    with pytest.raises(ValueError):
        g.add_vertex(2, VertexSE2, [1, 2])


def test_compile_layout():
    g = Graph()
    g.add_vertex(3, VertexSE2, [0, 0, 0], fixed=True)
    g.add_vertex(1, VertexSE2, [1, 0, 0])
    g.add_vertex(2, VertexPointXY, [5, 5])
    g.add_edge(EdgeSE2, [3, 1], [1, 0, 0], np.eye(3))
    p = g.compile()
    assert p.total_dim == 3 + 3 + 2
    assert p.counts == {"VERTEX_SE2": 2, "VERTEX_XY": 1}
    # sorted by vid: 1 -> idx 0, 3 -> idx 1
    assert p.vid_index[1] == ("VERTEX_SE2", 0)
    assert p.vid_index[3] == ("VERTEX_SE2", 1)
    assert p.vid_index[2] == ("VERTEX_XY", 0)
    est = p.get_estimate(2)
    np.testing.assert_allclose(est, [5, 5])


def test_set_robust_kernel():
    g = Graph()
    g.add_vertex(0, VertexSE2, [0, 0, 0])
    g.add_vertex(1, VertexSE2, [1, 0, 0])
    g.add_edge(EdgeSE2, [0, 1], [1, 0, 0], np.eye(3))
    g.set_robust_kernel("Huber", 2.0)
    assert g.edges()[0].kernel == 1
    assert g.edges()[0].delta == 2.0

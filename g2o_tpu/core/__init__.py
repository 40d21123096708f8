from g2o_tpu.core.graph import Graph
from g2o_tpu.core.problem import Problem, compile_graph
from g2o_tpu.core.types import (
    EdgeType,
    VertexType,
    REGISTRY,
    register_edge,
    register_vertex,
)

__all__ = [
    "Graph",
    "Problem",
    "compile_graph",
    "EdgeType",
    "VertexType",
    "REGISTRY",
    "register_edge",
    "register_vertex",
]

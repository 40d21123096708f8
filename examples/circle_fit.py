"""Circle fitting — analogue of the reference
``examples/data_fitting/circle_fit.cpp``: fit center + radius to noisy
points on a circle.

Run: python examples/circle_fit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from g2o_tpu.core.graph import Graph
from g2o_tpu.core.optimizer import LevenbergMarquardt, SparseOptimizer
from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.core.types import EdgeType, VertexType

VertexCircle = VertexType(
    name="circle",
    rep_dim=3,            # (cx, cy, r)
    tangent_dim=3,
    oplus=lambda x, d: x + d,
)


def circle_residual(states, meas, param):
    (c,) = states
    return (jnp.linalg.norm(meas - c[:2]) - c[2])[None]


EdgeCirclePoint = EdgeType(
    name="circle_point",
    vertex_types=(VertexCircle,),
    residual_dim=1,
    residual=circle_residual,
    meas_dim=2,
)


def main():
    center, radius = np.array([4.0, 2.0]), 2.0
    rng = np.random.default_rng(1)
    th = rng.uniform(0, 2 * np.pi, 100)
    pts = center + (radius + rng.normal(scale=0.05, size=th.shape))[:, None] \
        * np.stack([np.cos(th), np.sin(th)], axis=1)

    g = Graph()
    g.add_vertex(0, VertexCircle, [3.0, 3.0, 3.0])
    for pt in pts:
        g.add_edge(EdgeCirclePoint, [0], pt, np.eye(1))
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    opt.optimize(20)
    est = p.get_estimate(0)
    print(f"truth:    center=({center[0]}, {center[1]}) r={radius}")
    print(f"estimate: center=({est[0]:.4f}, {est[1]:.4f}) r={est[2]:.4f}")
    return est


if __name__ == "__main__":
    main()

"""Differential-drive odometry calibration — analogue of the reference
``examples/calibration_odom_laser`` flow (simplified): given ground-truth
poses (e.g. from scan matching) and raw wheel velocities, estimate the
wheel factors and baseline with the sclam2d calibration edge.

Run: python examples/odom_calibration.py
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
from g2o_tpu.ops import lie
from g2o_tpu.types.sclam2d import (
    EdgeSE2OdomDifferentialCalib,
    VertexOdomDifferentialParams,
    velocity_to_motion,
)
from g2o_tpu.types.slam2d import VertexSE2


def main():
    params_gt = np.array([0.96, 1.03, 0.55])   # k_left, k_right, baseline
    rng = np.random.default_rng(0)
    g = Graph()
    poses = [np.zeros(3)]
    meas = []
    for i in range(60):
        vl = 0.8 + 0.4 * rng.random()
        vr = 0.8 + 0.4 * rng.random()
        dt = 0.25
        motion = np.asarray(velocity_to_motion(
            jnp.asarray(vl * params_gt[0]), jnp.asarray(vr * params_gt[1]),
            jnp.asarray(dt), jnp.asarray(params_gt[2])))
        poses.append(np.asarray(
            lie.se2_compose(jnp.asarray(poses[-1]), jnp.asarray(motion))))
        meas.append((vl, vr, dt))
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x, fixed=True)  # poses known (laser gt)
    g.add_vertex(999, VertexOdomDifferentialParams, [1.0, 1.0, 0.5])
    for i, m in enumerate(meas):
        g.add_edge(EdgeSE2OdomDifferentialCalib, [i, i + 1, 999], m,
                   np.eye(3) * 10)
    p = g.compile()
    opt = SparseOptimizer(p, algorithm=LevenbergMarquardt(),
                          solver=DenseSolver())
    opt.optimize(50)
    est = p.get_estimate(999)
    print(f"truth:    k_l={params_gt[0]} k_r={params_gt[1]} b={params_gt[2]}")
    print(f"estimate: k_l={est[0]:.4f} k_r={est[1]:.4f} b={est[2]:.4f}")


if __name__ == "__main__":
    main()

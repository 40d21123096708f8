"""CLI app + spanning-tree initial guess."""

import json
import os

import numpy as np
import pytest

from g2o_tpu.apps import cli
from g2o_tpu.core.initial_guess import compute_initial_guess
from g2o_tpu.io import g2o_format
from g2o_tpu.sim.generators import create_manhattan, create_sphere
import g2o_tpu.types  # noqa: F401


def test_initial_guess_se2():
    g = create_manhattan(n_poses=60, seed=5)
    # scramble the non-fixed estimates
    for vid, rec in g.vertices().items():
        if not rec.fixed:
            rec.estimate = np.zeros(3)
    n = compute_initial_guess(g)
    assert n == 59
    p = g.compile()
    from g2o_tpu.core.optimizer import SparseOptimizer
    from g2o_tpu.core.solvers import DenseSolver

    opt = SparseOptimizer(p, solver=DenseSolver())
    # odometry-propagated guess must be a sane starting point
    chi0 = opt.chi2()
    opt.optimize(10)
    assert opt.chi2() < chi0


def test_initial_guess_se3():
    g = create_sphere(nodes_per_level=8, laps=3, radius=10.0, seed=6)
    for vid, rec in g.vertices().items():
        if not rec.fixed:
            rec.estimate = np.array([0, 0, 0, 0, 0, 0, 1.0])
    n = compute_initial_guess(g)
    assert n == 23


def test_cli_end_to_end(tmp_path):
    g = create_manhattan(n_poses=50, seed=8)
    inp = str(tmp_path / "in.g2o")
    out = str(tmp_path / "out.g2o")
    summary = str(tmp_path / "summary.jsonl")
    stats = str(tmp_path / "stats.jsonl")
    g2o_format.save(g, inp)
    rc = cli.main(["-i", "10", "-solver", "lm_pcg", "-robustKernel", "Huber",
                   "-o", out, "-stats", stats, "-summary", summary, inp])
    assert rc == 0
    assert os.path.exists(out)
    row = json.loads(open(summary).read().strip().splitlines()[-1])
    assert row["iterations"] >= 1
    srow = json.loads(open(stats).read().splitlines()[0])
    assert "chi2" in srow
    # output parses back
    g2 = g2o_format.load(out)
    assert g2.num_vertices == 50


def test_cli_gain_termination(tmp_path):
    g = create_manhattan(n_poses=50, seed=8)
    inp = str(tmp_path / "in.g2o")
    summary = str(tmp_path / "summary.jsonl")
    g2o_format.save(g, inp)
    rc = cli.main(["-i", "-50", "-solver", "lm_dense", "-summary", summary,
                   inp])
    assert rc == 0
    row = json.loads(open(summary).read().strip().splitlines()[-1])
    assert row["iterations"] < 50


def test_cli_lists(capsys):
    assert cli.main(["-listSolvers"]) == 0
    out = capsys.readouterr().out
    assert "lm_pcg" in out and "gn_dense" in out and "dl_cgls" in out
    assert cli.main(["-listKernels"]) == 0
    out = capsys.readouterr().out
    assert "Huber" in out and "DCS" in out
    assert cli.main(["-listTypes"]) == 0
    out = capsys.readouterr().out
    assert "VERTEX_SE2" in out and "EDGE_SIM3:EXPMAP" in out


def test_cli_unknown_solver(tmp_path):
    g = create_manhattan(n_poses=10, seed=8)
    inp = str(tmp_path / "in.g2o")
    g2o_format.save(g, inp)
    assert cli.main(["-solver", "bogus", inp]) == 1


def test_slam2d_linear_init():
    from g2o_tpu.core.slam2d_linear import solve_slam2d_linear

    g = create_manhattan(n_poses=200, seed=12)
    for vid, rec in g.vertices().items():
        if not rec.fixed:
            rec.estimate = np.zeros(3)
    p0 = g.compile()
    import jax
    chi_zeros = float(p0.chi2_jit(p0.data, p0.estimates)[0])
    n = solve_slam2d_linear(g)
    assert n == 200
    p1 = g.compile()
    chi_lin = float(p1.chi2_jit(p1.data, p1.estimates)[0])
    # the linear init must land near the optimum (Carlone et al. property)
    assert chi_lin < 1e-2 * chi_zeros


def test_cli_rename_and_properties(tmp_path, capsys):
    g = create_manhattan(n_poses=30, seed=9)
    inp = str(tmp_path / "in.g2o")
    g2o_format.save(g, inp)
    # rewrite tags to a foreign alias and load via -renameTypes
    text = open(inp).read().replace("VERTEX_SE2", "VERTEX_SE2_ALIEN") \
                           .replace("EDGE_SE2", "EDGE_SE2_ALIEN")
    open(inp, "w").write(text)
    rc = cli.main(["-i", "5", "-solver", "lm_pcg",
                   "-renameTypes",
                   "VERTEX_SE2_ALIEN=VERTEX_SE2,EDGE_SE2_ALIEN=EDGE_SE2",
                   "-solverProperties", "max_iter=37,tol=1e-7",
                   "-printSolverProperties", inp])
    assert rc == 0


def test_cli_ate_report(tmp_path, capsys):
    g = create_manhattan(n_poses=40, seed=10)
    inp = str(tmp_path / "in.g2o")
    gt = str(tmp_path / "gt.g2o")
    g2o_format.save(g, inp)
    g2o_format.save(g, gt)   # ground truth == noisy input; ATE finite
    rc = cli.main(["-i", "5", "-solver", "lm_pcg", "-gt", gt, inp])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "ATE(rmse)=" in outp


def test_cli_incremental(tmp_path):
    g = create_manhattan(n_poses=40, seed=11)
    inp = str(tmp_path / "in.g2o")
    out = str(tmp_path / "out.g2o")
    g2o_format.save(g, inp)
    rc = cli.main(["-inc", "-update", "15", "-incIterations", "1",
                   "-solver", "lm_pcg", "-o", out, inp])
    assert rc == 0
    g2 = g2o_format.load(out)
    assert g2.num_vertices == g.num_vertices


def test_hyper_dijkstra_costs():
    """Pluggable-cost traversal (reference hyper_dijkstra.h:77-88)."""
    from g2o_tpu.core.initial_guess import hyper_dijkstra
    from g2o_tpu.core.graph import Graph
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    g = Graph()
    for i in range(4):
        g.add_vertex(i, VertexSE2, [float(i), 0, 0], fixed=(i == 0))
    info = np.eye(3)
    # chain 0-1-2-3 plus a shortcut 0-3
    for i in range(3):
        g.add_edge(EdgeSE2, [i, i + 1], [1.0, 0, 0], info)
    g.add_edge(EdgeSE2, [0, 3], [3.0, 0, 0], info)

    dist, parent = hyper_dijkstra(g, [0])
    assert dist[3] == 1.0          # uniform cost takes the shortcut
    assert parent[0] is None and parent[3][1] == 0

    # translation-norm cost: the shortcut (3.0) equals the chain (3 x 1.0);
    # penalize long edges quadratically so the chain wins
    def cost(e, frm, to):
        return float(np.linalg.norm(e.measurement[:2]) ** 2)

    dist2, parent2 = hyper_dijkstra(g, [0], cost=cost)
    assert dist2[3] == 3.0 and parent2[3][1] == 2

    # forbidding edges via inf cost
    dist3, _ = hyper_dijkstra(g, [0],
                              cost=lambda e, f, t: float("inf"))
    assert set(dist3) == {0}

    # max_distance cutoff
    dist4, _ = hyper_dijkstra(
        g, [0], cost=lambda e, f, t: 1.0
        if abs(f - t) == 1 else float("inf"), max_distance=2.0)
    assert set(dist4) == {0, 1, 2}


def test_guess_dijkstra_relaxation():
    """A vertex discovered first through an expensive loop-closure must be
    re-parented (and initialised) through the cheaper odometry chain —
    the reference EstimatePropagator relaxes; the old implementation
    pinned the first discovery."""
    import numpy as np

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.core.initial_guess import compute_initial_guess
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    g = Graph()
    # chain 0-1-2-3 with identity-ish odometry + a WRONG direct edge 0-3
    gt = [np.array([float(i), 0.0, 0.0]) for i in range(4)]
    for i, x in enumerate(gt):
        g.add_vertex(i, VertexSE2, np.zeros(3), fixed=(i == 0))
    g.set_estimate(0, gt[0])
    for i in range(3):
        g.add_edge(EdgeSE2, [i, i + 1], [1.0, 0.0, 0.0], np.eye(3))
    g.add_edge(EdgeSE2, [0, 3], [99.0, 0.0, 0.0], np.eye(3))  # loop closure

    def cost(e, frm, to):
        # loop closures expensive, odometry cheap
        return 10.0 if abs(e.vids[0] - e.vids[1]) > 1 else 1.0

    n = compute_initial_guess(g, cost=cost)
    assert n == 3
    # vertex 3 must come through the odometry chain (x = 3), NOT the
    # 99-meter loop closure
    assert abs(g.vertex(3).estimate[0] - 3.0) < 1e-9


def test_guess_unary_prior_and_pose_root_fallback():
    import numpy as np

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.core.initial_guess import compute_initial_guess
    from g2o_tpu.types.slam2d import (EdgeSE2, EdgeSE2Prior, EdgeSE2PointXY,
                                      VertexPointXY, VertexSE2)

    # (a) unary prior pins its vertex and seeds propagation (no fixed)
    g = Graph()
    g.add_vertex(0, VertexSE2, np.zeros(3))
    g.add_vertex(1, VertexSE2, np.zeros(3))
    g.add_edge(EdgeSE2Prior, [0], [5.0, 1.0, 0.2], np.eye(3))
    g.add_edge(EdgeSE2, [0, 1], [1.0, 0.0, 0.0], np.eye(3))
    n = compute_initial_guess(g)
    assert n == 2
    assert abs(g.vertex(0).estimate[0] - 5.0) < 1e-9
    assert g.vertex(1).estimate[0] > 5.5

    # (b) landmark occupies the lowest id, nothing fixed: the fallback
    # root must be the pose (largest tangent dim), not the landmark
    g2 = Graph()
    g2.add_vertex(0, VertexPointXY, [0.0, 0.0])
    g2.add_vertex(1, VertexSE2, [2.0, 0.0, 0.0])
    g2.add_vertex(2, VertexSE2, np.zeros(3))
    g2.add_edge(EdgeSE2PointXY, [1, 0], [1.0, 1.0], np.eye(2))
    g2.add_edge(EdgeSE2, [1, 2], [1.0, 0.0, 0.0], np.eye(3))
    n2 = compute_initial_guess(g2)
    assert n2 == 2            # landmark + second pose, from the pose root
    assert abs(g2.vertex(0).estimate[0] - 3.0) < 1e-9  # se2_act from pose 1
    assert abs(g2.vertex(2).estimate[0] - 3.0) < 1e-9

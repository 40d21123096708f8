"""Properties, tictoc, export, iteration hooks, addons types."""

import os

import numpy as np
import pytest

from g2o_tpu.core.optimizer import SparseOptimizer
from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.io.export import write_dot, write_gnuplot
from g2o_tpu.sim.generators import create_manhattan
from g2o_tpu.utils import PropertyMap, tictoc


def test_property_map():
    pm = PropertyMap()
    pm.make_property("maxIterations", 10)
    pm.make_property("lambdaInit", 1e-5)
    assert pm.update_from_string("maxIterations=25,lambdaInit=0.5") == 2
    assert pm.get_value("maxIterations") == 25
    assert pm.get_value("lambdaInit") == 0.5
    with pytest.raises(KeyError):
        pm.update_from_string("bogus=1")
    with pytest.raises(ValueError):
        pm.update_from_string("noequals")


def test_tictoc(monkeypatch):
    monkeypatch.setenv("G2O_ENABLE_TICTOC", "1")
    tictoc.reset()
    with tictoc.tictoc("foo"):
        pass
    with tictoc.tictoc("foo"):
        pass
    s = tictoc.stats()
    assert s["foo"]["count"] == 2
    assert s["foo"]["total"] >= 0


def test_tictoc_disabled(monkeypatch):
    monkeypatch.delenv("G2O_ENABLE_TICTOC", raising=False)
    tictoc.reset()
    tictoc.tic("x")
    tictoc.toc("x")
    assert tictoc.stats() == {}


def test_export(tmp_path):
    g = create_manhattan(n_poses=20, seed=1)
    gp = str(tmp_path / "g.dat")
    dp = str(tmp_path / "g.dot")
    write_gnuplot(g, gp)
    write_dot(g, dp, max_edges=10)
    dat = open(gp).read()
    assert "# edges" in dat and "# vertices" in dat
    dot = open(dp).read()
    assert dot.startswith("graph g2o") and "v0 --" in dot


def test_iteration_hooks():
    g = create_manhattan(n_poses=15, seed=2)
    p = g.compile()
    opt = SparseOptimizer(p, solver=DenseSolver())
    seen = []
    opt.pre_iteration_actions.append(lambda o, i: seen.append(("pre", i)))
    opt.post_iteration_actions.append(lambda o, i: seen.append(("post", i)))
    opt.optimize(3)
    assert ("pre", 0) in seen and ("post", 2) in seen
    assert len(seen) == 6


def test_plane_types():
    import jax.numpy as jnp

    from g2o_tpu.types.slam3d_addons import (
        plane_ominus, plane_oplus, plane_transform,
    )

    c = jnp.asarray([0.0, 0.0, 1.0, -2.0])  # z=2 plane
    # oplus zero is identity
    np.testing.assert_allclose(np.asarray(plane_oplus(c, jnp.zeros(3))), c,
                               atol=1e-12)
    # ominus of itself is zero
    np.testing.assert_allclose(np.asarray(plane_ominus(c, c)), 0, atol=1e-12)
    # transform by +1z translation: coeff3' = coeff3 - t.n (reference
    # ``plane3d.h:121-128``) -> plane moves to z=3
    x = jnp.asarray([0.0, 0, 1.0, 0, 0, 0, 1])
    c2 = np.asarray(plane_transform(x, c))
    np.testing.assert_allclose(c2, [0, 0, 1, -3.0], atol=1e-12)


def test_segment_line_optimize():
    import jax.numpy as jnp

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.ops import lie
    from g2o_tpu.types.slam2d import VertexSE2
    from g2o_tpu.types.slam2d_addons import (
        EdgeSE2Segment2D, VertexSegment2D,
    )

    rng = np.random.default_rng(5)
    seg_gt = np.array([1.0, 2.0, 3.0, 2.5])
    poses = [np.array([0.0, 0, 0]), np.array([0.5, -0.3, 0.4])]
    g = Graph()
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x, fixed=True)
    g.add_vertex(10, VertexSegment2D, seg_gt + rng.normal(scale=0.3, size=4))
    for i, x in enumerate(poses):
        inv = lie.se2_inverse(jnp.asarray(x))
        m = np.concatenate([
            np.asarray(lie.se2_act(inv, jnp.asarray(seg_gt[:2]))),
            np.asarray(lie.se2_act(inv, jnp.asarray(seg_gt[2:]))),
        ])
        g.add_edge(EdgeSE2Segment2D, [i, 10], m, np.eye(4) * 10)
    p = g.compile()
    opt = SparseOptimizer(p, solver=DenseSolver())
    opt.optimize(20)
    assert opt.chi2() < 1e-12
    np.testing.assert_allclose(p.get_estimate(10), seg_gt, atol=1e-6)


def test_line3d_types():
    import jax.numpy as jnp

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.ops import lie
    from g2o_tpu.types.slam3d import VertexSE3
    from g2o_tpu.types.slam3d_addons import (
        EdgeSE3Line3D, VertexLine3D, _line_normalize, line3d_ominus,
        line3d_oplus, line3d_transform,
    )

    rng = np.random.default_rng(11)

    def rand_line():
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        w = np.cross(rng.normal(size=3), d)
        return np.concatenate([w, d])

    l = rand_line()
    v = rng.normal(size=4) * 0.2
    l2 = line3d_oplus(jnp.asarray(l), jnp.asarray(v))
    dd = line3d_ominus(jnp.asarray(l), l2)
    l3 = line3d_oplus(jnp.asarray(l), dd)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l2), atol=1e-12)

    # line SLAM: exact recovery from noisy init
    line_gt = rand_line()
    g = Graph()
    for i in range(4):
        q = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.2)))
        x = np.concatenate([rng.normal(size=3), q])
        g.add_vertex(i, VertexSE3, x, fixed=True)
        meas = np.asarray(line3d_transform(
            lie.se3_inverse(jnp.asarray(x)), jnp.asarray(line_gt)))
        if i == 0:
            init = np.asarray(line3d_oplus(
                jnp.asarray(line_gt), jnp.asarray(rng.normal(size=4) * 0.1)))
            g.add_vertex(50, VertexLine3D, init)
        g.add_edge(EdgeSE3Line3D, [i, 50], meas, np.eye(4) * 100)
    p = g.compile()
    opt = SparseOptimizer(p, solver=DenseSolver())
    opt.optimize(40)
    assert opt.chi2() < 1e-16
    est = np.asarray(_line_normalize(jnp.asarray(p.get_estimate(50))))
    gtn = np.asarray(_line_normalize(jnp.asarray(line_gt)))
    np.testing.assert_allclose(est, gtn, atol=1e-8)


def test_render_graph_and_html(tmp_path):
    """Static + HTML renderers (the viewer's draw-action substitute,
    ``core/hyper_graph_action.h:137``): 2D and 3D graphs, chi2 coloring."""
    import numpy as np

    from g2o_tpu.io.viz import edge_chi2_values, render_graph, render_html
    from g2o_tpu.sim.generators import create_manhattan, create_sphere

    g2 = create_manhattan(n_poses=40, seed=1)
    p2 = g2.compile()
    png = tmp_path / "m.png"
    render_graph(g2, str(png), estimates_by_vid=p2.estimates_by_vid(),
                 chi2_by_edge=edge_chi2_values(p2), title="manhattan")
    assert png.stat().st_size > 2000

    html = tmp_path / "m.html"
    render_html(g2, str(html), estimates_by_vid=p2.estimates_by_vid(),
                chi2_by_edge=edge_chi2_values(p2))
    text = html.read_text()
    assert "canvas" in text and '"P":' in text
    assert text.count("[") > 40        # data actually embedded

    g3 = create_sphere(nodes_per_level=8, laps=3, radius=10.0, seed=0)
    p3 = g3.compile()
    svg = tmp_path / "s.svg"
    render_graph(g3, str(svg), estimates_by_vid=p3.estimates_by_vid())
    assert svg.stat().st_size > 2000


def test_cli_plot_flags(tmp_path):
    import subprocess
    import sys

    from g2o_tpu.io import g2o_format
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=25, seed=2)
    p = g.compile()
    fn = tmp_path / "m.g2o"
    g2o_format.save(g, str(fn), estimates_by_vid=p.estimates_by_vid())
    out_png = tmp_path / "o.png"
    out_html = tmp_path / "o.html"
    r = subprocess.run(
        [sys.executable, "-m", "g2o_tpu.apps.cli", "-i", "3",
         "-solver", "lm_dense", "-plot", str(out_png),
         "-htmlPlot", str(out_html), str(fn)],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ,
             "JAX_PLATFORMS": "", "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_png.exists() and out_html.exists()

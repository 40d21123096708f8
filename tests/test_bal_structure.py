"""BAL dataset IO + BA on BAL camera model + structure-only refinement."""

import io

import numpy as np
import pytest

from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.structure_only import structure_only_refine
from g2o_tpu.core.solvers import SchurSolver, PCGSolver
from g2o_tpu.io.bal import load_bal, make_synthetic_bal, save_bal
from g2o_tpu.sim.generators import create_ba_scene


@pytest.fixture(scope="module")
def bal_graph():
    text = make_synthetic_bal(n_cameras=10, n_points=120,
                              n_obs_per_point=5, pixel_noise=0.5, seed=3)
    # explicit gauge fix for the structural assertions below (the loader
    # default is False, matching the reference bal_example's free gauge)
    return load_bal(io.StringIO(text), huber=0.0, fix_first_camera=True)


def test_bal_load(bal_graph):
    g = bal_graph
    assert g.num_vertices == 130
    assert g.num_edges == 600
    assert g.vertex(0).fixed
    assert g.vertex(10).marginalized  # first point


def test_bal_ba_schur(bal_graph):
    # perturb points, then BA with Schur
    g = bal_graph
    rng = np.random.default_rng(0)
    for vid, rec in g.vertices().items():
        if rec.marginalized:
            rec.estimate = rec.estimate + rng.normal(scale=0.05, size=3)
    p = g.compile()
    res = optimize_fused(p, SchurSolver(), 10)
    assert res["chi2_final"] < 0.05 * res["chi2_per_iteration"][0]


def test_bal_roundtrip(tmp_path, bal_graph):
    path = str(tmp_path / "out.bal")
    save_bal(bal_graph, path)
    g2 = load_bal(path)
    assert g2.num_vertices == bal_graph.num_vertices
    assert g2.num_edges == bal_graph.num_edges
    np.testing.assert_allclose(g2.vertex(0).estimate,
                               bal_graph.vertex(0).estimate, rtol=1e-12)


def test_structure_only():
    g, truth = create_ba_scene(n_cameras=8, n_points=60, pixel_noise=0.0,
                               point_noise=0.3, seed=11)
    p = g.compile()
    res = structure_only_refine(p, n_iters=15)
    (before, after), = res.values()
    assert after.sum() < 1e-6 * max(before.sum(), 1.0)
    # cameras are untouched; points recovered exactly (noise-free obs)
    for vid, t in truth.items():
        np.testing.assert_allclose(p.get_estimate(vid), t, atol=1e-4)


def test_structure_only_requires_landmarks():
    from g2o_tpu.sim.generators import create_manhattan

    p = create_manhattan(n_poses=20, seed=1).compile()
    with pytest.raises(ValueError):
        structure_only_refine(p)


def test_load_bal_problem_matches_object_path():
    import jax

    from g2o_tpu.io.bal import load_bal_problem

    text = make_synthetic_bal(n_cameras=8, n_points=80,
                              n_obs_per_point=4, pixel_noise=0.5, seed=5)
    p1 = load_bal_problem(io.StringIO(text), huber=2.0)
    g = load_bal(io.StringIO(text), huber=2.0)
    p2 = g.compile()
    c1 = float(p1.chi2_jit(p1.data, p1.estimates)[0])
    c2 = float(p2.chi2_jit(p2.data, p2.estimates)[0])
    assert c1 == pytest.approx(c2, rel=1e-12)
    assert p1.total_dim == p2.total_dim
    # marginalization flags preserved for the Schur path
    res = optimize_fused(p1, SchurSolver(), 5)
    assert res["chi2_final"] < res["chi2_per_iteration"][0]

"""Native C++ .g2o tokenizer + array-direct problem loader."""

import numpy as np
import pytest

import g2o_tpu.types  # noqa: F401
from g2o_tpu import native
from g2o_tpu.io import g2o_fast, g2o_format
from g2o_tpu.sim.generators import create_manhattan, create_sphere


@pytest.fixture(scope="module")
def g2o_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fp") / "m.g2o")
    g = create_manhattan(n_poses=200, seed=13)
    g2o_format.save(g, path)
    return path


def test_native_blocks(g2o_file):
    blocks = native.parse_blocks(g2o_file)
    if blocks is None:
        pytest.skip("no native compiler available")
    assert "VERTEX_SE2" in blocks and "EDGE_SE2" in blocks
    vals, ncols = blocks["VERTEX_SE2"]
    assert vals.shape[0] == 200
    assert (ncols == 4).all()  # id + 3 floats
    assert "FIX" in blocks


def test_native_parse_text():
    blocks = native.parse_blocks(
        "# comment line\nVERTEX_SE2 0 1.5 2.5 0.25\nFIX 0\n", is_text=True)
    if blocks is None:
        pytest.skip("no native compiler available")
    vals, _ = blocks["VERTEX_SE2"]
    np.testing.assert_allclose(vals[0], [0, 1.5, 2.5, 0.25])


def test_fast_loader_matches_object_loader(g2o_file):
    p1, _ = g2o_fast.load_problem(g2o_file, kernel="Huber", delta=2.0)
    g = g2o_format.load(g2o_file)
    g.set_robust_kernel("Huber", 2.0)
    p2 = g.compile()
    c1 = float(p1.chi2_jit(p1.data, p1.estimates)[0])
    c2 = float(p2.chi2_jit(p2.data, p2.estimates)[0])
    assert c1 == pytest.approx(c2, rel=1e-12)
    assert p1.total_dim == p2.total_dim
    # same optimization result
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers import PCGSolver

    r1 = optimize_fused(p1, PCGSolver(max_iter=100, tol=1e-10), 5)
    r2 = optimize_fused(p2, PCGSolver(max_iter=100, tol=1e-10), 5)
    assert r1["chi2_final"] == pytest.approx(r2["chi2_final"], rel=1e-9)


def test_fast_loader_bad_edge_vertex(tmp_path):
    path = str(tmp_path / "bad.g2o")
    with open(path, "w") as fh:
        fh.write("VERTEX_SE2 0 0 0 0\nEDGE_SE2 0 7 1 0 0 1 0 0 1 0 1\n")
    if native.get_lib() is None:
        pytest.skip("no native compiler available")
    with pytest.raises(ValueError, match="unknown vertex id 7"):
        g2o_fast.load_problem(path)


def test_fast_loader_se3(tmp_path):
    path = str(tmp_path / "s.g2o")
    g = create_sphere(nodes_per_level=6, laps=2, radius=5.0, seed=3)
    g2o_format.save(g, path)
    p, _ = g2o_fast.load_problem(path)
    g2 = g2o_format.load(path)
    p2 = g2.compile()
    c1 = float(p.chi2_jit(p.data, p.estimates)[0])
    c2 = float(p2.chi2_jit(p2.data, p2.estimates)[0])
    assert c1 == pytest.approx(c2, rel=1e-12)

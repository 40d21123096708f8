"""Block-sparse Cholesky: symbolic fill, exactness vs dense, full LM."""

import numpy as np
import pytest

from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.core.solvers.sparse_chol import (
    SparseCholeskySolver, symbolic_factorization,
)
from g2o_tpu.sim.generators import create_manhattan, create_sphere


def test_symbolic_chain():
    pairs = np.array([[i, i + 1] for i in range(9)])
    # natural order (min_size covers the whole set): path has zero fill
    sym = symbolic_factorization(10, pairs, min_size=100)
    assert sym["nnz_blocks"] == 9
    assert sorted(int(x) for x in sym["perm"]) == list(range(10))
    # nested dissection trades a little fill for a shallow etree
    sym_nd = symbolic_factorization(10, pairs, min_size=2)
    assert sym_nd["nnz_blocks"] >= 9
    assert len(sym_nd["levels"]) <= len(sym["levels"])


@pytest.mark.parametrize("maker", [
    lambda: create_manhattan(n_poses=120, seed=3),
    lambda: create_sphere(nodes_per_level=10, laps=4, radius=10, seed=2),
])
def test_matches_dense(maker):
    g = maker()
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = 1e-3
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, lam))
    dx_s = np.asarray(SparseCholeskySolver().setup(p).solve(p.data, lin, lam))
    rel = np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d)
    assert rel < 1e-8


def test_full_lm():
    from g2o_tpu.core.lm_fused import optimize_fused

    g = create_manhattan(n_poses=150, seed=5)
    p = g.compile()
    res = optimize_fused(p, SparseCholeskySolver(), 10)
    assert res["chi2_final"] < 0.5 * res["chi2_per_iteration"][0]


def test_mixed_type_ba_direct_matches_dense():
    """Mixed camera(6)+point(3) BA graph through the padded-block direct
    path (mixed types are supported since round 3)."""
    from g2o_tpu.core.solvers import DenseSolver
    from g2o_tpu.sim.generators import create_ba_scene

    g, _ = create_ba_scene(n_cameras=3, n_points=10, seed=1)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    dx_s = np.asarray(SparseCholeskySolver().setup(p).solve(
        p.data, lin, 1e-3))
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, 1e-3))
    np.testing.assert_allclose(dx_s, dx_d, atol=1e-8)


def test_native_symbolic_matches_python_fill():
    """The native C++ analysis (ordering + etree + ereach structure) must
    reproduce the classic python struct-merge fill for the same ordering."""
    from g2o_tpu import native
    from g2o_tpu.core.solvers.sparse_chol import _fill_from_perm

    rng = np.random.default_rng(7)
    n = 150
    pairs = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a, b in rng.integers(0, n, (320, 2)) if a != b})
    pairs = np.asarray(pairs)
    res = native.symbolic_analysis(n, pairs, 16)
    if res is None:
        pytest.skip("no C++ compiler available")
    parent, depth, colptr, rows = _fill_from_perm(n, pairs, res["perm"])
    np.testing.assert_array_equal(res["parent"], parent)
    np.testing.assert_array_equal(res["colptr"], colptr)
    np.testing.assert_array_equal(res["rows"], rows)
    np.testing.assert_array_equal(res["depth"], depth)


def test_takahashi_all_blocks_matches_dense():
    """One factorization + one reverse Takahashi sweep gives ALL diagonal
    covariance blocks, matching the dense H^-1 (the batched formulation of
    ``MarginalCovarianceCholesky::computeEntry``,
    ``core/marginal_covariance_cholesky.h:92``)."""
    import numpy as np

    from g2o_tpu.core.marginals import compute_marginals
    from g2o_tpu.sim.generators import create_manhattan

    g = create_manhattan(n_poses=120, seed=4)
    p = g.compile()
    vids = sorted(p.vid_index)
    t = compute_marginals(p, vids, lam=1e-5, method="takahashi")
    d = compute_marginals(p, vids, lam=1e-5, method="dense")
    for v in vids:
        np.testing.assert_allclose(t[v], d[v], atol=1e-9)


def test_mixed_type_direct_solve_matches_dense():
    """Padded-block mixed-type path (SE2 poses + XY landmarks): the direct
    factorization must match the dense solve (the variable-blocksize
    BlockSolverX role, ``core/block_solver.h:196``)."""
    import numpy as np

    from g2o_tpu.core.solvers import DenseSolver, SparseCholeskySolver
    from g2o_tpu.sim.generators import create_simulator2d

    g = create_simulator2d(n_poses=35, n_landmarks=20,
                           sensors=("odometry", "pointxy"),
                           noise_scale=1.0, seed=9)
    p = g.compile()
    assert len(p.vertex_types) == 2
    lin = p.linearize_jit(p.data, p.estimates)
    dx_s = np.asarray(SparseCholeskySolver().setup(p).solve(
        p.data, lin, 1e-4))
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, 1e-4))
    np.testing.assert_allclose(dx_s, dx_d, atol=1e-9)


def test_mixed_type_takahashi_marginals():
    import numpy as np

    from g2o_tpu.core.marginals import compute_marginals
    from g2o_tpu.sim.generators import create_simulator2d

    g = create_simulator2d(n_poses=30, n_landmarks=18,
                           sensors=("odometry", "pointxy"),
                           noise_scale=1.0, seed=11)
    p = g.compile()
    vids = sorted(p.vid_index)
    t = compute_marginals(p, vids, lam=1e-4, method="takahashi")
    d = compute_marginals(p, vids, lam=1e-4, method="dense")
    for v in vids:
        np.testing.assert_allclose(t[v], d[v], atol=1e-8)


def test_ternary_calib_matches_dense():
    """Hyper-edges through the direct csparse-analogue path: every slot
    pair of an n-ary edge contributes an H block to the pattern
    (block_solver.hpp:142-214)."""
    import jax.numpy as jnp

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.core.solvers import DenseSolver
    from g2o_tpu.core.solvers.sparse_chol import SparseCholeskySolver
    from g2o_tpu.ops import lie
    from g2o_tpu.types.sclam2d import EdgeSE2SensorCalib
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    rng = np.random.default_rng(9)
    offset_gt = np.array([0.3, 0.1, 0.2])
    poses = [np.array([0.0, 0, 0])]
    for i in range(12):
        poses.append(poses[-1] + np.array([1.0, 0.1 * rng.normal(), 0.15]))
    g = Graph()
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x + rng.normal(scale=0.03, size=3),
                     fixed=(i == 0))
    g.add_vertex(100, VertexSE2, [0.0, 0.0, 0.0])
    info = np.eye(3) * 100
    for i in range(len(poses) - 1):
        a = lie.se2_compose(jnp.asarray(poses[i]), jnp.asarray(offset_gt))
        b = lie.se2_compose(jnp.asarray(poses[i + 1]),
                            jnp.asarray(offset_gt))
        meas = np.asarray(lie.se2_compose(lie.se2_inverse(a), b))
        g.add_edge(EdgeSE2SensorCalib, [i, i + 1, 100], meas, info)
        g.add_edge(EdgeSE2, [i, i + 1], meas, info * 0.1)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = 1e-3
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, lam))
    dx_s = np.asarray(
        SparseCholeskySolver().setup(p).solve(p.data, lin, lam))
    rel = np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d)
    assert rel < 1e-9


def test_repeated_vertex_hyperedge_matches_dense():
    """An edge binding the SAME vertex in two slots contributes
    H_ab + H_abT to that vertex's DIAGONAL block (dense_hessian_fn
    semantics); the direct solvers must not drop it."""
    import jax.numpy as jnp

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.core.solvers import DenseSolver, SparseCholeskySolver
    from g2o_tpu.core.solvers.host_chol import HostCholSolver
    from g2o_tpu.core.solvers.supernodal import SupernodalCholeskySolver
    from g2o_tpu.ops import lie
    from g2o_tpu.types.sclam2d import EdgeSE2SensorCalib
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    rng = np.random.default_rng(11)
    g = Graph()
    poses = [np.array([float(i), 0.1 * i, 0.05 * i]) for i in range(8)]
    for i, x in enumerate(poses):
        g.add_vertex(i, VertexSE2, x + rng.normal(scale=0.05, size=3),
                     fixed=(i == 0))
    g.add_vertex(100, VertexSE2, [0.05, -0.02, 0.1])
    info = np.eye(3) * 10
    for i in range(7):
        meas = np.asarray(lie.se2_compose(
            lie.se2_inverse(jnp.asarray(poses[i])), jnp.asarray(poses[i + 1])))
        g.add_edge(EdgeSE2, [i, i + 1], meas, info)
        g.add_edge(EdgeSE2SensorCalib, [i, i + 1, 100], meas, info)
    # the repeated-vertex hyper-edge: slots 0 and 1 bind vertex 3
    g.add_edge(EdgeSE2SensorCalib, [3, 3, 100], [0.0, 0.0, 0.0], info)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = 1e-2
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, lam))
    for solver in (SparseCholeskySolver(), SupernodalCholeskySolver(refine=2),
                   HostCholSolver()):
        dx = np.asarray(solver.setup(p).solve(p.data, lin, lam))
        rel = np.linalg.norm(dx - dx_d) / np.linalg.norm(dx_d)
        assert rel < 1e-7, (type(solver).__name__, rel)

"""Supernodal block-sparse Cholesky: partition closure, exactness, full LM."""

import numpy as np
import pytest

from g2o_tpu.core.solvers import DenseSolver
from g2o_tpu.core.solvers.sparse_chol import symbolic_factorization
from g2o_tpu.core.solvers.supernodal import (
    SupernodalCholeskySolver,
    build_supernodal_schedule,
    propagate_rowsets,
    supernode_partition,
)
from g2o_tpu.sim.generators import create_manhattan, create_sphere


def _pairs_from_problem(p):
    pair_set = set()
    for name, et in p.edge_types.items():
        if et.num_slots != 2:
            continue
        for a, b in np.asarray(p.data.edges[name].vidx):
            if a != b:
                pair_set.add((min(int(a), int(b)), max(int(a), int(b))))
    return np.asarray(sorted(pair_set), dtype=np.int64)


def test_partition_covers_columns_and_closure():
    g = create_sphere(nodes_per_level=10, laps=4, radius=10, seed=2)
    p = g.compile()
    pairs = _pairs_from_problem(p)
    n = p.counts[next(iter(p.counts))]
    sym = symbolic_factorization(n, pairs)
    starts, rowsets = supernode_partition(sym, smax=16, zeta=0.3)
    assert starts[0] == 0 and starts[-1] == n
    assert np.all(np.diff(starts) >= 1)
    rowsets, parent_sn = propagate_rowsets(starts, rowsets)
    # closure: every row of R(S) is inside an ancestor supernode's columns
    # or rowset, walking the quotient etree
    sn_of_col = np.empty(n, dtype=int)
    for k in range(len(rowsets)):
        sn_of_col[starts[k]:starts[k + 1]] = k
    for k, R in enumerate(rowsets):
        if len(R) == 0:
            continue
        p_sn = int(sn_of_col[int(R[0])])
        inside = (R >= starts[p_sn]) & (R < starts[p_sn + 1])
        passed_up = set(int(x) for x in R[~inside])
        assert passed_up <= set(int(x) for x in rowsets[p_sn])

    # amalgamation actually coarsens: far fewer supernodes than columns
    assert len(rowsets) < 0.6 * n


def test_schedule_is_shallower_than_column_levels():
    g = create_sphere(nodes_per_level=10, laps=6, radius=10, seed=2)
    p = g.compile()
    pairs = _pairs_from_problem(p)
    n = p.counts[next(iter(p.counts))]
    sym = symbolic_factorization(n, pairs)
    levels, _, meta = build_supernodal_schedule(sym, d=6, smax=24)
    assert meta["n_levels"] < len(sym["levels"])


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
    dx_s = np.asarray(
        SupernodalCholeskySolver().setup(p).solve(p.data, lin, lam))
    rel = np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d)
    assert rel < 1e-8


def test_matches_dense_tiny_supernodes():
    """smax=1 degenerates to the per-column algorithm — still exact."""
    g = create_manhattan(n_poses=80, seed=4)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, 1e-2))
    dx_s = np.asarray(
        SupernodalCholeskySolver(smax=1).setup(p).solve(p.data, lin, 1e-2))
    assert np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d) < 1e-8


def test_full_lm():
    from g2o_tpu.core.lm_fused import optimize_fused

    g = create_manhattan(n_poses=150, seed=5)
    p = g.compile()
    res = optimize_fused(p, SupernodalCholeskySolver(), 10)
    assert res["chi2_final"] < 0.5 * res["chi2_per_iteration"][0]


def test_mixed_types_matches_dense():
    """Mixed vertex types (SE3Expmap cameras + XYZ points) factor through
    the global-block-id + padding scheme (reference analogue: CHOLMOD's
    variable block sizes, linear_solver_cholmod.h:76)."""
    from g2o_tpu.core.solvers import DenseSolver
    from g2o_tpu.sim.generators import create_ba_scene

    g, _ = create_ba_scene(n_cameras=3, n_points=10, seed=1)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = 1e-2
    dx_d = np.asarray(DenseSolver().setup(p).solve(p.data, lin, lam))
    dx_s = np.asarray(
        SupernodalCholeskySolver(refine=2).setup(p).solve(p.data, lin, lam))
    rel = np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d)
    assert rel < 1e-8


def test_ternary_calib_matches_dense():
    """Hyper-edges: every slot pair contributes an H block
    (block_solver.hpp:142-214)."""
    import jax.numpy as jnp

    from g2o_tpu.core.graph import Graph
    from g2o_tpu.core.solvers import DenseSolver
    from g2o_tpu.ops import lie
    from g2o_tpu.types.sclam2d import EdgeSE2SensorCalib
    from g2o_tpu.types.slam2d import EdgeSE2, VertexSE2

    rng = np.random.default_rng(4)
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
        SupernodalCholeskySolver(refine=2).setup(p).solve(p.data, lin, lam))
    rel = np.linalg.norm(dx_s - dx_d) / np.linalg.norm(dx_d)
    assert rel < 1e-8

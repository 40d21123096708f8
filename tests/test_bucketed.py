"""Degree-bucketed segment layout (``g2o_tpu/ops/bucketed.py``): the
gather/scatter-free reduction plan used by the implicit Schur solver's TPU
fast path."""

import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.ops.bucketed import (bucket_broadcast, bucket_by_segment,
                                  bucket_reduce)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bucket_reduce_matches_scatter(seed):
    rng = np.random.default_rng(seed)
    S = int(rng.integers(3, 60))
    E = int(rng.integers(0, 400))
    seg = rng.integers(0, S, size=E)
    plan = bucket_by_segment(seg, S)
    # seg_perm_full is a true permutation of all segments
    assert sorted(plan.seg_perm_full.tolist()) == list(range(S))
    rows = rng.normal(size=(E, 3))
    padded = jnp.concatenate(
        [jnp.asarray(rows), jnp.zeros((1, 3))])[plan.perm_src]
    red = np.asarray(bucket_reduce(plan, padded))
    ref = np.zeros((S, 3))
    np.add.at(ref, seg, rows)
    np.testing.assert_allclose(red, ref[plan.seg_perm], atol=1e-12)


def test_bucket_broadcast_assigns_segment_values():
    rng = np.random.default_rng(7)
    seg = rng.integers(0, 20, size=150)
    plan = bucket_by_segment(seg, 20)
    sv = rng.normal(size=(len(plan.seg_perm), 2))
    bc = np.asarray(bucket_broadcast(plan, jnp.asarray(sv)))
    off, k = 0, 0
    for n, d in zip(plan.counts, plan.degrees):
        blk = bc[off:off + n * d].reshape(n, d, 2)
        np.testing.assert_allclose(blk, np.broadcast_to(
            sv[k:k + n][:, None, :], (n, d, 2)))
        off += n * d
        k += n


def test_bucket_merging_bounds_kernel_count():
    rng = np.random.default_rng(3)
    # degrees spread over two decades -> many ladder levels pre-merge
    deg = rng.integers(1, 200, size=500)
    seg = np.repeat(np.arange(500), deg)
    plan = bucket_by_segment(seg, 500, max_buckets=4)
    assert len(plan.degrees) <= 4
    # padding stays bounded even after merging
    assert plan.pad_ratio < 2.0


def test_compile_time_bucketing_equivalence():
    """``compile(bucket_landmarks=True)`` must be invisible to the math:
    identical chi2, b, diagonal Hessian blocks, and solver steps — only the
    edge-row layout (and thus the assembly kernels) change."""
    from g2o_tpu.core.solvers import SchurSolver
    from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
    from g2o_tpu.sim.generators import create_ba_scene

    g, _ = create_ba_scene(n_cameras=8, n_points=120, pixel_noise=0.5,
                           point_noise=0.2, seed=5)
    p0 = g.compile()
    pb = g.compile(bucket_landmarks=True)
    assert pb.bucket_specs, "BA scene should produce bucketed specs"
    lin0 = p0.linearize_jit(p0.data, p0.estimates)
    linb = pb.linearize_jit(pb.data, pb.estimates)
    np.testing.assert_allclose(np.asarray(lin0.b), np.asarray(linb.b),
                               rtol=1e-9, atol=1e-11)
    for t in lin0.diag:
        np.testing.assert_allclose(np.asarray(lin0.diag[t]),
                                   np.asarray(linb.diag[t]),
                                   rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(lin0.chi2_robust),
                               float(linb.chi2_robust), rtol=1e-12)

    lam = 1e-3
    dx_e = np.asarray(SchurSolver().setup(p0).solve(p0.data, lin0, lam))
    s = ImplicitSchurSolver(max_iter=500, tol=1e-13).setup(pb)
    dx = np.asarray(s._solve_jit(pb.data, linb, lam, s.aux))
    assert np.linalg.norm(dx - dx_e) / np.linalg.norm(dx_e) < 1e-8


def test_compile_time_bucketing_full_lm():
    from g2o_tpu.core.lm_fused import optimize_fused
    from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
    from g2o_tpu.sim.generators import create_ba_scene

    g, _ = create_ba_scene(n_cameras=6, n_points=80, pixel_noise=0.0,
                           point_noise=0.3, seed=9)
    pb = g.compile(bucket_landmarks=True, pad_edges_to_multiple=32)
    res = optimize_fused(pb, ImplicitSchurSolver(max_iter=200, tol=1e-10),
                         12)
    assert res["chi2_final"] < 1e-6 * max(res["chi2_per_iteration"][0], 1.0)


def test_compile_time_bucketing_cgls():
    """The square-root CGLS path must produce the same step on a bucketed
    problem (slab J·v / Jᵀ·r reductions replace the row gathers/scatters)."""
    from g2o_tpu.core.solvers.cgls import CGLSSolver
    from g2o_tpu.sim.generators import create_ba_scene

    g, _ = create_ba_scene(n_cameras=8, n_points=120, pixel_noise=0.5,
                           point_noise=0.2, seed=5)
    p0 = g.compile()
    pb = g.compile(bucket_landmarks=True, pad_edges_to_multiple=64)
    lin0 = p0.linearize_jit(p0.data, p0.estimates)
    linb = pb.linearize_jit(pb.data, pb.estimates)
    lam = 1e-3
    s0 = CGLSSolver(max_iter=2000, eta=1e-10).setup(p0)
    sb = CGLSSolver(max_iter=2000, eta=1e-10).setup(pb)
    dx0 = np.asarray(s0._solve_jit(p0.data, lin0, lam, s0.aux))
    dxb = np.asarray(sb._solve_jit(pb.data, linb, lam, sb.aux))
    assert np.linalg.norm(dxb - dx0) / np.linalg.norm(dx0) < 1e-8


def test_bucket_empty_segments():
    seg = np.array([5, 5, 5, 9])
    plan = bucket_by_segment(seg, 12)
    assert set(plan.seg_perm.tolist()) == {5, 9}
    assert sorted(plan.seg_perm_full.tolist()) == list(range(12))
    rows = np.arange(8, dtype=np.float64).reshape(4, 2)
    padded = jnp.concatenate(
        [jnp.asarray(rows), jnp.zeros((1, 2))])[plan.perm_src]
    red = np.asarray(bucket_reduce(plan, padded))
    ref = np.zeros((12, 2))
    np.add.at(ref, seg, rows)
    np.testing.assert_allclose(red, ref[plan.seg_perm])

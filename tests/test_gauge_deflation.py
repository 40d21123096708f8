"""Free-gauge BAL deflation (ROADMAP r5 #3): the 7 analytic gauge
directions are residual null directions, and projecting them out of the
implicit-Schur CG cuts late (λ→0) iteration counts without changing the
optimization trajectory."""

import io

import jax.numpy as jnp
import numpy as np

import g2o_tpu.types  # noqa: F401
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.solvers.schur_implicit import ImplicitSchurSolver
from g2o_tpu.io.bal import load_bal_problem, make_synthetic_bal
from g2o_tpu.types.bal import (bal_gauge_basis, bal_gauge_directions,
                               bal_project)


def _problem(n_cams=8, n_pts=80):
    text = make_synthetic_bal(n_cameras=n_cams, n_points=n_pts,
                              n_obs_per_point=5, pixel_noise=1.0, seed=0)
    return load_bal_problem(io.StringIO(text), huber=0.0,
                            fix_first_camera=False)


def test_gauge_directions_are_null():
    p = _problem()
    cams = np.asarray(p.estimates["VERTEX_CAMERA_BAL"])
    pts = np.asarray(p.estimates["VERTEX_TRACKXYZ"])
    Gc, Gp = bal_gauge_directions(cams, pts)
    vidx = np.asarray(p.data.edges["EDGE_OBSERVATION_BAL"].vidx)

    def allres(c, x):
        return np.asarray(bal_project(jnp.asarray(c)[vidx[:, 0]],
                                      jnp.asarray(x)[vidx[:, 1]]))

    base = allres(cams, pts)
    scale = np.abs(base).max()
    for k in range(7):
        eps = 1e-7
        r1 = allres(cams + eps * Gc[:, :, k], pts + eps * Gp[:, :, k])
        assert np.abs(r1 - base).max() / eps < 1e-3 * scale


def test_deflated_solve_fewer_iterations_same_quality():
    p = _problem()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = 1e-9 * float(np.max([np.abs(np.diagonal(lin.diag[t],
                                                  axis1=-2, axis2=-1)).max()
                               for t in p.vertex_types]))
    basis = bal_gauge_basis(p)
    # orthonormality of the flattened basis
    Q = np.asarray(basis["VERTEX_CAMERA_BAL"]).reshape(-1, 7)
    np.testing.assert_allclose(Q.T @ Q, np.eye(7), atol=1e-10)

    s0 = ImplicitSchurSolver(max_iter=500, tol=1e-8,
                             absolute_tolerance=False).setup(p)
    s1 = ImplicitSchurSolver(max_iter=500, tol=1e-8,
                             absolute_tolerance=False,
                             deflate_basis=basis).setup(p)
    dx0, st0 = s0._solve_full_jit(p.data, lin, lam, s0.aux)
    dx1, st1 = s1._solve_full_jit(p.data, lin, lam, s1.aux)
    it0, it1 = int(st0["cg_iterations"]), int(st1["cg_iterations"])
    assert it1 <= it0
    # both steps reduce chi2 to the same level (the discarded gauge
    # component is chi2-neutral)
    c0 = float(p.chi2_jit(p.data, p.apply_jit(p.data, p.estimates, dx0))[0])
    c1 = float(p.chi2_jit(p.data, p.apply_jit(p.data, p.estimates, dx1))[0])
    base = float(lin.chi2_robust)
    assert c1 < base
    assert abs(c1 - c0) <= 1e-3 * abs(base - c0) + 1e-6 * base


def test_deflated_lm_trajectory_parity():
    p1 = _problem()
    r1 = optimize_fused(
        p1, ImplicitSchurSolver(max_iter=200, tol=1e-6,
                                matvec_precision="highest"), 10)
    p2 = _problem()
    r2 = optimize_fused(
        p2, ImplicitSchurSolver(max_iter=200, tol=1e-6,
                                matvec_precision="highest",
                                deflate_basis=bal_gauge_basis(p2)), 10)
    assert abs(r2["chi2_final"] - r1["chi2_final"]) <= \
        1e-4 * max(r1["chi2_final"], 1.0)
    assert sum(r2["cg_per_iteration"]) <= sum(r1["cg_per_iteration"])

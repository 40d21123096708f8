"""Fused-LM vs host-loop-LM trajectory equivalence (f64).

Both drivers implement the exact reference LM semantics
(``optimization_algorithm_levenberg.cpp:58-145``): same λ-init
``τ·max|H_jj|``, same gain ratio, same accept/reject updates.  With a
deterministic solver (fixed-tolerance PCG, no carried-residual state) the
two must produce the same chi2 trajectory to float64 roundoff — the
round-1 divergence (ROADMAP #16) came from threading DIFFERENT solver
state, not from the fusion itself; this test pins the equivalence.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import g2o_tpu
import g2o_tpu.types  # noqa: F401
from g2o_tpu.core.lm_fused import optimize_fused
from g2o_tpu.core.solvers import PCGSolver
from g2o_tpu.sim.generators import create_manhattan


@pytest.mark.parametrize("precond", ["jacobi", "chunk2"])
def test_fused_matches_host_loop_trajectory(precond):
    g = create_manhattan(n_poses=250, seed=3)
    p = g.compile()
    est0 = {t: np.array(v) for t, v in p.estimates.items()}
    n_iters = 12

    def solver():
        # absolute_tolerance=False -> stateless, fully deterministic solves
        return PCGSolver(max_iter=400, tol=1e-12, precond=precond,
                         chunk_size=32, absolute_tolerance=False)

    # host loop
    opt = g2o_tpu.SparseOptimizer(p, algorithm=g2o_tpu.LevenbergMarquardt(),
                                  solver=solver())
    opt.optimize(n_iters)
    host_chis = [s.chi2 for s in opt.batch_statistics]
    host_final = opt.chi2()

    # fused device loop, same initial estimates
    p.set_estimates({t: jnp.asarray(v, dtype=p.dtype)
                     for t, v in est0.items()})
    res = optimize_fused(p, solver(), n_iters)
    fused_chis = res["chi2_per_iteration"]
    fused_final = res["chi2_final"]

    assert len(host_chis) == len(fused_chis)
    # the two drivers are DIFFERENT XLA programs: reduction orders inside
    # the CG dots differ, so dx agrees only to f64-roundoff-amplified-by-CG
    # (~1e-10) and chi2 per iteration to ~1e-8 relative.  The round-1
    # divergence (ROADMAP #16) was ACCEPT-THRESHOLD flips from threaded
    # solver state — with identical semantics the trajectories track to
    # roundoff, which is what this bound pins.
    np.testing.assert_allclose(fused_chis, host_chis, rtol=1e-6)
    np.testing.assert_allclose(fused_final, host_final, rtol=1e-6)

"""Pallas batched Cholesky / triangular-solve kernels (interpret mode —
the TPU lowering is exercised by the supernodal sd>96 path on hardware)."""
import numpy as np
import jax.numpy as jnp
import pytest

from g2o_tpu.ops.pallas_chol import (chol_batched, solve_lower_batched,
                                     solve_upper_batched)


@pytest.mark.parametrize("S,n,m", [(7, 12, 5), (33, 48, 1), (5, 126, 96)])
def test_chol_and_solves_match_lapack(S, n, m):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((S, n, n)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 2, 1)
                    + n * np.eye(n, dtype=np.float32))
    L = chol_batched(D, interpret=True)
    Lref = np.linalg.cholesky(np.asarray(D, np.float64))
    assert np.abs(np.asarray(L, np.float64) - Lref).max() \
        <= 5e-6 * np.abs(Lref).max()

    B = jnp.asarray(rng.standard_normal((S, n, m)).astype(np.float32))
    Y = solve_lower_batched(L, B, interpret=True)
    Yref = np.linalg.solve(Lref, np.asarray(B, np.float64))
    assert np.abs(np.asarray(Y, np.float64) - Yref).max() \
        <= 5e-6 * max(np.abs(Yref).max(), 1.0)

    X = solve_upper_batched(L, Y, interpret=True)
    Xref = np.linalg.solve(Lref.transpose(0, 2, 1), Yref)
    assert np.abs(np.asarray(X, np.float64) - Xref).max() \
        <= 5e-6 * max(np.abs(Xref).max(), 1.0)


def test_supernodal_amalgamation_invariant():
    """Different amalgamation widths reshape the frontal schedule but must
    produce the same solve (multifrontal extend-add exactness)."""
    from g2o_tpu.core.solvers.supernodal import SupernodalCholeskySolver
    from g2o_tpu.sim.generators import create_manhattan
    import g2o_tpu.types  # noqa: F401

    g = create_manhattan(n_poses=300, seed=3)
    p = g.compile()
    lin = p.linearize_jit(p.data, p.estimates)
    lam = jnp.asarray(1e-3, p.dtype)
    xs = []
    for smax in (24, 6):
        s = SupernodalCholeskySolver(smax=smax)
        s.setup(p)
        xs.append(np.asarray(s.solve(p.data, lin, lam)))
    np.testing.assert_allclose(xs[0], xs[1], rtol=1e-6, atol=1e-8)

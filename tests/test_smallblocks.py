"""Closed-form small-block Cholesky/inverse."""

import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.ops.smallblocks import chol_small, inv_small


@pytest.mark.parametrize("r", [1, 2, 3, 5])
def test_chol_small(r):
    rng = np.random.default_rng(r)
    B = rng.normal(size=(40, r, r))
    A = jnp.asarray(B @ B.transpose(0, 2, 1) + np.eye(r) * r)
    L = np.asarray(chol_small(A))
    np.testing.assert_allclose(L @ L.transpose(0, 2, 1), np.asarray(A),
                               atol=1e-8)
    # lower-triangular
    assert np.allclose(np.triu(L, 1), 0)


@pytest.mark.parametrize("r", [1, 2, 3, 5])
def test_inv_small(r):
    rng = np.random.default_rng(10 + r)
    B = rng.normal(size=(40, r, r))
    A = jnp.asarray(B @ B.transpose(0, 2, 1) + np.eye(r) * r)
    Ainv = np.asarray(inv_small(A))
    np.testing.assert_allclose(Ainv @ np.asarray(A),
                               np.tile(np.eye(r), (40, 1, 1)), atol=1e-8)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.ops import robust

SMOOTH_KERNELS = [
    robust.NONE, robust.PSEUDO_HUBER, robust.CAUCHY, robust.GEMAN_MCCLURE,
    robust.WELSCH, robust.FAIR,
]
ALL_KERNELS = list(range(10))


@pytest.mark.parametrize("kid", SMOOTH_KERNELS)
def test_derivative_consistency(kid):
    """rho' and rho'' must be the derivatives of rho (reference semantics,
    ``g2o/core/robust_kernel.h:61``)."""
    delta = 1.3
    for e2 in [0.1, 0.5, 2.0, 10.0]:
        rho = np.asarray(robust.robustify(kid, jnp.asarray(e2), delta))
        g = jax.grad(lambda x: robust.robustify(kid, x, delta)[0])(
            jnp.asarray(e2)
        )
        g2 = jax.grad(
            lambda x: robust.robustify(kid, x, delta)[1]
        )(jnp.asarray(e2))
        np.testing.assert_allclose(rho[1], g, rtol=1e-8)
        np.testing.assert_allclose(rho[2], g2, rtol=1e-6, atol=1e-12)


def test_huber_values():
    delta = 2.0
    # inlier
    rho = np.asarray(robust.robustify(robust.HUBER, jnp.asarray(1.0), delta))
    np.testing.assert_allclose(rho, [1.0, 1.0, 0.0])
    # outlier: e2 = 9 -> rho = 2*3*2 - 4 = 8, rho' = 2/3
    rho = np.asarray(robust.robustify(robust.HUBER, jnp.asarray(9.0), delta))
    np.testing.assert_allclose(rho[0], 8.0)
    np.testing.assert_allclose(rho[1], 2.0 / 3.0)
    np.testing.assert_allclose(rho[2], -0.5 * (2.0 / 3.0) / 9.0)


def test_tukey_outlier_flat():
    rho = np.asarray(robust.robustify(robust.TUKEY, jnp.asarray(100.0), 1.0))
    np.testing.assert_allclose(rho, [1.0 / 3.0, 0.0, 0.0])


def test_saturated():
    rho = np.asarray(robust.robustify(robust.SATURATED, jnp.asarray(9.0), 2.0))
    np.testing.assert_allclose(rho, [4.0, 0.0, 0.0])
    rho = np.asarray(robust.robustify(robust.SATURATED, jnp.asarray(1.0), 2.0))
    np.testing.assert_allclose(rho, [1.0, 1.0, 0.0])


def test_dcs():
    phi = 1.0
    e2 = 3.0
    s = 2 * phi / (phi + e2)  # 0.5
    rho = np.asarray(robust.robustify(robust.DCS, jnp.asarray(e2), phi))
    np.testing.assert_allclose(rho, [s * e2 * s, s * s, 0.0])
    # inlier region: scale clamps to 1
    rho = np.asarray(robust.robustify(robust.DCS, jnp.asarray(0.5), phi))
    np.testing.assert_allclose(rho, [0.5, 1.0, 0.0])


def test_batch_dispatch():
    kids = jnp.asarray([robust.NONE, robust.HUBER, robust.CAUCHY],
                       dtype=jnp.int32)
    e2 = jnp.asarray([1.0, 9.0, 4.0])
    deltas = jnp.asarray([1.0, 2.0, 1.5])
    out = np.asarray(robust.robustify_batch(kids, e2, deltas))
    assert out.shape == (3, 3)
    np.testing.assert_allclose(out[0], [1.0, 1.0, 0.0])
    np.testing.assert_allclose(out[1, 0], 8.0)
    exp = np.asarray(robust.robustify(robust.CAUCHY, jnp.asarray(4.0), 1.5))
    np.testing.assert_allclose(out[2], exp)


@pytest.mark.parametrize("kid", ALL_KERNELS)
def test_inlier_limit(kid):
    """All kernels behave ~quadratically for tiny errors."""
    rho = np.asarray(robust.robustify(kid, jnp.asarray(1e-8), 1.0))
    np.testing.assert_allclose(rho[0], 1e-8, rtol=1e-3)
    np.testing.assert_allclose(rho[1], 1.0, rtol=1e-3)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.ops import lie


rng = np.random.default_rng(42)


def rand_se2(n=()):
    v = rng.uniform(-1, 1, size=n + (3,))
    v[..., 2] *= np.pi
    return jnp.asarray(v)


def rand_quat(n=()):
    q = rng.normal(size=n + (4,))
    return lie.quat_normalize(jnp.asarray(q))


def rand_se3(n=()):
    t = rng.normal(size=n + (3,))
    return lie.se3_make(jnp.asarray(t), rand_quat(n))


class TestSE2:
    def test_compose_inverse(self):
        a, b = rand_se2(), rand_se2()
        ab = lie.se2_compose(a, b)
        b2 = lie.se2_compose(lie.se2_inverse(a), ab)
        np.testing.assert_allclose(b2, b, atol=1e-12)

    def test_identity(self):
        a = rand_se2()
        e = jnp.zeros(3)
        np.testing.assert_allclose(lie.se2_compose(a, e), a, atol=1e-12)
        np.testing.assert_allclose(
            lie.se2_compose(a, lie.se2_inverse(a)), e, atol=1e-12
        )

    def test_act_matches_compose(self):
        a = rand_se2()
        p = jnp.asarray(rng.normal(size=(2,)))
        b = jnp.concatenate([p, jnp.zeros(1)])
        np.testing.assert_allclose(
            lie.se2_act(a, p), lie.se2_compose(a, b)[:2], atol=1e-12
        )

    def test_normalize_angle(self):
        assert abs(float(lie.normalize_angle(3 * np.pi)) - (-np.pi)) < 1e-12
        np.testing.assert_allclose(
            lie.normalize_angle(jnp.asarray(0.5)), 0.5, atol=1e-15
        )


class TestQuat:
    def test_mul_rotate(self):
        q1, q2 = rand_quat(), rand_quat()
        v = jnp.asarray(rng.normal(size=(3,)))
        r1 = lie.quat_rotate(q1, lie.quat_rotate(q2, v))
        r2 = lie.quat_rotate(lie.quat_mul(q1, q2), v)
        np.testing.assert_allclose(r1, r2, atol=1e-12)

    def test_matrix_roundtrip(self):
        q = rand_quat((17,))
        R = lie.quat_to_matrix(q)
        q2 = lie.quat_from_matrix(R)
        # equality up to sign; from_matrix returns w>=0
        qp = lie.quat_positive(q)
        np.testing.assert_allclose(q2, qp, atol=1e-9)

    def test_rotate_matches_matrix(self):
        q = rand_quat()
        v = jnp.asarray(rng.normal(size=(3,)))
        np.testing.assert_allclose(
            lie.quat_rotate(q, v), lie.quat_to_matrix(q) @ v, atol=1e-12
        )

    def test_compact_roundtrip(self):
        q = lie.quat_positive(rand_quat((9,)))
        v = lie.quat_to_compact(q)
        q2 = lie.quat_from_compact(v)
        np.testing.assert_allclose(q2, q, atol=1e-12)

    def test_so3_exp_log(self):
        w = jnp.asarray(rng.normal(size=(11, 3)))
        q = lie.so3_exp(w)
        w2 = lie.so3_log(q)
        np.testing.assert_allclose(w2, w, atol=1e-9)

    def test_so3_exp_small(self):
        w = jnp.asarray([1e-12, -1e-13, 1e-12])
        q = lie.so3_exp(w)
        np.testing.assert_allclose(lie.so3_log(q), w, atol=1e-15)
        np.testing.assert_allclose(jnp.linalg.norm(q), 1.0, atol=1e-12)


class TestSE3:
    def test_compose_inverse(self):
        a, b = rand_se3(), rand_se3()
        ab = lie.se3_compose(a, b)
        b2 = lie.se3_compose(lie.se3_inverse(a), ab)
        np.testing.assert_allclose(b2[:3], b[:3], atol=1e-12)
        np.testing.assert_allclose(
            lie.quat_positive(b2[3:]), lie.quat_positive(b[3:]), atol=1e-12
        )

    def test_mqt_roundtrip(self):
        x = rand_se3((8,))
        v = lie.se3_to_mqt(x)
        x2 = lie.se3_from_mqt(v)
        np.testing.assert_allclose(x2[..., :3], x[..., :3], atol=1e-12)
        np.testing.assert_allclose(
            lie.quat_positive(x2[..., 3:]), lie.quat_positive(x[..., 3:]),
            atol=1e-9,
        )

    def test_oplus_zero(self):
        x = rand_se3()
        np.testing.assert_allclose(
            lie.se3_oplus(x, jnp.zeros(6)), lie.se3_normalize(x), atol=1e-12
        )

    def test_se3quat_exp_log(self):
        xi = jnp.asarray(rng.normal(size=(7, 6)) * 0.8)
        x = lie.se3quat_exp(xi)
        xi2 = lie.se3quat_log(x)
        np.testing.assert_allclose(xi2, xi, atol=1e-9)

    def test_act(self):
        a = rand_se3()
        p = jnp.asarray(rng.normal(size=(3,)))
        R = lie.quat_to_matrix(lie.se3_q(a))
        np.testing.assert_allclose(
            lie.se3_act(a, p), R @ p + lie.se3_t(a), atol=1e-12
        )


class TestSim3:
    def test_compose_inverse(self):
        def rand_sim3():
            return lie.sim3_make(
                jnp.asarray(rng.normal(size=(3,))),
                rand_quat(),
                jnp.exp(jnp.asarray(rng.normal() * 0.3)),
            )

        a, b = rand_sim3(), rand_sim3()
        ab = lie.sim3_compose(a, b)
        b2 = lie.sim3_compose(lie.sim3_inverse(a), ab)
        np.testing.assert_allclose(b2[:3], b[:3], atol=1e-10)
        np.testing.assert_allclose(b2[7], b[7], atol=1e-12)

    def test_exp_log(self):
        xi = jnp.asarray(rng.normal(size=(9, 7)) * 0.5)
        x = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(x)
        np.testing.assert_allclose(xi2, xi, atol=1e-8)

    def test_exp_zero(self):
        x = lie.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(x, lie.sim3_identity(), atol=1e-12)

    def test_act(self):
        t = jnp.asarray(rng.normal(size=(3,)))
        q = rand_quat()
        s = jnp.asarray(2.5)
        a = lie.sim3_make(t, q, s)
        p = jnp.asarray(rng.normal(size=(3,)))
        np.testing.assert_allclose(
            lie.sim3_act(a, p), 2.5 * lie.quat_rotate(q, p) + t, atol=1e-12
        )


def test_sim3_W_matches_numerical_integral():
    """Regression: the sim3 W = ∫ e^{uσ}R(uθ)du small-branch coefficients
    were wrong (case 1 zeroed B/C — true 1/2, 1/6; case 3 scaled them by
    0.5 and 2/3), halving/zeroing the rotation-translation and
    scale-translation Jacobian couplings near convergence."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from g2o_tpu.ops import lie

    def W_num(omega, sigma, n=50000):
        th = np.linalg.norm(omega)
        O = np.asarray(lie.so3_hat(jnp.asarray(omega)))
        us = (np.arange(n) + 0.5) / n
        if th < 1e-14:
            R = lambda u: np.eye(3) + u * O
        else:
            def R(u):
                a = u * th
                return (np.eye(3) + np.sin(a) / th * O
                        + (1 - np.cos(a)) / th ** 2 * (O @ O))
        return sum(np.exp(u * sigma) * R(u) for u in us) / n

    cases = [
        (np.array([1e-9, 2e-9, -1e-9]), 1e-9),      # both small
        (np.array([0.3, -0.2, 0.5]), 1e-9),         # theta only
        (np.array([1e-9, 2e-9, -1e-9]), 0.4),       # sigma only
        (np.array([0.3, -0.2, 0.5]), 0.4),          # general
    ]
    ups = np.array([0.7, -0.3, 0.2])
    for om, sg in cases:
        xi = jnp.asarray(np.concatenate([om, ups, [sg]]))
        st = lie.sim3_exp(xi)
        W = np.stack([np.asarray(lie.sim3_t(lie.sim3_exp(jnp.asarray(
            np.concatenate([om, e, [sg]]))))) for e in np.eye(3)], axis=1)
        assert np.abs(W - W_num(om, sg)).max() < 1e-6
        # exp/log roundtrip
        assert np.abs(np.asarray(lie.sim3_log(st))
                      - np.asarray(xi)).max() < 1e-8
        # reverse-mode Jacobian vs central differences (h large enough to
        # keep the numerical reference out of its own cancellation noise)
        xi_np = np.asarray(xi)
        J = np.asarray(jax.jacrev(
            lambda v: lie.sim3_t(lie.sim3_exp(v)))(xi))
        for k in range(7):
            h = 1e-4
            xp = xi_np.copy(); xp[k] += h
            xm = xi_np.copy(); xm[k] -= h
            num = (np.asarray(lie.sim3_t(lie.sim3_exp(jnp.asarray(xp))))
                   - np.asarray(lie.sim3_t(lie.sim3_exp(
                       jnp.asarray(xm))))) / (2 * h)
            assert np.abs(J[:, k] - num).max() < 1e-5

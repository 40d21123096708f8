"""Jacobian correctness — the workhorse test pattern of the reference suite
(``unit_test/test_helper/evaluate_jacobian.h:40-88``): compare the
framework's (autodiff) Jacobian against a central-difference numeric one
computed through each vertex's oplus, over randomized states/measurements."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.core.types import REGISTRY
from g2o_tpu.ops import lie
import g2o_tpu.types  # noqa: F401  (registers types)

rng = np.random.default_rng(7)


def rand_state(vt):
    if vt.name == "VERTEX_SE2":
        v = rng.uniform(-1, 1, size=3)
        v[2] *= np.pi
        return jnp.asarray(v)
    if vt.name in ("VERTEX_SE3:QUAT", "VERTEX_SE3:EXPMAP", "VERTEX3"):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return jnp.asarray(np.concatenate([rng.normal(size=3), q]))
    if vt.name.startswith("VERTEX_SIM3"):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        s = np.exp(rng.normal() * 0.2)
        intr = np.array([500.0, 500.0, 320.0, 240.0, 450.0, 450.0, 300.0, 220.0])
        return jnp.asarray(np.concatenate([rng.normal(size=3), q, [s], intr]))
    if vt.name == "VERTEX_CAM":
        # near-identity orientation + small offset keeps test points in
        # front of the camera (z ~ 4..6)
        q = np.array([0.05, -0.04, 0.03, 1.0]) + rng.normal(size=4) * 0.02
        q /= np.linalg.norm(q)
        t = rng.normal(size=3) * 0.3
        intr = np.array([500.0, 510.0, 320.0, 240.0, 0.2])
        return jnp.asarray(np.concatenate([t, q, intr]))
    if vt.name == "VERTEX_LINE3D":
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        w = np.cross(rng.normal(size=3), d)
        return jnp.asarray(np.concatenate([w, d]))
    if vt.name == "VERTEX_TRACKXYZ":
        # keep points away from any camera plane (z ~ 0 singularities)
        p = rng.normal(size=3)
        p[2] = 4.0 + rng.random()
        return jnp.asarray(p)
    return jnp.asarray(rng.normal(size=vt.rep_dim))


def rand_meas(et):
    if et.meas_dim == 7:  # SE3 measurement
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return jnp.asarray(np.concatenate([rng.normal(size=3), q]))
    if et.meas_dim == 8:  # Sim3 measurement
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        s = np.exp(rng.normal() * 0.2)
        return jnp.asarray(np.concatenate([rng.normal(size=3), q, [s]]))
    if et.meas_dim == 3 and et.residual_dim == 3 and et.name.startswith("EDGE_SE2"):
        v = rng.uniform(-1, 1, size=3)
        v[2] *= np.pi
        return jnp.asarray(v)
    if et.name == "EDGE_SE3_LINE3D":
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        w = np.cross(rng.normal(size=3), d)
        return jnp.asarray(np.concatenate([w, d]))
    if "ONLYPOSE" in et.name:
        # measurement tail carries the world point; keep it in front
        obs = rng.normal(size=et.meas_dim - 3) * 30.0 + 300.0
        Xw = np.array([rng.normal(), rng.normal(), 5.0 + rng.random()])
        return jnp.asarray(np.concatenate([obs, Xw]))
    return jnp.asarray(rng.normal(size=et.meas_dim))


def _rand_offset7():
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.concatenate([rng.normal(size=3) * 0.1, q])


def rand_param(et):
    if et.param_dim == 7:
        return jnp.asarray(_rand_offset7())
    if et.param_dim == 14:  # two SE3 offsets
        return jnp.asarray(np.concatenate([_rand_offset7(),
                                           _rand_offset7()]))
    if et.param_dim == 11:  # ParameterCamera: offset + fx fy cx cy
        return jnp.asarray(np.concatenate(
            [_rand_offset7(), [500.0, 510.0, 320.0, 240.0]]))
    if et.param_dim in (4, 5):  # pinhole (+ stereo bf)
        base = [520.0, 530.0, 320.0, 240.0]
        if et.param_dim == 5:
            base.append(40.0)
        return jnp.asarray(base)
    return jnp.asarray(rng.normal(size=et.param_dim))


def numeric_jacobians(et, states, meas, par, h=1e-6):
    out = []
    for s, vt in enumerate(et.vertex_types):
        d = vt.tangent_dim
        J = np.zeros((et.residual_dim, d))
        for k in range(d):
            dp = np.zeros(d)
            dp[k] = h
            sp = list(states)
            sp[s] = vt.oplus(states[s], jnp.asarray(dp))
            ep = np.asarray(et.residual(tuple(sp), meas, par)).reshape(-1)
            sm = list(states)
            sm[s] = vt.oplus(states[s], jnp.asarray(-dp))
            em = np.asarray(et.residual(tuple(sm), meas, par)).reshape(-1)
            J[:, k] = (ep - em) / (2 * h)
        out.append(J)
    return out


EDGE_NAMES = sorted(REGISTRY.edge_types)


@pytest.mark.parametrize("name", EDGE_NAMES)
def test_autodiff_vs_numeric(name):
    et = REGISTRY.edge_types[name]
    for trial in range(3):
        states = tuple(rand_state(vt) for vt in et.vertex_types)
        meas = rand_meas(et)
        par = rand_param(et)

        def f(*deltas):
            news = tuple(
                vt.oplus(x, dd)
                for vt, x, dd in zip(et.vertex_types, states, deltas)
            )
            return et.residual(news, meas, par)

        zeros = tuple(jnp.zeros(vt.tangent_dim) for vt in et.vertex_types)
        Js = jax.jacfwd(f, argnums=tuple(range(len(zeros))))(*zeros)
        Jn = numeric_jacobians(et, states, meas, par)
        for J_ad, J_num in zip(Js, Jn):
            np.testing.assert_allclose(
                np.asarray(J_ad).reshape(J_num.shape), J_num,
                atol=1e-5, rtol=1e-5,
            )

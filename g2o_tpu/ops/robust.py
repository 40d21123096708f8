"""Robust kernels as pure functions, vmappable over batches of edges.

Each kernel maps the squared error ``e2 = e^T Omega e`` to
``(rho, rho', rho'')`` exactly as the reference implementations in
``g2o/core/robust_kernel_impl.cpp:50-170`` (the formulas are the standard
M-estimator textbook forms).  Kernels are identified by a small integer id so
a heterogeneous batch of edges can dispatch with ``jax.lax.switch`` under
``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# kernel ids (order fixed — persisted in compiled problems)
NONE = 0
HUBER = 1
PSEUDO_HUBER = 2
CAUCHY = 3
GEMAN_MCCLURE = 4
WELSCH = 5
FAIR = 6
TUKEY = 7
SATURATED = 8
DCS = 9

KERNEL_IDS = {
    "": NONE,
    "None": NONE,
    "Huber": HUBER,
    "PseudoHuber": PSEUDO_HUBER,
    "Cauchy": CAUCHY,
    "GemanMcClure": GEMAN_MCCLURE,
    "Welsch": WELSCH,
    "Fair": FAIR,
    "Tukey": TUKEY,
    "Saturated": SATURATED,
    "DCS": DCS,
}
KERNEL_NAMES = {v: k for k, v in KERNEL_IDS.items() if k not in ("", )}


def _rho_none(e2, delta):
    one = jnp.ones_like(e2)
    return jnp.stack([e2, one, jnp.zeros_like(e2)], axis=-1)


def _rho_huber(e2, delta):
    dsqr = delta * delta
    sqrte = jnp.sqrt(jnp.maximum(e2, 1e-300))
    r1 = delta / sqrte
    out = jnp.stack([2.0 * sqrte * delta - dsqr, r1, -0.5 * r1 / e2], axis=-1)
    return jnp.where((e2 <= dsqr)[..., None], _rho_none(e2, delta), out)


def _rho_pseudo_huber(e2, delta):
    dsqr = delta * delta
    dsqr_r = 1.0 / dsqr
    aux1 = dsqr_r * e2 + 1.0
    aux2 = jnp.sqrt(aux1)
    r1 = 1.0 / aux2
    return jnp.stack(
        [2.0 * dsqr * (aux2 - 1.0), r1, -0.5 * dsqr_r * r1 / aux1], axis=-1
    )


def _rho_cauchy(e2, delta):
    dsqr = delta * delta
    dsqr_r = 1.0 / dsqr
    aux = dsqr_r * e2 + 1.0
    r1 = 1.0 / aux
    return jnp.stack([dsqr * jnp.log(aux), r1, -dsqr_r * r1 * r1], axis=-1)


def _rho_geman_mcclure(e2, delta):
    # NOTE: the reference writes rho'' = -2*rho'*aux (missing a 1/delta
    # factor); we use the true derivative d(rho')/d(e2) = -2*aux^3/delta.
    # rho'' is unused by the quadratic form in both frameworks.
    aux = delta / (delta + e2)
    r1 = aux * aux
    return jnp.stack([e2 * aux, r1, -2.0 * r1 * aux / delta], axis=-1)


def _rho_welsch(e2, delta):
    dsqr = delta * delta
    aux2 = jnp.exp(-e2 / dsqr)
    return jnp.stack([dsqr * (1.0 - aux2), aux2, -aux2 / dsqr], axis=-1)


def _rho_fair(e2, delta):
    # NOTE: the reference's rho'' (-0.5/(sqrt(e2)(1+aux))) is not the
    # derivative of its rho'; we use the true d(rho')/d(e2).  rho'' is
    # unused by the quadratic form in both frameworks.
    sqrte = jnp.sqrt(jnp.maximum(e2, 1e-300))
    aux = sqrte / delta
    return jnp.stack(
        [
            2.0 * delta * delta * (aux - jnp.log1p(aux)),
            1.0 / (1.0 + aux),
            -0.5 / (delta * sqrte * (1.0 + aux) ** 2),
        ],
        axis=-1,
    )


def _rho_tukey(e2, delta):
    e = jnp.sqrt(jnp.maximum(e2, 0.0))
    delta2 = delta * delta
    aux = e2 / delta2
    omaux = 1.0 - aux
    inlier = jnp.stack(
        [delta2 * (1.0 - omaux ** 3) / 3.0, omaux * omaux, -2.0 * omaux / delta2],
        axis=-1,
    )
    outlier = jnp.stack(
        [jnp.full_like(e2, 1.0) * delta2 / 3.0, jnp.zeros_like(e2), jnp.zeros_like(e2)],
        axis=-1,
    )
    return jnp.where((e <= delta)[..., None], inlier, outlier)


def _rho_saturated(e2, delta):
    dsqr = delta * delta
    outlier = jnp.stack(
        [jnp.full_like(e2, 1.0) * dsqr, jnp.zeros_like(e2), jnp.zeros_like(e2)],
        axis=-1,
    )
    return jnp.where((e2 <= dsqr)[..., None], _rho_none(e2, delta), outlier)


def _rho_dcs(e2, delta):
    phi = delta
    scale = jnp.minimum((2.0 * phi) / (phi + e2), 1.0)
    return jnp.stack([scale * e2 * scale, scale * scale, jnp.zeros_like(e2)], axis=-1)


_KERNELS = [
    _rho_none,
    _rho_huber,
    _rho_pseudo_huber,
    _rho_cauchy,
    _rho_geman_mcclure,
    _rho_welsch,
    _rho_fair,
    _rho_tukey,
    _rho_saturated,
    _rho_dcs,
]


def robustify(kernel_id, e2, delta):
    """Dispatch on per-edge kernel id.  All args are scalars (use under vmap)
    or broadcastable arrays when kernel_id is a static int.

    Returns (rho, rho', rho'') stacked on the last axis."""
    if isinstance(kernel_id, int):
        return _KERNELS[kernel_id](e2, delta)
    return jax.lax.switch(kernel_id, _KERNELS, e2, delta)


def robustify_batch(kernel_ids, e2, deltas):
    """Vectorised robustification over a batch of edges (E,) -> (E, 3)."""
    return jax.vmap(robustify)(kernel_ids, e2, deltas)

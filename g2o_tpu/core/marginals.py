"""Marginal covariance recovery — analogue of the reference
``SparseOptimizer::computeMarginals`` (``g2o/core/sparse_optimizer.cpp:594``)
backed by ``MarginalCovarianceCholesky``
(``g2o/core/marginal_covariance_cholesky.h:43``).

Where the reference walks a CSparse/CHOLMOD factor with the Takahashi
recursion and hash memoisation, the TPU formulation factorises the dense
tangent-space Hessian once (MXU Cholesky) and solves for all requested
columns in one batched triangular solve — the covariance blocks are
``(H^-1)[slots_i, slots_j]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_marginals(problem, vertex_ids, *, lam: float = 0.0,
                      estimates=None):
    """Covariance blocks for the given vertex ids.

    Returns ``{vid: (d, d) ndarray}``.  Fixed vertices get zero covariance
    (they are pinned), matching the reference convention that fixed vertices
    are excluded from the system."""
    p = problem
    estimates = estimates if estimates is not None else p.estimates
    lin = p.linearize_jit(p.data, estimates)

    # flat slot indices for every requested vertex
    cols = []
    spans = []  # (vid, start, dim, fixed)
    offsets = {t: np.asarray(p.data.offsets[t]) for t in p.vertex_types}
    fixed = {t: np.asarray(p.data.fixed[t]) for t in p.vertex_types}
    pos = 0
    for vid in vertex_ids:
        t, i = p.vid_index[vid]
        d = p.vertex_types[t].tangent_dim
        is_fixed = bool(fixed[t][i])
        spans.append((vid, pos, d, is_fixed))
        cols.extend(range(int(offsets[t][i]), int(offsets[t][i]) + d))
        pos += d
    cols = jnp.asarray(np.asarray(cols, dtype=np.int32))

    @jax.jit
    def solve_columns(data, lin):
        H = p.dense_hessian_fn(data, lin)
        Hl = H + lam * jnp.eye(H.shape[0], dtype=H.dtype)
        L, lower = jax.scipy.linalg.cho_factor(Hl, lower=True)
        rhs = jnp.zeros((H.shape[0], cols.shape[0]), dtype=H.dtype)
        rhs = rhs.at[cols, jnp.arange(cols.shape[0])].set(1.0)
        X = jax.scipy.linalg.cho_solve((L, lower), rhs)
        return X[cols, :]  # (k, k) block of H^-1

    block = np.asarray(solve_columns(p.data, lin))
    out = {}
    for vid, start, d, is_fixed in spans:
        if is_fixed:
            out[vid] = np.zeros((d, d))
        else:
            out[vid] = block[start:start + d, start:start + d]
    return out


def compute_cross_marginals(problem, vid_a, vid_b, *, lam: float = 0.0):
    """Cross-covariance block between two vertices (needed by condensed-edge
    construction in hierarchical optimization)."""
    p = problem
    blocks = compute_marginals(problem, [vid_a, vid_b], lam=lam)
    # recompute to extract the off-diagonal part
    lin = p.linearize_jit(p.data, p.estimates)
    ta, ia = p.vid_index[vid_a]
    tb, ib = p.vid_index[vid_b]
    da = p.vertex_types[ta].tangent_dim
    db = p.vertex_types[tb].tangent_dim
    oa = int(np.asarray(p.data.offsets[ta])[ia])
    ob = int(np.asarray(p.data.offsets[tb])[ib])
    cols = jnp.asarray(
        np.asarray(list(range(oa, oa + da)) + list(range(ob, ob + db)),
                   dtype=np.int32))

    @jax.jit
    def solve(data, lin):
        H = p.dense_hessian_fn(data, lin)
        Hl = H + lam * jnp.eye(H.shape[0], dtype=H.dtype)
        L, lower = jax.scipy.linalg.cho_factor(Hl, lower=True)
        rhs = jnp.zeros((H.shape[0], cols.shape[0]), dtype=H.dtype)
        rhs = rhs.at[cols, jnp.arange(cols.shape[0])].set(1.0)
        X = jax.scipy.linalg.cho_solve((L, lower), rhs)
        return X[cols, :]

    M = np.asarray(solve(p.data, lin))
    return M[:da, da:da + db]

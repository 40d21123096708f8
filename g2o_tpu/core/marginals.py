"""Marginal covariance recovery — analogue of the reference
``SparseOptimizer::computeMarginals`` (``g2o/core/sparse_optimizer.cpp:594``)
backed by ``MarginalCovarianceCholesky``
(``g2o/core/marginal_covariance_cholesky.h:43``).

Two backends:

* **dense** (small problems): factorise the dense tangent-space Hessian once
  (MXU Cholesky) and solve all requested columns in one batched triangular
  solve — the covariance blocks are ``(H^-1)[slots_i, slots_j]``.
* **sparse** (uniform-block pose graphs at scale): reuse the
  :class:`~g2o_tpu.core.solvers.supernodal.SupernodalCholeskySolver`'s
  amalgamated block factor and run its batched-panel triangular solves
  over a batch of unit-block right-hand sides — where the reference walks
  the CSparse/CHOLMOD factor with the Takahashi recursion (``solveBlocks``,
  ``solvers/cholmod/linear_solver_cholmod.h:160-230``), the TPU version
  vmaps the substitution over the requested columns.  Memory is
  O(nnz(L) + n·d·k) instead of O(T²).

``method="auto"`` picks sparse when the problem shape admits it and the
dense Hessian would exceed ~32M entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _spans_for(problem, vertex_ids):
    """Per requested vertex: (vid, type, local idx, dim, fixed)."""
    fixed = {t: np.asarray(problem.data.fixed[t]) for t in problem.vertex_types}
    spans = []
    for vid in vertex_ids:
        t, i = problem.vid_index[vid]
        d = problem.vertex_types[t].tangent_dim
        spans.append((vid, t, i, d, bool(fixed[t][i])))
    return spans


def _sparse_applicable(problem) -> bool:
    if len(problem.vertex_types) != 1:
        return False
    return all(et.num_slots <= 2 for et in problem.edge_types.values())


def _sparse_cov_blocks(problem, locals_, *, lam, estimates):
    """(k, d, d) diagonal covariance blocks via the supernodal factor
    (symbolic setup is ~300x faster than the per-column schedule at
    sphere2500 scale and the triangular sweeps run over ~15 levels of
    batched dense panels instead of ~240 column levels)."""
    from g2o_tpu.core.solvers.supernodal import (SupernodalCholeskySolver,
                                                 solve_supernodal)

    p = problem
    solver = SupernodalCholeskySolver().setup(p)
    (tname,) = p.vertex_types
    d = p.vertex_types[tname].tangent_dim
    n = p.counts[tname]
    perm = np.asarray(solver.aux["perm"])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    kcols = jnp.asarray(inv[np.asarray(locals_, dtype=np.int64)])

    lin = p.linearize_jit(p.data, estimates)
    aux = solver.aux
    dtype = p.dtype

    @jax.jit
    def run(data, lin, aux, kcols):
        blocks = solver._factor_fn(data, lin, jnp.asarray(lam, dtype), aux)

        def one(kcol):
            rhs = jnp.zeros((n, d, d), dtype=dtype).at[kcol].set(
                jnp.eye(d, dtype=dtype))
            X = jax.vmap(solve_supernodal, in_axes=(None, -1, None, None),
                         out_axes=-1)(blocks, rhs, aux["levels"], d)
            return X[kcol]                       # (d, d) = (H^-1)[v, v]

        return jax.vmap(one)(kcols)

    return np.asarray(run(p.data, lin, aux, kcols))


def _dense_inverse_block(problem, cols, *, lam, estimates):
    """(k, k) block of H^-1 for the given flat column indices."""
    p = problem
    lin = p.linearize_jit(p.data, estimates)
    cols = jnp.asarray(np.asarray(cols, dtype=np.int32))

    @jax.jit
    def solve_columns(data, lin):
        H = p.dense_hessian_fn(data, lin)
        Hl = H + lam * jnp.eye(H.shape[0], dtype=H.dtype)
        L, lower = jax.scipy.linalg.cho_factor(Hl, lower=True)
        rhs = jnp.zeros((H.shape[0], cols.shape[0]), dtype=H.dtype)
        rhs = rhs.at[cols, jnp.arange(cols.shape[0])].set(1.0)
        X = jax.scipy.linalg.cho_solve((L, lower), rhs)
        return X[cols, :]

    return np.asarray(solve_columns(p.data, lin))


def compute_marginals(problem, vertex_ids, *, lam: float = 0.0,
                      estimates=None, method: str = "auto"):
    """Covariance blocks for the given vertex ids.

    Returns ``{vid: (d, d) ndarray}``.  Fixed vertices get zero covariance
    (they are pinned), matching the reference convention that fixed vertices
    are excluded from the system."""
    p = problem
    estimates = estimates if estimates is not None else p.estimates
    spans = _spans_for(p, vertex_ids)

    if method == "auto":
        method = ("sparse" if _sparse_applicable(p)
                  and p.total_dim * p.total_dim > 32_000_000 else "dense")
    if method == "sparse" and not _sparse_applicable(p):
        raise NotImplementedError(
            "sparse marginals require a single uniform vertex type and "
            "binary edges")

    out = {}
    if method == "sparse":
        locals_ = [i for (_, _, i, _, _) in spans]
        cov = _sparse_cov_blocks(p, locals_, lam=lam, estimates=estimates)
        for m, (vid, _, _, d, is_fixed) in enumerate(spans):
            out[vid] = np.zeros((d, d)) if is_fixed else cov[m]
        return out

    offsets = {t: np.asarray(p.data.offsets[t]) for t in p.vertex_types}
    cols, pos = [], 0
    starts = []
    for (_, t, i, d, _) in spans:
        starts.append(pos)
        cols.extend(range(int(offsets[t][i]), int(offsets[t][i]) + d))
        pos += d
    block = _dense_inverse_block(p, cols, lam=lam, estimates=estimates)
    for (vid, _, _, d, is_fixed), start in zip(spans, starts):
        out[vid] = (np.zeros((d, d)) if is_fixed
                    else block[start:start + d, start:start + d])
    return out


def compute_cross_marginals(problem, vid_a, vid_b, *, lam: float = 0.0,
                            method: str = "dense"):
    """Cross-covariance block ``(H^-1)[a, b]`` (needed by condensed-edge
    construction in hierarchical optimization)."""
    p = problem
    ta, ia = p.vid_index[vid_a]
    tb, ib = p.vid_index[vid_b]
    da = p.vertex_types[ta].tangent_dim
    db = p.vertex_types[tb].tangent_dim

    if method == "sparse":
        if not _sparse_applicable(p):
            raise NotImplementedError("sparse cross-marginals need a "
                                      "uniform-block problem")
        from g2o_tpu.core.solvers.supernodal import (
            SupernodalCholeskySolver, solve_supernodal)

        solver = SupernodalCholeskySolver().setup(p)
        (tname,) = p.vertex_types
        n = p.counts[tname]
        perm = np.asarray(solver.aux["perm"])
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        lin = p.linearize_jit(p.data, p.estimates)
        aux = solver.aux
        dtype = p.dtype
        ka, kb = int(inv[ia]), int(inv[ib])

        @jax.jit
        def run(data, lin, aux):
            blocks = solver._factor_fn(data, lin, jnp.asarray(lam, dtype),
                                       aux)
            rhs = jnp.zeros((n, db, db), dtype=dtype).at[kb].set(
                jnp.eye(db, dtype=dtype))
            X = jax.vmap(solve_supernodal, in_axes=(None, -1, None, None),
                         out_axes=-1)(blocks, rhs, aux["levels"], db)
            return X[ka]

        return np.asarray(run(p.data, lin, aux))

    offsets = {t: np.asarray(p.data.offsets[t]) for t in p.vertex_types}
    oa, ob = int(offsets[ta][ia]), int(offsets[tb][ib])
    cols = list(range(oa, oa + da)) + list(range(ob, ob + db))
    M = _dense_inverse_block(p, cols, lam=lam, estimates=p.estimates)
    return M[:da, da:da + db]

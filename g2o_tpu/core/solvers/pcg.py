"""Matrix-free block-Jacobi preconditioned conjugate gradient.

TPU-native analogue of the reference ``LinearSolverPCG``
(``g2o/solvers/pcg/linear_solver_pcg.h:47``): instead of iterating a
``SparseBlockMatrix``, the Hessian-vector product is evaluated directly from
the cached per-edge Jacobian blocks as Σ Jᵀ(W(J v)) — batched small matmuls +
segment-sum scatter, which XLA fuses into a handful of kernels.  The
preconditioner is the inverse of the per-vertex diagonal Hessian blocks
(computed with one vmapped Cholesky per vertex type).

The CG recurrence runs entirely on device inside ``lax.while_loop``; only the
final update vector returns to the host."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from g2o_tpu.ops.smallblocks import inv_small


class PCGSolver:
    name = "pcg"

    def __init__(self, max_iter: int = 100, tol: float = 1e-6,
                 abs_tol: float = 0.0):
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        self.abs_tol = float(abs_tol)
        self._solve_jit = None
        self.aux = ()  # no solver-owned arrays

    def setup(self, problem):
        max_iter, tol = self.max_iter, self.tol

        def apply_precond(data, minv, r):
            """y = M^{-1} r with per-vertex-type inverse diagonal blocks."""
            y = jnp.zeros_like(r)
            for t, vt in problem.vertex_types.items():
                d = vt.tangent_dim
                idx = data.offsets[t][:, None] + jnp.arange(d)[None, :]
                y = y.at[idx].set(
                    jnp.einsum("nij,nj->ni", minv[t], r[idx])
                )
            return y

        def build_precond(data, lin, lam):
            minv = {}
            for t, vt in problem.vertex_types.items():
                d = vt.tangent_dim
                eye = jnp.eye(d, dtype=problem.dtype)
                blocks = lin.diag[t] + lam * eye
                # fixed vertices (zero rows in J) get a unit block -> dx = 0
                fx = data.fixed[t].astype(problem.dtype)[:, None, None]
                blocks = blocks * (1.0 - fx) + eye * fx
                minv[t] = inv_small(blocks)
            return minv

        def matvec(data, lin, lam, v):
            # damped system + unit rows on fixed slots
            return (problem.hvp_fn(data, lin, v) + lam * v
                    + data.fixed_flat * (v - lam * v))

        def solve(data, lin, lam, aux=()):
            b = lin.b
            minv = build_precond(data, lin, lam)
            x0 = jnp.zeros_like(b)
            r0 = b
            z0 = apply_precond(data, minv, r0)
            p0 = z0
            rz0 = jnp.dot(r0, z0)
            thresh = tol * tol * jnp.dot(b, b)

            def cond(carry):
                _, r, _, _, rz, it = carry
                return jnp.logical_and(it < max_iter,
                                       jnp.dot(r, r) > thresh)

            def body(carry):
                x, r, z, p, rz, it = carry
                Ap = matvec(data, lin, lam, p)
                alpha = rz / jnp.dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = apply_precond(data, minv, r)
                rz_new = jnp.dot(r, z)
                beta = rz_new / rz
                p = z + beta * p
                return (x, r, z, p, rz_new, it + 1)

            x, *_ = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
            return x

        self._solve_fn = solve          # unjitted, for fusion into one step
        self._solve_jit = jax.jit(solve)
        return self

    def solve(self, data, lin, lam=0.0):
        return self._solve_jit(data, lin, lam, self.aux)

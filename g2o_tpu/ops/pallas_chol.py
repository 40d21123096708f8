"""Batched small-matrix Cholesky / triangular solves as Pallas TPU kernels.

XLA's TPU cholesky and triangular-solve *expanders* lower to sequential
per-column loops of tiny ops at whole-program level: a (2048, 16, 16)
batched cholesky costs ~3.5 ms on a v5e (scripts/probe_f64_tpu.py), and the
supernodal factorization's 33 bucketed panel calls at sphere2500 spend
~95 ms almost entirely inside these expanders.  These kernels instead hold
the WHOLE BATCH in VMEM and run the column recurrence as an in-kernel
``fori_loop`` whose body is a handful of full-batch VPU ops (rank-1 update
over (S, n, n) lanes) — the per-column cost is ~1 µs of lane work instead
of a dispatched expander step.

Formulation is ROW-ACCESS-ONLY (TPU lane-dim dynamic indexing is slow):
the factor is built as U = L^T, so

* cholesky step j reads ROW j of the (symmetrically-updated) matrix —
  equal to column j by symmetry — scales it into U row j, and applies the
  masked rank-1 update ``A -= c c^T`` (mask ``lane >= j`` confines it to
  the trailing submatrix and protects finished U rows);
* forward solve (L Y = B) reads U row j both for the diagonal and as the
  COLUMN of L below the diagonal (update form);
* backward solve (L^T X = B) reads U row j and takes a dot with the
  already-computed trailing X (dot form).

All kernels grid over batch tiles (and rhs tiles for the solves) so VMEM
stays bounded; reference: ``cholmod``'s supernodal numeric phase
(``g2o/solvers/cholmod/linear_solver_cholmod.h:76``) is the role these
kernels fill on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_BUDGET = 4 * 1024 * 1024           # bytes per buffer set; pallas
# double-buffers grid blocks, so the true footprint is ~2x this


def _batch_tile(S, per_item_bytes, nbuf):
    """Largest batch tile within the VMEM budget: a multiple of 8
    sublanes when possible, down to single items for very large n."""
    t = int(_VMEM_BUDGET // max(per_item_bytes * nbuf, 1))
    if t >= 8:
        t = (t // 8) * 8                     # floor to sublane multiple
    t = max(t, 1)
    return min(t, S)


def _lane_pad(n):
    return -(-n // 128) * 128


def _chol_kernel(a_ref, u_ref, *, n):
    u_ref[:] = a_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def step(j, _):
        # masks via jnp.where selects ONLY: both i1->f32
        # convert_element_type and i1 minor-dim broadcasts break Mosaic
        # (infinite lowering recursion at n >= ~256, unsupported reshape
        # at any n)
        row = u_ref[:, pl.ds(j, 1), :][:, 0, :]          # (S, n)
        zero = jnp.zeros((), row.dtype)   # dtype-matched: a Python
        # 0.0 becomes an f64 scalar under x64 and Mosaic's f64
        # convert lowering recurses infinitely
        pivot = jnp.sum(jnp.where(lane == j, row, zero), axis=1)  # (S,)
        d = jnp.sqrt(pivot)
        c = jnp.where(lane >= j, row, zero) / d[:, None]  # (S, n)
        u_ref[:, pl.ds(j, 1), :] = c[:, None, :]
        # rank-1 trailing update on rows STRICTLY below j — row j just
        # became U row j and rows < j are finished U rows
        cs = jnp.where(lane > j, c, zero)
        u_ref[:] = u_ref[:] - cs[:, :, None] * c[:, None, :]
        return _

    # i32-typed bounds: under x64 a Python-int bound makes the
    # induction variable i64, promoting the iota comparisons to
    # 64-bit vectors Mosaic cannot lower
    jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                      jnp.asarray(n, jnp.int32), step,
                      jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def chol_batched(D, lower: bool = True, interpret: bool = False):
    """Batched Cholesky of SPD (S, n, n) — returns lower L (or U = L^T)."""
    S, n, _ = D.shape
    item = (_lane_pad(n) * n * 4)
    St = _batch_tile(S, item, 2)
    Sp = -(-S // St) * St
    if Sp > S:
        eye = jnp.eye(n, dtype=D.dtype)
        D = jnp.concatenate(
            [D, jnp.broadcast_to(eye, (Sp - S, n, n))], axis=0)
    # index maps derive i32 zeros from the (i32) grid index: weak
    # Python-int zeros become i64 under x64, which Mosaic cannot
    # legalize, and captured jnp constants are rejected outright
    U = pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        grid=(Sp // St,),
        in_specs=[pl.BlockSpec((St, n, n), lambda i: (i, i * 0, i * 0))],
        out_specs=pl.BlockSpec((St, n, n), lambda i: (i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((Sp, n, n), D.dtype),
        interpret=interpret,
    )(D)[:S]
    return jnp.swapaxes(U, -1, -2) if lower else U


def _solve_lower_kernel(u_ref, b_ref, y_ref, *, n):
    y_ref[:] = b_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def step(j, _):
        urow = u_ref[:, pl.ds(j, 1), :][:, 0, :]          # (S, n)
        zero = jnp.zeros((), urow.dtype)
        denom = jnp.sum(jnp.where(lane == j, urow, zero), axis=1)  # (S,)
        yj = y_ref[:, pl.ds(j, 1), :][:, 0, :] / denom[:, None]   # (S, m)
        y_ref[:, pl.ds(j, 1), :] = yj[:, None, :]
        colL = jnp.where(lane > j, urow, zero)            # L[i, j], i > j
        y_ref[:] = y_ref[:] - colL[:, :, None] * yj[:, None, :]
        return _

    # i32-typed bounds: under x64 a Python-int bound makes the
    # induction variable i64, promoting the iota comparisons to
    # 64-bit vectors Mosaic cannot lower
    jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                      jnp.asarray(n, jnp.int32), step,
                      jnp.asarray(0, jnp.int32))


def _solve_upper_kernel(u_ref, b_ref, x_ref, *, n):
    x_ref[:] = jnp.zeros_like(x_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def step(k, _):
        j = n - 1 - k
        urow = u_ref[:, pl.ds(j, 1), :][:, 0, :]          # (S, n)
        zero = jnp.zeros((), urow.dtype)
        denom = jnp.sum(jnp.where(lane == j, urow, zero), axis=1)
        # r = sum_{i>j} U[j, i] x[i, :]
        r = jnp.sum(jnp.where(lane > j, urow, zero)[:, :, None]
                    * x_ref[:], axis=1)                   # (S, m)
        bj = b_ref[:, pl.ds(j, 1), :][:, 0, :]
        x_ref[:, pl.ds(j, 1), :] = \
            ((bj - r) / denom[:, None])[:, None, :]
        return _

    # i32-typed bounds: under x64 a Python-int bound makes the
    # induction variable i64, promoting the iota comparisons to
    # 64-bit vectors Mosaic cannot lower
    jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                      jnp.asarray(n, jnp.int32), step,
                      jnp.asarray(0, jnp.int32))


def _solve(kernel, L_is_lower, L, B, interpret=False):
    S, n, _ = L.shape
    m = B.shape[-1]
    U = jnp.swapaxes(L, -1, -2) if L_is_lower else L
    mp = _lane_pad(m)
    item_u = _lane_pad(n) * n * 4
    item_bm = mp * n * 4 * 2
    St = _batch_tile(S, item_u + item_bm, 1)
    Sp = -(-S // St) * St
    if Sp > S:
        eye = jnp.eye(n, dtype=L.dtype)
        U = jnp.concatenate(
            [U, jnp.broadcast_to(eye, (Sp - S, n, n))], axis=0)
        B = jnp.concatenate(
            [B, jnp.zeros((Sp - S, n, m), B.dtype)], axis=0)
    out = pl.pallas_call(
        functools.partial(kernel, n=n),
        grid=(Sp // St,),
        in_specs=[pl.BlockSpec((St, n, n), lambda i: (i, i * 0, i * 0)),
                  pl.BlockSpec((St, n, m), lambda i: (i, i * 0, i * 0))],
        out_specs=pl.BlockSpec((St, n, m), lambda i: (i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((Sp, n, m), B.dtype),
        interpret=interpret,
    )(U, B)
    return out[:S]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lower_batched(L, B, interpret: bool = False):
    """Solve L Y = B for batched lower-triangular L (S, n, n), B (S, n, m)."""
    return _solve(_solve_lower_kernel, True, L, B, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_upper_batched(L, B, interpret: bool = False):
    """Solve L^T X = B (upper solve with the LOWER factor given)."""
    return _solve(_solve_upper_kernel, True, L, B, interpret)


def use_pallas(dtype, n: int = 0, m: int = 0) -> bool:
    """Route batched small-chol/trisolve through Pallas: TPU + f32 only
    (CPU LAPACK is faster on host; f64 is unsupported in Pallas TPU),
    and only while a SINGLE batch item fits the VMEM budget — a
    (1, 2688, 2688) coarse factor is 27.6 MB and cannot be tiled by this
    whole-rows-in-VMEM formulation."""
    import os

    if os.environ.get("G2O_TPU_PALLAS_CHOL", "1") == "0":
        return False
    if n:
        item = _lane_pad(n) * n * 4 + (_lane_pad(m) * n * 4 * 2 if m else
                                       _lane_pad(n) * n * 4)
        if item > _VMEM_BUDGET:
            return False
    return (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32))

"""Pallas TPU kernels for the hot assembly ops.

``segment_sum_mxu``: segment-sum of (N, D) rows into (S, D) buckets computed
as a sequence of one-hot MXU matmuls instead of an XLA scatter-add.  TPU
scatters serialize per update; reformulating the reduction as
``onehot(seg_ids)^T @ values`` turns the hottest accumulation of the Schur
complement (pair-product aggregation into unique camera-block pairs,
``g2o_tpu/core/solvers/schur.py``) and of H/b assembly into dense systolic
work.  The grid is (segment tiles, row tiles) with the row axis innermost so
each output tile stays resident in VMEM across the reduction.

``gather_mxu``: the inverse lookup ``table[idx]`` as per-row-tile one-hot
MXU matmuls with the whole (S, D) table resident in VMEM — the (N, S)
one-hot mask only ever exists one VMEM tile at a time, so no HBM buffer of
that shape is materialised regardless of how XLA schedules the surrounding
loop body (the XLA ``dot(one_hot(idx), table)`` form relies on operand
fusion that does not always fire inside ``lax.while_loop`` bodies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(seg_ref, val_ref, out_ref):
    i = pl.program_id(1)  # row-tile index (innermost)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:]                      # (block_n, 1) int32
    block_s = out_ref.shape[0]
    j = pl.program_id(0)
    row_ids = j * block_s + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_s), dimension=1)
    onehot = jnp.equal(seg, row_ids).astype(val_ref.dtype)  # (block_n, block_s)
    # HIGHEST precision: the default TPU matmul rounds f32 operands to
    # bf16, which is too lossy for Hessian accumulation
    out_ref[:] += jax.lax.dot_general(
        onehot, val_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _block_n_for(n_seg: int) -> int:
    # keep the per-tile one-hot (block_n, S) under ~8 MB of VMEM
    if n_seg <= 2048:
        return 1024
    return max(128, (8 << 20) // (4 * n_seg) // 128 * 128)


def _onehot_of(idx_ref, n_seg, dtype):
    idx = idx_ref[:]                                   # (block_n, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n_seg), 1)
    return jnp.equal(idx, cols).astype(dtype)          # (block_n, n_seg)


def _mk_gather_kernel(precision, dims_major):
    def kernel(idx_ref, table_ref, out_ref):
        oh = _onehot_of(idx_ref, table_ref.shape[0], table_ref.dtype)
        if dims_major:                                  # out (D, block_n)
            out_ref[:] = jax.lax.dot_general(
                table_ref[:], oh, (((0,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype, precision=precision)
        else:                                           # out (block_n, D)
            out_ref[:] = jax.lax.dot_general(
                oh, table_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=out_ref.dtype, precision=precision)
    return kernel


def _mk_scatter_kernel(precision, dims_major):
    def kernel(idx_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        oh = _onehot_of(idx_ref, out_ref.shape[0], val_ref.dtype)
        if dims_major:                                  # val (D, block_n)
            out_ref[:] += jax.lax.dot_general(
                oh, val_ref[:], (((0,), (1,)), ((), ())),
                preferred_element_type=out_ref.dtype, precision=precision)
        else:                                           # val (block_n, D)
            out_ref[:] += jax.lax.dot_general(
                oh, val_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=out_ref.dtype, precision=precision)
    return kernel


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def gather_t_mxu(idx, table, *, precision=None, interpret: bool = False):
    """Dims-major gather ``table[idx]`` → ``(D, N)`` as per-row-tile
    one-hot MXU matmuls: the (N, S) one-hot exists one VMEM tile at a
    time.  Out-of-range ids yield zero rows (XLA one-hot semantics).
    Measured vs the XLA ``dot(table, one_hot(idx))`` form at Venice
    shapes (900k rows, 800 segments, D=9): 1.15 → ~0.1 ms (HIGHEST)."""
    S, d = table.shape
    n = idx.shape[0]
    block_n = _block_n_for(S)
    n_pad = (-n) % block_n
    if n_pad:
        idx = jnp.concatenate([idx, jnp.full((n_pad,), S, idx.dtype)])
    grid = (_cdiv(n + n_pad, block_n),)
    out = pl.pallas_call(
        _mk_gather_kernel(precision, True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, n + n_pad), table.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None], table)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("n_seg", "precision",
                                             "interpret"))
def segment_sum_t_mxu(idx, rows_t, n_seg: int, *, precision=None,
                      interpret: bool = False):
    """Dims-major segment sum: rows ``(D, N)`` summed by ``idx`` into
    ``(n_seg, D)`` — per-row-tile one-hot MXU matmuls accumulated in a
    VMEM-resident output (grid steps run sequentially on TPU).
    Out-of-range ids drop their rows."""
    d, n = rows_t.shape
    block_n = _block_n_for(n_seg)
    n_pad = (-n) % block_n
    if n_pad:
        idx = jnp.concatenate([idx, jnp.full((n_pad,), n_seg, idx.dtype)])
        rows_t = jnp.concatenate(
            [rows_t, jnp.zeros((d, n_pad), rows_t.dtype)], axis=1)
    grid = (_cdiv(n + n_pad, block_n),)
    return pl.pallas_call(
        _mk_scatter_kernel(precision, True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_seg, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg, d), rows_t.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None], rows_t)


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def gather_mxu_rows(idx, table, *, precision=None, interpret: bool = False):
    """Edge-major gather ``table[idx]`` → ``(N, D)`` (see
    :func:`gather_t_mxu`)."""
    S, d = table.shape
    n = idx.shape[0]
    block_n = _block_n_for(S)
    n_pad = (-n) % block_n
    if n_pad:
        idx = jnp.concatenate([idx, jnp.full((n_pad,), S, idx.dtype)])
    grid = (_cdiv(n + n_pad, block_n),)
    out = pl.pallas_call(
        _mk_gather_kernel(precision, False),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, d), table.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None], table)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("n_seg", "precision",
                                             "interpret"))
def segment_sum_rows_mxu(idx, rows, n_seg: int, *, precision=None,
                         interpret: bool = False):
    """Edge-major segment sum: rows ``(N, D)`` → ``(n_seg, D)`` (see
    :func:`segment_sum_t_mxu`)."""
    n, d = rows.shape
    block_n = _block_n_for(n_seg)
    n_pad = (-n) % block_n
    if n_pad:
        idx = jnp.concatenate([idx, jnp.full((n_pad,), n_seg, idx.dtype)])
        rows = jnp.concatenate(
            [rows, jnp.zeros((n_pad, d), rows.dtype)], axis=0)
    grid = (_cdiv(n + n_pad, block_n),)
    return pl.pallas_call(
        _mk_scatter_kernel(precision, False),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_seg, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_seg, d), rows.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None], rows)


@functools.partial(jax.jit, static_argnames=("num_segments", "block_n",
                                             "block_s", "interpret"))
def segment_sum_mxu(values, seg_ids, num_segments: int, *,
                    block_n: int = 1024, block_s: int = 512,
                    interpret: bool = False):
    """MXU-based segment sum.

    Args:
      values: (N, D) float array.
      seg_ids: (N,) int32 in [0, num_segments).
      num_segments: static segment count S.
    Returns (S, D)."""
    n, d = values.shape
    dtype = values.dtype
    block_n = min(block_n, max(8, n))
    block_s = min(block_s, max(8, num_segments))

    n_pad = (-n) % block_n
    s_pad = (-num_segments) % block_s
    if n_pad:
        values = jnp.concatenate(
            [values, jnp.zeros((n_pad, d), dtype=dtype)], axis=0)
        # padded rows point at a bucket that never materialises
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.full((n_pad,), num_segments + s_pad,
                               dtype=seg_ids.dtype)])
    S = num_segments + s_pad
    N = n + n_pad

    grid = (_cdiv(S, block_s), _cdiv(N, block_n))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_s, d), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, d), dtype),
        interpret=interpret,
    )(seg_ids.astype(jnp.int32)[:, None], values)
    return out[:num_segments]

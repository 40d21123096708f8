"""Pallas TPU kernel for the hot Schur pair-product aggregation.

``segment_sum_mxu``: segment-sum of (N, D) rows into (S, D) buckets computed
as a sequence of one-hot MXU matmuls instead of an XLA scatter-add.  TPU
scatters serialize per update; reformulating the reduction as
``onehot(seg_ids)^T @ values`` turns the hottest accumulation of the Schur
complement (pair-product aggregation into unique camera-block pairs,
``g2o_tpu/core/solvers/schur.py``) into dense systolic work.  The grid is
(segment tiles, row tiles) with the row axis innermost so each output tile
stays resident in VMEM across the reduction.

Two further generations of experimental one-hot gather/scatter kernels
(per-row-tile gridded v1; single-grid-step double-buffered-DMA v2) were
built, measured SLOWER than the operand-fused XLA dot form on every shape
(tables in ``ops/onehot.py``), and moved to
``scripts/pallas_onehot_experimental.py`` as documented dead ends.
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

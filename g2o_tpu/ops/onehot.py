"""One-hot MXU gather/scatter — exact f32 replacements for row-serialized
TPU gathers/scatters when the segment count is small enough to amortise.

TPU scatter-adds process rows near-serially (measured 8.3 ms for 900k
9-wide rows into 800 segments on 1x v5e); the same reduction as
``onehot(idx)^T @ rows`` with ``Precision.HIGHEST`` runs in 2.5-3.0 ms on
the systolic array and is EXACT in f32 (one-hot entries are exactly
representable, accumulation happens in f32).  XLA fuses the one-hot
construction into the matmul, so the (N, S) mask is never materialised.

Out-of-range ids produce all-zero one-hot rows: gathers return zero rows,
scatters drop the row — matching XLA's clip/drop semantics for padding
sentinels.

Hand Pallas kernels for these ops were built twice and MEASURED OFF both
times (now in ``scripts/pallas_onehot_experimental.py``).  Round 1
(2026-08-19, 1x v5e, Venice shapes): gridded kernels ~10x slower
(per-grid-step overhead over ~880 row tiles).  Round 2 (2026-08-20): the
restructured v2 kernels (ONE grid step, in-kernel double-buffered
HBM->VMEM DMA loop, relayout-free (S, block) one-hot orientation) removed
that overhead — and still LOSE to the XLA dot form on every shape,
measured by while-loop marginal cost with a non-narrowing consumer
(``scripts/probe_pallas2.py``, 900k rows / 800 segments):

=========  ==========  ===========  ===========
op          XLA dot     pallas v1    pallas v2
=========  ==========  ===========  ===========
scatter d9    1.3-1.4 ms   3.8-5.4 ms   4.7-5.1 ms
gather  d9    0.70 ms      1.1-3.4 ms   1.4-1.7 ms
gather  d81   2.5 ms       4.9 ms       4.9 ms
=========  ==========  ===========  ===========

The cost is the narrow-N one-hot MXU product itself (9/128 lanes useful),
which XLA's operand-fused dot already executes optimally; a hand kernel
re-does the same math with extra DMA orchestration.  Beating it requires a
different ALGORITHM (camera-sorted runs + static boundary reductions) —
see COMPONENTS.md."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def onehot_scatter_add(idx, rows, n_seg: int, precision=_HI):
    """Sum rows[i] into segment idx[i]: (N, ...) -> (n_seg, ...).

    ``precision`` defaults to exact f32 (HIGHEST); iterative-solver matvecs
    may pass DEFAULT (bf16 MXU passes, ~1e-3 relative) — measured ~5x
    faster per op at Venice scale."""
    flat = rows.reshape(rows.shape[0], -1)
    oh = jax.nn.one_hot(idx, n_seg, dtype=flat.dtype)
    out = jax.lax.dot_general(oh, flat, (((0,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=flat.dtype)
    return out.reshape((n_seg,) + rows.shape[1:])


def onehot_gather(idx, table, precision=_HI):
    """table[idx]: (S, ...) -> (N, ...).  See ``onehot_scatter_add`` for
    the ``precision`` contract."""
    flat = table.reshape(table.shape[0], -1)
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=flat.dtype)
    out = jax.lax.dot_general(oh, flat, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=flat.dtype)
    return out.reshape((idx.shape[0],) + table.shape[1:])


def onehot_gather_t(idx, table, precision=_HI):
    """Dims-major gather: table ``(S, D)`` -> ``(D, N)`` rows of
    ``table[idx]`` with the row axis minormost, for consumers that keep the
    edge axis on lanes (no relayout of the (D, N) output needed)."""
    flat = table.reshape(table.shape[0], -1)               # (S, D)
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=flat.dtype)   # (N, S)
    return jax.lax.dot_general(flat, oh, (((0,), (1,)), ((), ())),
                               precision=precision,
                               preferred_element_type=flat.dtype)


def onehot_scatter_add_t(idx, rows_t, n_seg: int, precision=_HI):
    """Dims-major segment sum: rows_t ``(D, N)`` -> ``(n_seg, D)``.

    The one-hot dot contracts the row axis directly
    (``rows_t @ onehot(idx)``), so dims-major producers (see the
    linearize assembly fast path) feed it without a relayout back to
    row-major."""
    oh = jax.nn.one_hot(idx, n_seg, dtype=rows_t.dtype)   # (N, n_seg)
    out_t = jax.lax.dot_general(rows_t, oh, (((1,), (0,)), ((), ())),
                                precision=precision,
                                preferred_element_type=rows_t.dtype)
    return out_t.T                                         # (n_seg, D)

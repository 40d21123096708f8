"""Pallas MXU segment-sum kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.ops.pallas_kernels import segment_sum_mxu


@pytest.mark.parametrize("n,d,s", [(1000, 81, 37), (5000, 16, 300),
                                   (100, 128, 8), (7, 4, 2)])
def test_segment_sum_mxu_matches_reference(n, d, s):
    rng = np.random.default_rng(n)
    vals = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, s, size=n).astype(np.int32))
    out = segment_sum_mxu(vals, seg, s, interpret=True)
    ref = jax.ops.segment_sum(vals, seg, num_segments=s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_segment_sum_mxu_empty_segments():
    vals = jnp.ones((10, 3), dtype=jnp.float32)
    seg = jnp.zeros(10, dtype=jnp.int32)  # everything into bucket 0
    out = segment_sum_mxu(vals, seg, 5, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 10.0)
    np.testing.assert_allclose(np.asarray(out[1:]), 0.0)


@pytest.mark.parametrize("dims_major", [True, False])
def test_onehot_kernels_match_xla(dims_major):
    """The tile-local one-hot gather/segment-sum kernels (experimental
    dead-ends, kept under scripts/ — measured slower than the XLA dot form
    on TPU, tables in ops/onehot.py) must still match the XLA dot forms
    exactly in f32 (interpret mode)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from pallas_onehot_experimental import (gather_mxu_rows, gather_t_mxu,
                                            segment_sum_rows_mxu,
                                            segment_sum_t_mxu)

    rng = np.random.default_rng(0)
    N, S, D = 700, 37, 5
    idx = jnp.asarray(rng.integers(0, S + 3, size=N).astype(np.int32))
    # ids >= S are out of range: gathers yield zero rows, scatters drop
    table = jnp.asarray(rng.standard_normal((S, D)), dtype=jnp.float32)
    rows = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.float32)

    hi = jax.lax.Precision.HIGHEST
    valid = (np.asarray(idx) < S)
    ref_gather = np.where(valid[:, None], np.asarray(table)
                          [np.minimum(np.asarray(idx), S - 1)], 0.0)
    ref_scatter = np.zeros((S, D), np.float32)
    np.add.at(ref_scatter, np.asarray(idx)[valid], np.asarray(rows)[valid])

    if dims_major:
        g = np.asarray(gather_t_mxu(idx, table, precision=hi,
                                    interpret=True))
        np.testing.assert_allclose(g.T, ref_gather, atol=1e-6)
        s = np.asarray(segment_sum_t_mxu(idx, rows.T, S, precision=hi,
                                         interpret=True))
        np.testing.assert_allclose(s, ref_scatter, atol=1e-4)
    else:
        g = np.asarray(gather_mxu_rows(idx, table, precision=hi,
                                       interpret=True))
        np.testing.assert_allclose(g, ref_gather, atol=1e-6)
        s = np.asarray(segment_sum_rows_mxu(idx, rows, S, precision=hi,
                                            interpret=True))
        np.testing.assert_allclose(s, ref_scatter, atol=1e-4)

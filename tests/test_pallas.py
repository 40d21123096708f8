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

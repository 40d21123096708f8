"""Degree-bucketed segment layout (``g2o_tpu/ops/bucketed.py``): the
gather/scatter-free reduction plan used by the implicit Schur solver's TPU
fast path."""

import jax.numpy as jnp
import numpy as np
import pytest

from g2o_tpu.ops.bucketed import (bucket_broadcast, bucket_by_segment,
                                  bucket_reduce)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bucket_reduce_matches_scatter(seed):
    rng = np.random.default_rng(seed)
    S = int(rng.integers(3, 60))
    E = int(rng.integers(0, 400))
    seg = rng.integers(0, S, size=E)
    plan = bucket_by_segment(seg, S)
    # seg_perm_full is a true permutation of all segments
    assert sorted(plan.seg_perm_full.tolist()) == list(range(S))
    rows = rng.normal(size=(E, 3))
    padded = jnp.concatenate(
        [jnp.asarray(rows), jnp.zeros((1, 3))])[plan.perm_src]
    red = np.asarray(bucket_reduce(plan, padded))
    ref = np.zeros((S, 3))
    np.add.at(ref, seg, rows)
    np.testing.assert_allclose(red, ref[plan.seg_perm], atol=1e-12)


def test_bucket_broadcast_assigns_segment_values():
    rng = np.random.default_rng(7)
    seg = rng.integers(0, 20, size=150)
    plan = bucket_by_segment(seg, 20)
    sv = rng.normal(size=(len(plan.seg_perm), 2))
    bc = np.asarray(bucket_broadcast(plan, jnp.asarray(sv)))
    off, k = 0, 0
    for n, d in zip(plan.counts, plan.degrees):
        blk = bc[off:off + n * d].reshape(n, d, 2)
        np.testing.assert_allclose(blk, np.broadcast_to(
            sv[k:k + n][:, None, :], (n, d, 2)))
        off += n * d
        k += n


def test_bucket_merging_bounds_kernel_count():
    rng = np.random.default_rng(3)
    # degrees spread over two decades -> many ladder levels pre-merge
    deg = rng.integers(1, 200, size=500)
    seg = np.repeat(np.arange(500), deg)
    plan = bucket_by_segment(seg, 500, max_buckets=4)
    assert len(plan.degrees) <= 4
    # padding stays bounded even after merging
    assert plan.pad_ratio < 2.0


def test_bucket_empty_segments():
    seg = np.array([5, 5, 5, 9])
    plan = bucket_by_segment(seg, 12)
    assert set(plan.seg_perm.tolist()) == {5, 9}
    assert sorted(plan.seg_perm_full.tolist()) == list(range(12))
    rows = np.arange(8, dtype=np.float64).reshape(4, 2)
    padded = jnp.concatenate(
        [jnp.asarray(rows), jnp.zeros((1, 2))])[plan.perm_src]
    red = np.asarray(bucket_reduce(plan, padded))
    ref = np.zeros((12, 2))
    np.add.at(ref, seg, rows)
    np.testing.assert_allclose(red, ref[plan.seg_perm])

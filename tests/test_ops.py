"""Unit tests for the compute primitives in ops/."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoprog_tpu.ops.mixtoken import mix_lambda, mix_tokens, rand_bbox, region_mask
from autoprog_tpu.ops.unfold import avg_pool_ceil, fold_nhwc, unfold_nhwc


def test_unfold_matches_manual_gather():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k, s, p = 3, 2, 1
    got = np.asarray(unfold_nhwc(jnp.asarray(x), k, s, p))
    xp = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    h = (8 + 2 * p - k) // s + 1
    for i in range(h):
        for j in range(h):
            for ki in range(k):
                for kj in range(k):
                    np.testing.assert_array_equal(
                        got[:, i, j, ki, kj], xp[:, i * s + ki, j * s + kj])


def test_fold_is_adjoint_of_unfold():
    """<unfold(x), p> == <x, fold(p)> for random x, p (exact transpose)."""
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 4))
    patches = jax.random.normal(k2, (2, 4, 4, 3, 3, 4))
    lhs = jnp.vdot(unfold_nhwc(x, 3, 2, 1), patches)
    rhs = jnp.vdot(x, fold_nhwc(patches, (8, 8), 3, 2, 1))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-5)


def test_fold_unfold_counts_overlap():
    """fold(unfold(ones)) equals the per-pixel window coverage count."""
    k, s, p, H = 3, 2, 1, 8
    x = jnp.ones((1, H, H, 1))
    y = np.asarray(fold_nhwc(unfold_nhwc(x, k, s, p), (H, H), k, s, p))[0, :, :, 0]
    # direct coverage count over the padded grid
    count = np.zeros((H + 2 * p, H + 2 * p))
    n = (H + 2 * p - k) // s + 1
    for i in range(n):
        for j in range(n):
            count[i * s:i * s + k, j * s:j * s + k] += 1
    np.testing.assert_array_equal(y, count[p:-p, p:-p])


def test_avg_pool_even():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = avg_pool_ceil(x, 2)
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, 0]), (0 + 1 + 4 + 5) / 4)


def test_rand_bbox_bounds_and_lambda():
    key = jax.random.PRNGKey(0)
    for i in range(10):
        bbox = rand_bbox(jax.random.fold_in(key, i), 14, 14)
        b = np.asarray(bbox)
        assert 0 <= b[0] <= b[2] <= 14
        assert 0 <= b[1] <= b[3] <= 14
        lam = float(mix_lambda(bbox, 196))
        assert 0.0 <= lam <= 1.0


def test_mix_tokens_swaps_rectangle():
    x = jnp.stack([jnp.zeros((4, 4, 2)), jnp.ones((4, 4, 2))])  # B=2
    bbox = jnp.array([1, 1, 3, 3], jnp.int32)
    y = mix_tokens(x, bbox, scale=1)
    mask = np.asarray(region_mask(bbox, 4, 4))
    # inside the box, batch elements swapped; outside untouched
    np.testing.assert_array_equal(np.asarray(y[0, mask]), 1.0)
    np.testing.assert_array_equal(np.asarray(y[1, mask]), 0.0)
    np.testing.assert_array_equal(np.asarray(y[0, ~mask]), 0.0)


def test_mix_tokens_involution():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 8, 8, 3))
    bbox = jnp.array([2, 1, 6, 5], jnp.int32)
    y = mix_tokens(mix_tokens(x, bbox), bbox)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))

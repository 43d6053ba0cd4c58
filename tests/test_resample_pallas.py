"""fused_resample (Pallas inverse-CDF + bitonic union merge) vs the XLA
reference formulation in core/sampling.py."""

import os

os.environ.setdefault("AON_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core import sampling
from aon_tpu.ops.resample_pallas import (
    fused_resample,
    sorted_per_ray_uniform,
    sorted_uniform,
)


def _fixture(rng, B=12, n_t=65, num_samples=128):
    t_vals = np.sort(rng.uniform(2.0, 6.0, (B, n_t)), axis=-1).astype(np.float32)
    bins = 0.5 * (t_vals[:, 1:] + t_vals[:, :-1])  # (B, 64)
    weights = rng.uniform(0.0, 1.0, (B, bins.shape[1] - 1)).astype(np.float32)
    # a few rays with ~zero mass exercise the eps-padding path
    weights[:2] *= 1e-9
    return jnp.asarray(t_vals), jnp.asarray(bins), jnp.asarray(weights)


def _xla_union(t_vals, bins, weights, u):
    """sorted_piecewise_constant_pdf with externally supplied u + union sort."""
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding
    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )
    idx = jnp.sum((u[..., None, :] >= cdf[..., :, None]).astype(jnp.int32), axis=-2)
    lo = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    hi = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    bin0 = jnp.take_along_axis(bins, lo, axis=-1)
    bin1 = jnp.take_along_axis(bins, hi, axis=-1)
    cdf0 = jnp.take_along_axis(cdf, lo, axis=-1)
    cdf1 = jnp.take_along_axis(cdf, hi, axis=-1)
    denom = cdf1 - cdf0
    t = jnp.clip(jnp.nan_to_num((u - cdf0) / denom, nan=0.0), 0.0, 1.0)
    t = jnp.where(denom <= 0, 0.0, t)
    samples = bin0 + t * (bin1 - bin0)
    return jnp.sort(jnp.concatenate([t_vals, samples], axis=-1), axis=-1)


@pytest.mark.parametrize("sorted_mode", ["linspace", "random_sorted"])
def test_fused_resample_matches_xla(rng, sorted_mode):
    t_vals, bins, weights = _fixture(rng)
    B = t_vals.shape[0]
    n = 128
    if sorted_mode == "linspace":
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - 2.0**-32, n), (B, n))
    else:
        u = jnp.asarray(np.sort(rng.uniform(0.0, 1.0, (B, n)), axis=-1), jnp.float32)
    got = fused_resample(t_vals, bins, weights, u)
    want = _xla_union(t_vals, bins, weights, u)
    assert got.shape == (B, 65 + 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # sortedness
    g = np.asarray(got)
    assert (np.diff(g, axis=-1) >= -1e-7).all()


def test_fused_resample_matches_sample_pdf_deterministic(rng):
    """End-to-end: deterministic sample_pdf (linspace u) == fused path."""
    t_vals, bins, weights = _fixture(rng)
    B = t_vals.shape[0]
    origins = jnp.zeros((B, 3))
    dirs = jnp.ones((B, 3))
    want_t, _ = sampling.sample_pdf(
        None, bins, weights, origins, dirs, t_vals, 128, randomized=False
    )
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - 2.0**-32, 128), (B, 128))
    got_t = fused_resample(t_vals, bins, weights, u)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-6)


def test_sorted_uniform_distribution():
    key = jax.random.PRNGKey(0)
    u = sorted_uniform(key, (2000, 16))
    arr = np.asarray(u)
    assert (np.diff(arr, axis=-1) >= 0).all()
    assert 0.0 <= arr.min() and arr.max() < 1.0
    # each order statistic's mean ~ k/(n+1)
    means = arr.mean(axis=0)
    expect = (np.arange(1, 17)) / 17.0
    np.testing.assert_allclose(means, expect, atol=0.02)


def test_sorted_per_ray_uniform_layout_independent():
    key = jax.random.PRNGKey(3)
    ids = jnp.arange(64)
    full = sorted_per_ray_uniform(key, ids, 8)
    half = sorted_per_ray_uniform(key, ids[17:23], 8)
    np.testing.assert_array_equal(np.asarray(full[17:23]), np.asarray(half))


def test_fused_resample_ragged_batch(rng):
    """Batch sizes that don't divide the tile are padded and sliced back."""
    t_vals, bins, weights = _fixture(rng, B=7)
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - 2.0**-32, 128), (7, 128))
    got = fused_resample(t_vals, bins, weights, u)
    want = _xla_union(t_vals, bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

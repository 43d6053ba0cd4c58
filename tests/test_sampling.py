"""Unit tests for aon_tpu.core.sampling against the reference math contracts.

The inverse-CDF test reimplements the reference's masked max/min inversion
(helper.py:232-241) in numpy and asserts our comparison-count formulation is
numerically identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core import sampling


def test_cast_rays_shape_and_value():
    o = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    t = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    pts = sampling.cast_rays(t, o, d)
    assert pts.shape == (2, 2, 3)
    np.testing.assert_allclose(pts[0, 1], [0.0, 0.0, -2.0])
    np.testing.assert_allclose(pts[1, 0], [1.0, 3.0, 0.0])


def test_sample_along_rays_deterministic_linspace():
    B, N = 4, 64
    o = jnp.zeros((B, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (B, 1))
    t, pts = sampling.sample_along_rays(None, o, d, N, 2.0, 6.0, randomized=False)
    assert t.shape == (B, N + 1)
    assert pts.shape == (B, N + 1, 3)
    np.testing.assert_allclose(t[0], np.linspace(2.0, 6.0, N + 1), rtol=1e-6)


def test_sample_along_rays_lindisp():
    B, N = 2, 8
    o = jnp.zeros((B, 3))
    d = jnp.ones((B, 3))
    t, _ = sampling.sample_along_rays(None, o, d, N, 2.0, 6.0, randomized=False, lindisp=True)
    s = np.linspace(0, 1, N + 1)
    expected = 1.0 / (1.0 / 2.0 * (1 - s) + 1.0 / 6.0 * s)
    np.testing.assert_allclose(t[0], expected, rtol=1e-6)


def test_sample_along_rays_randomized_within_bins():
    B, N = 16, 64
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((B, 3))
    d = jnp.ones((B, 3))
    t, _ = sampling.sample_along_rays(key, o, d, N, 2.0, 6.0, randomized=True)
    base = np.linspace(2.0, 6.0, N + 1)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([base[:1], mids])
    upper = np.concatenate([mids, base[-1:]])
    t = np.asarray(t)
    assert (t >= lower - 1e-6).all() and (t <= upper + 1e-6).all()
    # jitter must differ across rays
    assert not np.allclose(t[0], t[1])


def test_pos_enc_channels_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = sampling.pos_enc(x, 0, 10)
    assert out.shape == (1, (2 * 10 + 1) * 3)
    # identity passthrough first
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    # frequency-major layout: block d holds sin(x * 2^d)
    x_np = np.asarray(x[0])
    for d in range(10):
        np.testing.assert_allclose(
            out[0, 3 + d * 3 : 3 + (d + 1) * 3], np.sin(x_np * 2**d), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            out[0, 33 + d * 3 : 33 + (d + 1) * 3],
            np.sin(x_np * 2**d + 0.5 * np.pi),
            rtol=1e-5,
            atol=1e-6,
        )


def test_pos_enc_viewdir_channels():
    x = jnp.ones((7, 3))
    assert sampling.pos_enc(x, 0, 4).shape == (7, 27)


def _reference_pdf_numpy(bins, weights, num_samples, u):
    """Direct numpy port of the reference masked inversion (helper.py:203-243)."""
    eps = 1e-5
    weight_sum = weights.sum(axis=-1, keepdims=True)
    padding = np.maximum(0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding
    pdf = weights / weight_sum
    cdf = np.minimum(1.0, np.cumsum(pdf[..., :-1], axis=-1))
    cdf = np.concatenate(
        [np.zeros_like(cdf[..., :1]), cdf, np.ones_like(cdf[..., :1])], axis=-1
    )
    mask = u[..., None, :] >= cdf[..., :, None]
    bin0 = np.max(np.where(mask, bins[..., None], bins[..., :1, None]), axis=-2)
    bin1 = np.min(np.where(~mask, bins[..., None], bins[..., -1:, None]), axis=-2)
    cdf0 = np.max(np.where(mask, cdf[..., None], cdf[..., :1, None]), axis=-2)
    cdf1 = np.min(np.where(~mask, cdf[..., None], cdf[..., -1:, None]), axis=-2)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(np.nan_to_num((u - cdf0) / (cdf1 - cdf0), nan=0.0), 0, 1)
    return bin0 + t * (bin1 - bin0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_inverse_cdf_matches_reference_masked_formulation(seed, rng):
    B, N, S = 8, 64, 128
    g = np.random.default_rng(seed)
    bins = np.sort(g.uniform(2.0, 6.0, size=(B, N)).astype(np.float32), axis=-1)
    weights = g.uniform(0.0, 1.0, size=(B, N - 1)).astype(np.float32)
    weights[0] *= 0.0  # degenerate all-zero weights hits the eps-padding path
    u = np.broadcast_to(
        np.linspace(0.0, 1.0 - 2**-32, S, dtype=np.float32), (B, S)
    ).copy()

    ours = sampling.sorted_piecewise_constant_pdf(
        None, jnp.asarray(bins), jnp.asarray(weights), S, randomized=False
    )
    ref = _reference_pdf_numpy(bins, weights, S, u)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_inverse_cdf_distribution():
    """Samples should concentrate in high-weight bins."""
    B, N = 1, 64
    bins = np.linspace(2.0, 6.0, N, dtype=np.float32)[None]
    weights = np.zeros((B, N - 1), dtype=np.float32)
    weights[:, 30] = 1.0  # all mass in bin [bins[30], bins[31]]
    out = sampling.sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), 256, randomized=True
    )
    out = np.asarray(out)
    lo, hi = bins[0, 30], bins[0, 31]
    frac_inside = np.mean((out >= lo - 1e-4) & (out <= hi + 1e-4))
    assert frac_inside > 0.95


def test_sample_pdf_sorted_union_and_stopgrad():
    B, N, S = 4, 64, 128
    key = jax.random.PRNGKey(3)
    o = jnp.zeros((B, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (B, 1))
    t_vals, _ = sampling.sample_along_rays(None, o, d, N, 2.0, 6.0, randomized=False)
    t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
    weights = jnp.ones((B, N + 1))

    t_union, coords = sampling.sample_pdf(
        key, t_mids, weights[..., 1:-1], o, d, t_vals, S, randomized=True
    )
    assert t_union.shape == (B, N + 1 + S)
    assert coords.shape == (B, N + 1 + S, 3)
    t_np = np.asarray(t_union)
    assert (np.diff(t_np, axis=-1) >= 0).all()

    # gradient of fine samples w.r.t. weights must be zero (detached)
    def f(w):
        t, _ = sampling.sample_pdf(
            key, t_mids, w, o, d, t_vals, S, randomized=False
        )
        return jnp.sum(t)

    grad = jax.grad(f)(weights[..., 1:-1])
    np.testing.assert_allclose(np.asarray(grad), 0.0)

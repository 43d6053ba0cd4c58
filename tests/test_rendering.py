"""Volume rendering tests: closed forms for constant-density media."""

import jax.numpy as jnp
import numpy as np

from aon_tpu.core import rendering


def _setup(B=4, S=65, sigma=0.5, near=2.0, far=6.0):
    t = np.broadcast_to(np.linspace(near, far, S, dtype=np.float32), (B, S)).copy()
    rgb = np.ones((B, S, 3), dtype=np.float32) * 0.7
    density = np.full((B, S, 1), sigma, dtype=np.float32)
    dirs = np.tile(np.array([[0.0, 0.0, -1.0]], dtype=np.float32), (B, 1))
    return jnp.asarray(rgb), jnp.asarray(density), jnp.asarray(t), jnp.asarray(dirs)


def test_constant_sigma_closed_form_acc():
    """For constant sigma the final sample's open interval (1e10) forces
    alpha=1 there, so acc ~ 1; transmittance decays as exp(-sigma * dist)."""
    rgb, density, t, dirs = _setup(sigma=0.5)
    comp, acc, weights, depth = rendering.volumetric_rendering(
        rgb, density, t, dirs, white_bkgd=False
    )
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(comp), 0.7, atol=1e-4)

    # Weight at sample k (all but the last) follows the closed form
    # alpha * (1 - alpha + eps)^k for constant sigma and uniform spacing.
    t_np = np.asarray(t)[0]
    w = np.asarray(weights)[0]
    sigma, delta = 0.5, t_np[1] - t_np[0]
    alpha = 1 - np.exp(-sigma * delta)
    expected = alpha * (1 - alpha + 1e-10) ** np.arange(len(w) - 1)
    np.testing.assert_allclose(w[:-1], expected, rtol=1e-4)


def test_zero_density_white_background_identity():
    rgb, density, t, dirs = _setup(sigma=0.0)
    comp, acc, weights, depth = rendering.volumetric_rendering(
        rgb, jnp.zeros_like(density), t, dirs, white_bkgd=True
    )
    # zero density everywhere except the forced last interval... the last
    # dist is 1e10 so alpha_last = 1 - exp(0 * 1e10) = 0 too for sigma=0.
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp), 1.0, atol=1e-6)  # pure white


def test_opaque_first_sample():
    rgb, density, t, dirs = _setup()
    d = np.zeros(np.asarray(density).shape, dtype=np.float32)
    d[:, 0, 0] = 1e8  # opaque at the first sample
    comp, acc, weights, depth = rendering.volumetric_rendering(
        jnp.asarray(rgb), jnp.asarray(d), t, dirs, white_bkgd=False
    )
    w = np.asarray(weights)
    np.testing.assert_allclose(w[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(t)[:, 0], rtol=1e-5)


def test_direction_norm_scales_optical_depth():
    """dists are scaled by ||rays_d||: doubling the direction length halves
    transparency the same way doubling sigma would."""
    rgb, density, t, dirs = _setup(sigma=0.25)
    _, acc1, w1, _ = rendering.volumetric_rendering(rgb, density, t, dirs, False)
    _, acc2, w2, _ = rendering.volumetric_rendering(rgb, density, t, dirs * 2.0, False)
    rgb3, density3, t3, dirs3 = _setup(sigma=0.5)
    _, acc3, w3, _ = rendering.volumetric_rendering(rgb3, density3, t3, dirs3, False)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w3), rtol=1e-5)


def test_nocs_compositing_path():
    rgb, density, t, dirs = _setup()
    nocs = jnp.ones(rgb.shape) * 0.3
    comp, acc, weights, comp_nocs = rendering.volumetric_rendering(
        rgb, density, t, dirs, white_bkgd=False, nocs=nocs
    )
    np.testing.assert_allclose(np.asarray(comp_nocs), 0.3, atol=1e-4)


def test_mse_psnr_roundtrip():
    x = jnp.full((10, 3), 0.5)
    y = jnp.full((10, 3), 0.6)
    mse = rendering.img2mse(x, y)
    np.testing.assert_allclose(float(mse), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(rendering.mse2psnr(mse)), 20.0, rtol=1e-4)

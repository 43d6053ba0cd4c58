"""Pallas kernel tests (interpret mode on CPU; compiled path covered on TPU
by bench/eval runs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ["AON_PALLAS_INTERPRET"] = "1"

from aon_tpu.core.sampling import pos_enc  # noqa: E402
from aon_tpu.models.mlp import NeRFMLP  # noqa: E402
from aon_tpu.ops.fused_mlp import (  # noqa: E402
    fused_nerf_mlp,
    fused_nerf_mlp_per_ray,
    pack_vanilla_mlp_params,
)
from aon_tpu.ops.fused_mlp_train import (  # noqa: E402
    fused_mlp_train,
    pack_vanilla_mlp_params_f32,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    B, S = 16, 8
    mlp = NeRFMLP()
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(B, S, 3)).astype(np.float32))
    vd = jnp.asarray(g.normal(size=(B, 3)).astype(np.float32))
    enc = pos_enc(x, 0, 10)
    venc = pos_enc(vd, 0, 4)
    params = mlp.init(key, enc, venc)["params"]
    rgb_ref, sigma_ref = mlp.apply({"params": params}, enc, venc)
    return mlp, params, enc, venc, rgb_ref, sigma_ref, B, S


def test_fused_eval_matches_flax(setup):
    mlp, params, enc, venc, rgb_ref, sigma_ref, B, S = setup
    packed = pack_vanilla_mlp_params(params, dtype=jnp.float32)
    N = B * S
    venc_flat = jnp.broadcast_to(venc[:, None, :], (B, S, 27)).reshape(N, 27)
    rgb, sigma = fused_nerf_mlp(packed, enc.reshape(N, 63), venc_flat, tile=64)
    np.testing.assert_allclose(
        np.asarray(rgb).reshape(B, S, 3), np.asarray(rgb_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sigma).reshape(B, S, 1), np.asarray(sigma_ref), atol=2e-4
    )


def test_fused_eval_pads_ragged_n(setup):
    mlp, params, enc, venc, rgb_ref, sigma_ref, B, S = setup
    packed = pack_vanilla_mlp_params(params, dtype=jnp.float32)
    N = B * S - 3  # ragged
    venc_flat = jnp.broadcast_to(venc[:, None, :], (B, S, 27)).reshape(-1, 27)[:N]
    rgb, sigma = fused_nerf_mlp(packed, enc.reshape(-1, 63)[:N], venc_flat, tile=64)
    assert rgb.shape == (N, 3) and sigma.shape == (N, 1)
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(rgb_ref).reshape(-1, 3)[:N], atol=2e-5
    )


def test_fused_per_ray_matches_flax(setup):
    mlp, params, enc, venc, rgb_ref, sigma_ref, B, S = setup
    packed = pack_vanilla_mlp_params(params, dtype=jnp.float32)
    rgb, sigma = fused_nerf_mlp_per_ray(packed, enc, venc, ray_tile=4)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), atol=2e-4)


def test_fused_xyz_eval_matches_flax(setup):
    """v2 kernel: raw coords in, encodings computed in-kernel."""
    from aon_tpu.ops.fused_mlp import fused_nerf_mlp_xyz, make_posenc_constants

    mlp, params, enc, venc, rgb_ref, sigma_ref, B, S = setup
    g = np.random.default_rng(2)
    samples = jnp.asarray(g.normal(size=(B, S, 3)).astype(np.float32)) * 3.0
    vd = jnp.asarray(g.normal(size=(B, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    from aon_tpu.core.sampling import pos_enc as pe

    rgb_ref2, sigma_ref2 = mlp.apply({"params": params}, pe(samples, 0, 10), pe(vd, 0, 4))
    packed = pack_vanilla_mlp_params(params, dtype=jnp.float32)
    consts = make_posenc_constants()
    rgb, sigma = fused_nerf_mlp_xyz(packed, consts, samples, vd, ray_tile=4)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref2), atol=5e-5)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref2), atol=5e-4)


def test_fused_xyz_train_grads(setup):
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.fused_mlp_train import fused_mlp_train_xyz

    mlp, params, enc, venc, rgb_ref, sigma_ref, B, S = setup
    g = np.random.default_rng(3)
    samples = jnp.asarray(g.normal(size=(B, S, 3)).astype(np.float32)) * 3.0
    vd = jnp.asarray(g.normal(size=(B, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    target = jnp.asarray(g.uniform(size=(B, S, 3)).astype(np.float32))
    consts = make_posenc_constants()
    from aon_tpu.core.sampling import pos_enc as pe

    mlp_bf16 = NeRFMLP(dtype=jnp.bfloat16)

    def loss_flax(p):
        rgb, sig = mlp_bf16.apply({"params": p}, pe(samples, 0, 10), pe(vd, 0, 4))
        return jnp.mean((rgb - target) ** 2) + jnp.mean(sig**2)

    def loss_fused(p):
        rgb, sig = fused_mlp_train_xyz(p, consts, samples, vd, 64)
        return jnp.mean((rgb - target) ** 2) + jnp.mean(sig**2)

    np.testing.assert_allclose(
        float(loss_flax(params)), float(loss_fused(params)), rtol=1e-3
    )
    g1 = jax.grad(loss_flax)(params)
    g2 = jax.grad(loss_fused)(params)
    for path in ("pts_0", "pts_5", "density", "views_0", "rgb"):
        a = np.asarray(g1[path]["kernel"])
        b = np.asarray(g2[path]["kernel"])
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / scale < 0.05, path


def test_fused_train_grads_match_flax(setup):
    mlp, params, enc, venc, rgb_ref, sigma_ref, B, S = setup
    g = np.random.default_rng(1)
    target_rgb = jnp.asarray(g.uniform(size=(B, S, 3)).astype(np.float32))
    target_sig = jnp.asarray(g.uniform(size=(B, S, 1)).astype(np.float32))
    N = B * S
    enc_flat = jnp.pad(enc.reshape(N, 63), ((0, 0), (0, 1)))
    venc_flat = jnp.pad(
        jnp.broadcast_to(venc[:, None, :], (B, S, 27)).reshape(N, 27), ((0, 0), (0, 5))
    )

    # bf16 reference: the kernel computes matmuls in bf16, so compare against
    # the bf16 flax model (fp32-vs-bf16 drift at this tiny batch is ~10%)
    mlp_bf16 = NeRFMLP(dtype=jnp.bfloat16)

    def loss_flax(p):
        rgb, sig = mlp_bf16.apply({"params": p}, enc, venc)
        return jnp.mean((rgb - target_rgb) ** 2) + jnp.mean((sig - target_sig) ** 2)

    def loss_fused(p):
        packed = pack_vanilla_mlp_params_f32(p)
        rgb, sig = fused_mlp_train(packed, enc_flat, venc_flat, 64)
        rgb = rgb.reshape(B, S, 3)
        sig = sig.reshape(B, S, 1)
        return jnp.mean((rgb - target_rgb) ** 2) + jnp.mean((sig - target_sig) ** 2)

    np.testing.assert_allclose(float(loss_flax(params)), float(loss_fused(params)), rtol=1e-3)
    g1 = jax.grad(loss_flax)(params)
    g2 = jax.grad(loss_fused)(params)
    for path in ("pts_0", "pts_3", "pts_5", "density", "bottleneck", "views_0", "rgb"):
        for leaf in ("kernel", "bias"):
            a = np.asarray(g1[path][leaf])
            b = np.asarray(g2[path][leaf])
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / scale < 0.05, (path, leaf)

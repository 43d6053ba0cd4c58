"""Compiled-kernel vs flax-fp32 parity on real TPU hardware.

Every fused Pallas kernel in aon_tpu/ops is run through Mosaic (NOT
interpret mode) and checked against the pure-XLA fp32 reference.  This
pins the hardware-only numerics: sine range reduction in the in-kernel
positional encoding, bf16 MXU matmul passes, and the lane-roll bitonic
merge of the resample kernel.

Tolerances: kernel matmuls run bf16-input/fp32-accumulate, so outputs
carry O(2^-8) relative error per layer chain; raw head outputs are
compared at atol ~0.1 (sigma logits span +-20) and post-activation
quantities tighter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core.sampling import pos_enc
from aon_tpu.models.articulated import ArticulatedNeRFMLP
from aon_tpu.models.mlp import NeRFMLP


@pytest.fixture(scope="module")
def vanilla():
    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    B, S = 64, 65
    samples = jnp.asarray(g.uniform(-3, 3, size=(B, S, 3)).astype(np.float32))
    vd = jnp.asarray(g.normal(size=(B, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    mlp = NeRFMLP()
    enc = pos_enc(samples, 0, 10)
    venc = pos_enc(vd, 0, 4)
    params = mlp.init(key, enc, venc)["params"]
    rgb_ref, sigma_ref = mlp.apply({"params": params}, enc, venc)
    return params, samples, vd, enc, venc, rgb_ref, sigma_ref


def test_in_kernel_posenc_range_reduction():
    """The hardware sine has no argument reduction; the kernel's explicit
    2*pi reduction must hold to ~1e-3 at the highest (2^9) frequency."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aon_tpu.ops.fused_mlp import (
        POS_PAD,
        _encode_in_kernel,
        make_posenc_constants,
    )

    enc_consts = make_posenc_constants()
    g = np.random.default_rng(1)
    x = jnp.asarray(np.pad(g.uniform(-6, 6, (256, 3)), ((0, 0), (0, 1))), jnp.float32)

    def kernel(x_ref, s_ref, p_ref, out_ref):
        out_ref[...] = _encode_in_kernel(x_ref[...], s_ref, p_ref, jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((256, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, POS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, POS_PAD), jnp.float32),
    )(x, enc_consts["s_pos"], enc_consts["p_pos"])

    s = np.asarray(enc_consts["s_pos"])
    p = np.asarray(enc_consts["p_pos"])
    pre = np.asarray(x) @ s + p
    want = np.where(np.arange(POS_PAD)[None, :] < 3, pre, np.sin(pre))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-3)


def test_fused_eval_kernel_matches_flax(vanilla):
    from aon_tpu.ops.fused_mlp import pack_vanilla_mlp_params

    params, samples, vd, enc, venc, rgb_ref, sigma_ref = vanilla
    from aon_tpu.ops.fused_mlp import fused_nerf_mlp

    packed = pack_vanilla_mlp_params(params)  # bf16 weights
    B, S = samples.shape[:2]
    enc_flat = enc.reshape(B * S, -1)
    venc_flat = jnp.broadcast_to(venc[:, None, :], (B, S, venc.shape[-1])).reshape(B * S, -1)
    rgb, sigma = fused_nerf_mlp(packed, enc_flat, venc_flat, tile=512)
    # post-activation comparison (what rendering consumes)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(rgb.reshape(B, S, 3))),
        np.asarray(jax.nn.sigmoid(rgb_ref)), atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.relu(sigma.reshape(B, S, 1))),
        np.asarray(jax.nn.relu(sigma_ref)), atol=0.5, rtol=5e-2,
    )


def test_fused_xyz_eval_kernel_matches_flax(vanilla):
    from aon_tpu.ops.fused_mlp import make_posenc_constants, pack_vanilla_mlp_params
    from aon_tpu.ops.fused_mlp_train import fused_nerf_mlp_xyz_eval

    params, samples, vd, enc, venc, rgb_ref, sigma_ref = vanilla
    packed = pack_vanilla_mlp_params(params)
    rgb, sigma = fused_nerf_mlp_xyz_eval(
        packed, make_posenc_constants(), samples, vd, tile=1024
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(rgb)), np.asarray(jax.nn.sigmoid(rgb_ref)), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.relu(sigma)), np.asarray(jax.nn.relu(sigma_ref)),
        atol=0.5, rtol=5e-2,
    )


def test_fused_train_kernel_grads_match_flax(vanilla):
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.fused_mlp_train import fused_mlp_train_xyz

    params, samples, vd, enc, venc, rgb_ref, sigma_ref = vanilla
    enc_consts = make_posenc_constants()
    target = jax.nn.sigmoid(rgb_ref)

    def flax_loss(p):
        rgb, sigma = NeRFMLP().apply({"params": p}, enc, venc)
        return jnp.mean((jax.nn.sigmoid(rgb) - target) ** 2) + 1e-3 * jnp.mean(
            jax.nn.relu(sigma)
        )

    def fused_loss(p):
        rgb, sigma = fused_mlp_train_xyz(p, enc_consts, samples, vd, 512)
        return jnp.mean((jax.nn.sigmoid(rgb) - target) ** 2) + 1e-3 * jnp.mean(
            jax.nn.relu(sigma)
        )

    l1, g1 = jax.value_and_grad(flax_loss)(params)
    l2, g2 = jax.value_and_grad(fused_loss)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=5e-2, atol=1e-4)
    # gradient direction agreement per layer (bf16 remat bwd vs f32 autodiff)
    for path, a in jax.tree_util.tree_flatten_with_path(g1)[0]:
        b = g2
        for k in path:
            b = b[k.key]
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom < 1e-12:
            continue
        cos = float(a @ b / denom)
        assert cos > 0.98, (path, cos)


def test_fused_art_kernels_match_flax():
    from aon_tpu.ops.fused_art import fused_art_mlp_eval, fused_art_mlp_train

    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    B, S = 32, 65
    samples = jnp.asarray(g.uniform(-2, 2, size=(B, S, 3)).astype(np.float32))
    vd = jnp.asarray(g.normal(size=(B, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    latents = {
        "density": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "color": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "articulation": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1,
    }
    mlp = ArticulatedNeRFMLP()
    venc = pos_enc(vd, 0, 4)
    params = mlp.init(key, samples, venc, latents)["params"]
    rgb_ref, sigma_ref = mlp.apply({"params": params}, samples, venc, latents)

    for name, fn, tile in (
        ("eval", fused_art_mlp_eval, 1024),
        ("train", fused_art_mlp_train, 512),
    ):
        rgb, sigma = fn(params, latents, samples, vd, tile)
        np.testing.assert_allclose(
            np.asarray(rgb), np.asarray(rgb_ref), atol=5e-2, err_msg=name
        )
        np.testing.assert_allclose(
            np.asarray(sigma), np.asarray(sigma_ref), atol=0.35, rtol=5e-2,
            err_msg=name,
        )


def test_resample_kernel_matches_xla():
    from aon_tpu.ops.resample_pallas import fused_resample

    g = np.random.default_rng(0)
    B = 1024
    t_vals = jnp.asarray(np.sort(g.uniform(2.0, 6.0, (B, 65)), axis=-1), jnp.float32)
    bins = 0.5 * (t_vals[:, 1:] + t_vals[:, :-1])
    weights = jnp.asarray(g.uniform(0, 1, (B, 63)).astype(np.float32))
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - 2.0**-32, 128), (B, 128))

    got = np.asarray(fused_resample(t_vals, bins, weights, u))

    # XLA reference (core/sampling.py formulation + union sort)
    eps = 1e-5
    ws = jnp.sum(weights, axis=-1, keepdims=True)
    pad = jnp.maximum(0.0, eps - ws)
    w2 = weights + pad / weights.shape[-1]
    pdf = w2 / (ws + pad)
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
    t = jnp.clip(jnp.where(denom <= 0, 0.0, (u - cdf0) / jnp.where(denom <= 0, 1.0, denom)), 0.0, 1.0)
    want = np.asarray(
        jnp.sort(jnp.concatenate([t_vals, bin0 + t * (bin1 - bin0)], axis=-1), axis=-1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (np.diff(got, axis=-1) >= -1e-6).all()


def test_v3_fused_level_kernel_matches_flax():
    """v3 vanilla level-train kernel (fwd + compositing + loss + bwd in one
    pass) compiled by Mosaic vs flax fp32 value_and_grad."""
    from aon_tpu.core import sampling
    from aon_tpu.core.rendering import volumetric_rendering
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.fused_mlp_train import (
        pack_vanilla_mlp_params_f32,
        unpack_vanilla_mlp_grads,
    )
    from aon_tpu.ops.train_fused_level import fused_level_train_grads

    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    B, S = 64, 65
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-4.0 * d)
    rays_d = jnp.asarray(d)
    viewdirs = jnp.asarray(d)
    target = jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32))
    t_vals = jnp.asarray(
        np.sort(g.uniform(2.0, 6.0, size=(B, S)), axis=-1).astype(np.float32)
    )
    mlp = NeRFMLP()
    enc = sampling.pos_enc(sampling.cast_rays(t_vals, rays_o, rays_d), 0, 10)
    venc = sampling.pos_enc(viewdirs, 0, 4)
    params = mlp.init(key, enc, venc)["params"]

    def flax_loss(p):
        rgb, sigma = mlp.apply({"params": p}, enc, venc)
        comp, _, w, _ = volumetric_rendering(
            jax.nn.sigmoid(rgb), jax.nn.relu(sigma), t_vals, rays_d, white_bkgd=True
        )
        return jnp.mean((comp - target) ** 2), w

    (l_ref, w_ref), g_ref = jax.value_and_grad(flax_loss, has_aux=True)(params)

    packed = pack_vanilla_mlp_params_f32(params)
    err_sum, w_got, g_packed = fused_level_train_grads(
        packed, make_posenc_constants(), t_vals, rays_o, rays_d, viewdirs,
        target, True,
    )
    np.testing.assert_allclose(float(err_sum / (B * 3.0)), float(l_ref), rtol=5e-2)
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_ref), atol=3e-2)
    g_got = unpack_vanilla_mlp_grads(g_packed)
    for path, a in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
        b = g_got
        for k in path:
            b = b[k.key]
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom < 1e-12:
            continue
        assert float(a @ b / denom) > 0.97, path


def test_v3_fused_art_level_kernel_matches_flax():
    """v3 articulated level-train kernel (deformation + trunk + compositing
    + masked loss + opacity BCE + bwd) compiled by Mosaic vs flax fp32."""
    from aon_tpu.core import sampling
    from aon_tpu.core.rendering import volumetric_rendering
    from aon_tpu.ops.fused_art import _unfold_grads, fold_latents
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.train_fused_level_art import fused_level_train_art_grads

    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    B, S = 32, 65
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-4.0 * d)
    rays_d = jnp.asarray(d)
    viewdirs = jnp.asarray(d)
    target = jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32))
    t_vals = jnp.asarray(
        np.sort(g.uniform(2.0, 6.0, size=(B, S)), axis=-1).astype(np.float32)
    )
    latents = {
        "density": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "color": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "articulation": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1,
    }
    mlp = ArticulatedNeRFMLP()
    samples = sampling.cast_rays(t_vals, rays_o, rays_d)
    venc = pos_enc(viewdirs, 0, 4)
    params = dict(mlp.init(key, samples, venc, latents)["params"])
    # zero deformation for exact comparability (see tests/test_fused_art.py)
    params["deform_out"] = {
        "kernel": jnp.zeros_like(params["deform_out"]["kernel"]),
        "bias": jnp.zeros_like(params["deform_out"]["bias"]),
    }
    mask = jnp.asarray((g.uniform(size=(B,)) > 0.4).astype(np.float32))
    denom = jnp.maximum(3.0 * jnp.sum(mask), 1.0)
    lw = mask / denom

    def bce(logits, targets):
        return jnp.mean(
            jnp.maximum(logits, 0)
            - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    def flax_loss(p, lat):
        rgb, sigma = mlp.apply({"params": p}, samples, venc, lat)
        comp, acc, w, _ = volumetric_rendering(
            jax.nn.sigmoid(rgb), jax.nn.relu(sigma), t_vals, rays_d,
            white_bkgd=False,
        )
        return jnp.sum(lw[:, None] * (comp - target) ** 2) + 0.05 * bce(acc, mask), w

    (l_ref, w_ref), (gp_ref, gl_ref) = jax.value_and_grad(
        flax_loss, argnums=(0, 1), has_aux=True
    )(params, latents)

    packed = fold_latents(params, latents)
    photo, w_got, acc_got, g_eff = fused_level_train_art_grads(
        packed, make_posenc_constants(), t_vals, rays_o, rays_d, viewdirs,
        target, lw, mask, False, rgb_padding=0.0, density_bias=0.0,
        bce_weight=0.05, sigma_act="relu",
    )
    l_got = photo + 0.05 * bce(acc_got, mask)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=5e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_ref), atol=3e-2)

    gp_got, gl_got = _unfold_grads(g_eff, params, latents)

    def flat(t):
        return np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(t)])

    for name in gp_ref:
        a, b = flat(gp_ref[name]), flat(gp_got[name])
        denom2 = np.linalg.norm(a) * np.linalg.norm(b)
        if denom2 < 1e-12:
            continue
        assert float(a @ b / denom2) > 0.95, name
    for k in gl_ref:
        a, b = flat(gl_ref[k]), flat(gl_got[k])
        if np.linalg.norm(a) < 1e-10 and np.linalg.norm(b) < 1e-10:
            continue
        assert float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-14)) > 0.95, k

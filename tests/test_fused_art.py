"""Fused articulated kernel: parity with the flax ArticulatedNeRFMLP,
including weight AND latent gradients (interpret mode)."""

import os

os.environ["AON_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core.sampling import pos_enc
from aon_tpu.models.articulated import ArticulatedNeRFMLP
from aon_tpu.ops.fused_art import fused_art_mlp_train


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    B, S = 8, 8
    g = np.random.default_rng(0)
    samples = jnp.asarray(g.normal(size=(B, S, 3)).astype(np.float32)) * 2.0
    vd = jnp.asarray(g.normal(size=(B, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    latents = {
        "density": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "color": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "articulation": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1,
    }
    # f32 reference: the flax bf16 model pos-encodes bf16-ROUNDED coords
    # (+-2 rad of phase error at 2^9), while the kernel encodes exact f32 —
    # the kernel is closer to f32 flax than bf16 flax is.
    mlp = ArticulatedNeRFMLP()
    venc = pos_enc(vd, 0, 4)
    params = mlp.init(key, samples, venc, latents)["params"]
    return mlp, params, latents, samples, vd, venc, B, S


def test_fused_art_forward_matches_flax(setup):
    """NOTE on tolerances: bf16 rounding of the deformation output is
    amplified by up to 2^9 rad inside the positional encoding, so fused
    vs flax diverge chaotically at the high frequencies even when both
    are correct.  The zeroed-deformation test below checks tightly."""
    mlp, params, latents, samples, vd, venc, B, S = setup
    rgb_ref, sigma_ref = mlp.apply({"params": params}, samples, venc, latents)
    rgb, sigma = fused_art_mlp_train(params, latents, samples, vd, 64)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=3e-2)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), atol=1.5e-1)


def test_fused_art_forward_tight_with_zero_deformation(setup):
    mlp, params, latents, samples, vd, venc, B, S = setup
    p0 = jax.tree.map(lambda x: x, params)
    p0 = dict(p0)
    p0["deform_out"] = {
        "kernel": jnp.zeros_like(params["deform_out"]["kernel"]),
        "bias": jnp.zeros_like(params["deform_out"]["bias"]),
    }
    rgb_ref, sigma_ref = mlp.apply({"params": p0}, samples, venc, latents)
    rgb, sigma = fused_art_mlp_train(p0, latents, samples, vd, 64)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), atol=2e-2)


def test_fused_art_grads_match_flax(setup):
    """Grads checked at ZERO deformation output (so xp == xyz exactly in
    both paths; with a live deformation, bf16 xp differences are amplified
    by cos(2^9 x) in the encoding VJP and the two correct gradients
    diverge chaotically — see the directional test below for that case)."""
    mlp, params, latents, samples, vd, venc, B, S = setup
    params = dict(params)
    params["deform_out"] = {
        "kernel": jnp.zeros_like(params["deform_out"]["kernel"]),
        "bias": jnp.zeros_like(params["deform_out"]["bias"]),
    }
    g = np.random.default_rng(1)
    target = jnp.asarray(g.uniform(size=(B, S, 3)).astype(np.float32))

    def loss_flax(p, lat):
        rgb, sig = mlp.apply({"params": p}, samples, venc, lat)
        return jnp.mean((rgb - target) ** 2) + 0.1 * jnp.mean(sig**2)

    def loss_fused(p, lat):
        rgb, sig = fused_art_mlp_train(p, lat, samples, vd, 64)
        return jnp.mean((rgb - target) ** 2) + 0.1 * jnp.mean(sig**2)

    l1 = float(loss_flax(params, latents))
    l2 = float(loss_fused(params, latents))
    np.testing.assert_allclose(l1, l2, rtol=2e-2)

    g1p, g1l = jax.grad(loss_flax, argnums=(0, 1))(params, latents)
    g2p, g2l = jax.grad(loss_fused, argnums=(0, 1))(params, latents)

    # deform grads flow through the encoding VJP (bf16 d_enc x cos chain);
    # allow a looser bound there
    tol = {"deform_0": 0.2, "deform_out": 0.2}

    def check(a, b, rel_tol, name):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        scale = np.abs(a).max() + 1e-8
        # tiny-gradient tensors: absolute bf16 noise floor dominates
        assert err / scale < rel_tol or err < 2e-4, (name, err / scale, err)

    for path in ("deform_0", "deform_out", "pts_0", "pts_5", "views_0", "rgb", "density"):
        check(g1p[path]["kernel"], g2p[path]["kernel"], tol.get(path, 0.1), path)

    for k in ("density", "color", "articulation"):
        check(g1l[k], g2l[k], 0.1, k)


def test_fused_art_grads_directional_full_deformation(setup):
    """With a live deformation, per-element equality is chaotic; the grad
    VECTORS must still point the same way (cosine similarity)."""
    mlp, params, latents, samples, vd, venc, B, S = setup
    g = np.random.default_rng(1)
    target = jnp.asarray(g.uniform(size=(B, S, 3)).astype(np.float32))

    def loss_flax(p, lat):
        rgb, sig = mlp.apply({"params": p}, samples, venc, lat)
        return jnp.mean((rgb - target) ** 2)

    def loss_fused(p, lat):
        rgb, sig = fused_art_mlp_train(p, lat, samples, vd, 64)
        return jnp.mean((rgb - target) ** 2)

    g1p, g1l = jax.grad(loss_flax, argnums=(0, 1))(params, latents)
    g2p, g2l = jax.grad(loss_fused, argnums=(0, 1))(params, latents)

    def cos_of(t1, t2):
        a = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(t1)])
        b = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(t2)])
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    # non-deformation subtrees must agree tightly; the deformation pathway
    # carries the chaotic (but unbiased) high-frequency component
    non_deform1 = {k: v for k, v in g1p.items() if not k.startswith("deform")}
    non_deform2 = {k: v for k, v in g2p.items() if not k.startswith("deform")}
    assert cos_of(non_deform1, non_deform2) > 0.95
    assert cos_of(g1l, g2l) > 0.8  # latents feed the (chaotic) deformation too
    deform1 = {k: v for k, v in g1p.items() if k.startswith("deform")}
    deform2 = {k: v for k, v in g2p.items() if k.startswith("deform")}
    assert cos_of(deform1, deform2) > 0.5


def test_fused_art_trains(setup):
    import optax

    mlp, params, latents, samples, vd, venc, B, S = setup
    g = np.random.default_rng(2)
    target = jnp.asarray(g.uniform(size=(B, S, 3)).astype(np.float32))

    def loss(p_and_l):
        p, lat = p_and_l
        rgb, sig = fused_art_mlp_train(p, lat, samples, vd, 64)
        return jnp.mean((jax.nn.sigmoid(rgb) - target) ** 2)

    tx = optax.adam(1e-3)
    carry = (params, latents)
    opt_state = tx.init(carry)
    losses = []
    for i in range(8):
        l, grads = jax.value_and_grad(loss)(carry)
        updates, opt_state = tx.update(grads, opt_state)
        carry = optax.apply_updates(carry, updates)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    # latents moved
    assert not np.allclose(np.asarray(carry[1]["density"]), np.asarray(latents["density"]))

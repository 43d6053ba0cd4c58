"""v3 fused ARTICULATED level-train kernel vs flax value_and_grad
(interpret mode).  Grad equality is checked with deform_out zeroed (live
bf16 deformation makes correct gradients diverge chaotically through the
encoding's high frequencies — see tests/test_fused_art.py)."""

import os

os.environ.setdefault("AON_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core import sampling
from aon_tpu.core.rendering import volumetric_rendering
from aon_tpu.models.articulated import ArticulatedNeRFMLP
from aon_tpu.ops.fused_art import fold_latents, _unfold_grads
from aon_tpu.ops.fused_mlp import make_posenc_constants
from aon_tpu.ops.train_fused_level_art import fused_level_train_art_grads

RGB_PAD = 0.001
DENSITY_BIAS = -1.0
BCE_W = 0.05


@pytest.fixture(scope="module", params=["white", "black", "bce", "bce_white"])
def setup(request):
    mode = request.param
    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    B, S = 12, 17  # ragged: B % rays_per_tile != 0, S % 8 != 0
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
    venc = sampling.pos_enc(viewdirs, 0, 4)
    params = dict(mlp.init(key, samples, venc, latents)["params"])
    params["deform_out"] = {
        "kernel": jnp.zeros_like(params["deform_out"]["kernel"]),
        "bias": jnp.zeros_like(params["deform_out"]["bias"]),
    }
    if mode.startswith("bce"):
        # the AE configuration: instance-masked MSE + opacity BCE,
        # relu sigma, un-padded sigmoid rgb (model_ae_art.py:232-233,380-408).
        # "bce_white" exercises the BCE + white-background combination (the
        # closed-form d_acc path composed with the white constant-G term).
        mask = jnp.asarray((g.uniform(size=(B,)) > 0.4).astype(np.float32))
        denom = jnp.maximum(3.0 * jnp.sum(mask), 1.0)
        loss_w = mask / denom
        white, bce_w = mode == "bce_white", BCE_W
        rgb_pad, sigma_act = 0.0, "relu"
    else:
        mask = jnp.zeros((B,))
        loss_w = jnp.full((B,), 1.0 / (B * 3.0))
        white, bce_w = mode == "white", 0.0
        rgb_pad, sigma_act = RGB_PAD, "softplus_bias"
    return (
        mlp, params, latents, t_vals, rays_o, rays_d, viewdirs, target,
        loss_w, mask, white, bce_w, rgb_pad, sigma_act, B, S,
    )


def _bce(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _flax_level_loss(
    mlp, params, latents, t_vals, rays_o, rays_d, viewdirs, target,
    loss_w, mask, white, bce_w, rgb_pad, sigma_act,
):
    samples = sampling.cast_rays(t_vals, rays_o, rays_d)
    venc = sampling.pos_enc(viewdirs, 0, 4)
    raw_rgb, raw_sigma = mlp.apply({"params": params}, samples, venc, latents)
    rgb = jax.nn.sigmoid(raw_rgb) * (1 + 2 * rgb_pad) - rgb_pad
    if sigma_act == "softplus_bias":
        sigma = jax.nn.softplus(raw_sigma + DENSITY_BIAS)
    else:
        sigma = jax.nn.relu(raw_sigma)
    comp, acc, weights, _ = volumetric_rendering(
        rgb, sigma, t_vals, rays_d, white_bkgd=white
    )
    loss = jnp.sum(loss_w[:, None] * (comp - target) ** 2)
    if bce_w:
        loss = loss + bce_w * _bce(acc, mask)
    return loss, (weights, acc)


def test_fused_art_level_matches_flax(setup):
    (
        mlp, params, latents, t_vals, rays_o, rays_d, viewdirs, target,
        loss_w, mask, white, bce_w, rgb_pad, sigma_act, B, S,
    ) = setup

    def loss_fn(p, lat):
        return _flax_level_loss(
            mlp, p, lat, t_vals, rays_o, rays_d, viewdirs, target,
            loss_w, mask, white, bce_w, rgb_pad, sigma_act,
        )

    (l_ref, (w_ref, acc_ref)), (gp_ref, gl_ref) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, latents)

    packed = fold_latents(params, latents)
    enc_consts = make_posenc_constants()
    photo, w_got, acc_got, g_eff = fused_level_train_art_grads(
        packed, enc_consts, t_vals, rays_o, rays_d, viewdirs, target,
        loss_w, mask, white, rgb_padding=rgb_pad, density_bias=DENSITY_BIAS,
        bce_weight=bce_w, sigma_act=sigma_act,
    )
    l_got = photo + (bce_w * _bce(acc_got, mask) if bce_w else 0.0)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_ref), atol=2e-2)
    np.testing.assert_allclose(np.asarray(acc_got), np.asarray(acc_ref), atol=2e-2)

    gp_got, gl_got = _unfold_grads(g_eff, params, latents)

    def flat(t):
        return np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(t)])

    for name in gp_ref:
        a, b = flat(gp_ref[name]), flat(gp_got[name])
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom < 1e-14:
            continue
        cos = float(a @ b / denom)
        scale = np.linalg.norm(b) / max(np.linalg.norm(a), 1e-14)
        # masked losses zero most rays -> smaller signal, more bf16 noise
        assert cos > (0.96 if bce_w else 0.97), (name, cos)
        assert 0.8 < scale < 1.25, (name, scale)
    for k in gl_ref:
        a, b = flat(gl_ref[k]), flat(gl_got[k])
        if np.linalg.norm(a) < 1e-12 and np.linalg.norm(b) < 1e-12:
            continue
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-14))
        assert cos > 0.97, (k, cos)


def test_fused_autodecoder_step_fn_trains():
    import optax

    from aon_tpu.models.code_library import CodeLibraryArticulated
    from aon_tpu.ops.train_fused_level_art import make_fused_autodecoder_step_fn

    g = np.random.default_rng(1)
    B = 32
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(-4.0 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
        "ray_ids": jnp.arange(B),
        "instance_id": jnp.array(0),
        "articulation_id": jnp.array(1),
    }
    key = jax.random.PRNGKey(0)
    mlp = ArticulatedNeRFMLP()
    lib = CodeLibraryArticulated(n_max_objs=2, n_obj_code_length=128)
    latents0 = {
        "density": jnp.zeros((1, 128)),
        "color": jnp.zeros((1, 128)),
        "articulation": jnp.zeros((1, 32)),
    }
    samples = jnp.zeros((2, 4, 3))
    venc = jnp.zeros((2, 27))
    params = {
        "model": {
            "coarse_mlp": mlp.init(key, samples, venc, latents0)["params"],
            "fine_mlp": mlp.init(jax.random.fold_in(key, 1), samples, venc, latents0)[
                "params"
            ],
        },
        "code_library": lib.init(jax.random.fold_in(key, 2), jnp.array(0), jnp.array(0))[
            "params"
        ],
    }
    step_fn = make_fused_autodecoder_step_fn(
        lib.apply, 2.0, 6.0, False, num_coarse=8, num_fine=8
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for i in range(4):
        loss, aux, grads = step_fn(params, batch, jax.random.fold_in(key, i))
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # code-library grads actually reached the tables
    assert any(
        float(jnp.abs(x).max()) > 0 for x in jax.tree.leaves(grads["code_library"])
    )


def test_fused_ae_step_fn_grads_reach_encoder():
    """The AE v3 step routes in-kernel latent cotangents through the
    encoder vjp: all three encoder-side subtrees must receive gradient."""
    import optax

    from aon_tpu.ops.train_fused_level_art import make_fused_ae_step_fn

    g = np.random.default_rng(3)
    B = 32
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(-4.0 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
        "ray_ids": jnp.arange(B),
        "instance_mask": jnp.asarray((g.uniform(size=(B,)) > 0.3).astype(np.float32)),
        "src_imgs": jnp.asarray(g.normal(size=(1, 3, 8, 8)).astype(np.float32)),
        "deg": jnp.asarray([0.5], dtype=jnp.float32),
    }

    def encode_fn(enc_params, src, deg):
        f = jnp.mean(src)
        latents = {
            "density": enc_params["encoder"]["d"] * f,
            "color": enc_params["encoder"]["c"] * f,
            "articulation_deg": enc_params["deg_embedding"]["e"] + 0.0 * deg.sum(),
        }
        pred_state = jnp.sum(enc_params["joint_state"]["w"]) * f + deg * 0.9
        return latents, pred_state

    key = jax.random.PRNGKey(0)
    mlp = ArticulatedNeRFMLP(use_deg_embedding=True)
    latents0 = {
        "density": jnp.zeros((1, 128)),
        "color": jnp.zeros((1, 128)),
        "articulation_deg": jnp.zeros((1, 32)),
    }
    samples = jnp.zeros((2, 4, 3))
    venc = jnp.zeros((2, 27))
    params = {
        "model": {
            "coarse_mlp": mlp.init(key, samples, venc, latents0)["params"],
            "fine_mlp": mlp.init(jax.random.fold_in(key, 1), samples, venc, latents0)[
                "params"
            ],
        },
        "encoder": {
            "d": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
            "c": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        },
        "joint_state": {"w": jnp.asarray(g.normal(size=(8,)).astype(np.float32)) * 0.1},
        "deg_embedding": {
            "e": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1
        },
    }
    step_fn = make_fused_ae_step_fn(encode_fn, 2.0, 6.0, False, num_coarse=8, num_fine=8)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for i in range(4):
        loss, aux, grads = step_fn(params, batch, jax.random.fold_in(key, i))
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for sub in ("encoder", "joint_state", "deg_embedding"):
        assert any(
            float(jnp.abs(x).max()) > 0 for x in jax.tree.leaves(grads[sub])
        ), sub
    assert float(aux["opacity_loss"]) > 0


def test_fused_ae_bg_lambda_microbatch_exact():
    """bg_loss_lambda: the background-MSE term's whole-batch denominator
    must survive k=2 microbatching with UNEQUAL per-microbatch background
    counts (same guarantee the masked-MSE denominator already has), and
    the term must actually change the objective/gradients."""
    from aon_tpu.ops.train_fused_level_art import make_fused_ae_step_fn
    from aon_tpu.train.microbatch import accumulated_grads

    g = np.random.default_rng(7)
    B = 32
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # unequal halves: first microbatch 75% object, second 12.5%
    mask = np.zeros(B, np.float32)
    mask[:12] = 1.0
    mask[16:18] = 1.0
    batch = {
        "rays_o": jnp.asarray(-4.0 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
        "ray_ids": jnp.arange(B),
        "instance_mask": jnp.asarray(mask),
        "src_imgs": jnp.asarray(g.normal(size=(1, 3, 8, 8)).astype(np.float32)),
        "deg": jnp.asarray([0.5], dtype=jnp.float32),
    }

    def encode_fn(enc_params, src, deg):
        f = jnp.mean(src)
        latents = {
            "density": enc_params["encoder"]["d"] * f,
            "color": enc_params["encoder"]["c"] * f,
            "articulation_deg": enc_params["deg_embedding"]["e"] + 0.0 * deg.sum(),
        }
        pred_state = jnp.sum(enc_params["joint_state"]["w"]) * f + deg * 0.9
        return latents, pred_state

    key = jax.random.PRNGKey(0)
    mlp = ArticulatedNeRFMLP(use_deg_embedding=True)
    latents0 = {
        "density": jnp.zeros((1, 128)),
        "color": jnp.zeros((1, 128)),
        "articulation_deg": jnp.zeros((1, 32)),
    }
    samples = jnp.zeros((2, 4, 3))
    venc = jnp.zeros((2, 27))
    params = {
        "model": {
            "coarse_mlp": mlp.init(key, samples, venc, latents0)["params"],
            "fine_mlp": mlp.init(jax.random.fold_in(key, 1), samples, venc, latents0)[
                "params"
            ],
        },
        "encoder": {
            "d": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
            "c": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        },
        "joint_state": {"w": jnp.asarray(g.normal(size=(8,)).astype(np.float32)) * 0.1},
        "deg_embedding": {
            "e": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1
        },
    }

    def run(bg_lambda, stacked):
        fn = make_fused_ae_step_fn(
            encode_fn, 2.0, 6.0, False, num_coarse=8, num_fine=8,
            bg_lambda=bg_lambda,
        )
        b = batch
        if stacked:
            b = {
                k: v.reshape((2, B // 2) + v.shape[1:])
                if k in ("rays_o", "rays_d", "viewdirs", "target", "ray_ids",
                         "instance_mask")
                else v
                for k, v in batch.items()
            }
        return accumulated_grads(fn, params, b, key)

    loss_flat, _, grads_flat = run(1.0, stacked=False)
    loss_mb, _, grads_mb = run(1.0, stacked=True)
    # exact whole-batch objective under unequal-mask microbatching
    np.testing.assert_allclose(float(loss_mb), float(loss_flat), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(grads_flat), jax.tree.leaves(grads_mb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7)

    # the term is live: bg_lambda=0 gives a different loss
    loss_off, _, _ = run(0.0, stacked=False)
    assert abs(float(loss_off) - float(loss_flat)) > 1e-4


def test_fused_ae_bg_scale_ramp():
    """bg_scale (the trainer's warmup ramp) linearly interpolates the bg
    term: loss(scale s) == loss(0) + s * (loss(1) - loss(0))."""
    from aon_tpu.ops.train_fused_level_art import make_fused_ae_step_fn

    g = np.random.default_rng(11)
    B = 16
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    base = {
        "rays_o": jnp.asarray(-4.0 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
        "ray_ids": jnp.arange(B),
        "instance_mask": jnp.asarray((g.uniform(size=(B,)) > 0.5).astype(np.float32)),
        "src_imgs": jnp.asarray(g.normal(size=(1, 3, 8, 8)).astype(np.float32)),
        "deg": jnp.asarray([0.3], dtype=jnp.float32),
    }

    def encode_fn(enc_params, src, deg):
        f = jnp.mean(src)
        return (
            {
                "density": enc_params["encoder"]["d"] * f,
                "color": enc_params["encoder"]["c"] * f,
                "articulation_deg": enc_params["deg_embedding"]["e"] + 0.0 * deg.sum(),
            },
            jnp.sum(enc_params["joint_state"]["w"]) * f + deg,
        )

    key = jax.random.PRNGKey(0)
    mlp = ArticulatedNeRFMLP(use_deg_embedding=True)
    latents0 = {
        "density": jnp.zeros((1, 128)),
        "color": jnp.zeros((1, 128)),
        "articulation_deg": jnp.zeros((1, 32)),
    }
    params = {
        "model": {
            "coarse_mlp": mlp.init(key, jnp.zeros((2, 4, 3)), jnp.zeros((2, 27)), latents0)["params"],
            "fine_mlp": mlp.init(jax.random.fold_in(key, 1), jnp.zeros((2, 4, 3)), jnp.zeros((2, 27)), latents0)["params"],
        },
        "encoder": {
            "d": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
            "c": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        },
        "joint_state": {"w": jnp.asarray(g.normal(size=(8,)).astype(np.float32)) * 0.1},
        "deg_embedding": {"e": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1},
    }
    fn = make_fused_ae_step_fn(
        encode_fn, 2.0, 6.0, False, num_coarse=8, num_fine=8, bg_lambda=1.0
    )
    losses = {}
    for s in (0.0, 0.5, 1.0):
        loss, _, _ = fn(params, dict(base, bg_scale=jnp.float32(s)), key)
        losses[s] = float(loss)
    np.testing.assert_allclose(
        losses[0.5], losses[0.0] + 0.5 * (losses[1.0] - losses[0.0]), rtol=1e-5
    )
    assert losses[1.0] > losses[0.0]

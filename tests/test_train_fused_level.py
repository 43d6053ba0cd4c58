"""v3 fused level-train kernel vs flax value_and_grad (interpret mode)."""

import os

os.environ.setdefault("AON_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core import sampling
from aon_tpu.core.rendering import volumetric_rendering
from aon_tpu.models.mlp import NeRFMLP
from aon_tpu.ops.fused_mlp import make_posenc_constants
from aon_tpu.ops.fused_mlp_train import (
    pack_vanilla_mlp_params_f32,
    unpack_vanilla_mlp_grads,
)
from aon_tpu.ops.train_fused_level import fused_level_train_grads


@pytest.fixture(scope="module", params=[True, False], ids=["white", "black"])
def setup(request):
    white = request.param
    key = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    B, S = 12, 17  # deliberately ragged: B % rays_per_tile != 0, S % 8 != 0
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
    return mlp, params, t_vals, rays_o, rays_d, viewdirs, target, white, B, S


def _flax_level_loss(mlp, params, t_vals, rays_o, rays_d, viewdirs, target, white):
    enc = sampling.pos_enc(sampling.cast_rays(t_vals, rays_o, rays_d), 0, 10)
    venc = sampling.pos_enc(viewdirs, 0, 4)
    raw_rgb, raw_sigma = mlp.apply({"params": params}, enc, venc)
    rgb = jax.nn.sigmoid(raw_rgb)
    sigma = jax.nn.relu(raw_sigma)
    comp, acc, weights, _ = volumetric_rendering(
        rgb, sigma, t_vals, rays_d, white_bkgd=white
    )
    return jnp.mean((comp - target) ** 2), weights


def test_fused_level_matches_flax_loss_weights_and_grads(setup):
    mlp, params, t_vals, rays_o, rays_d, viewdirs, target, white, B, S = setup

    def loss_fn(p):
        loss, w = _flax_level_loss(
            mlp, p, t_vals, rays_o, rays_d, viewdirs, target, white
        )
        return loss, w

    (l_ref, w_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)

    packed = pack_vanilla_mlp_params_f32(params)
    enc_consts = make_posenc_constants()
    err_sum, w_got, g_packed = fused_level_train_grads(
        packed, enc_consts, t_vals, rays_o, rays_d, viewdirs, target, white
    )
    l_got = err_sum / (B * 3.0)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_ref), atol=2e-2)

    g_got = unpack_vanilla_mlp_grads(g_packed)
    for path, a in jax.tree_util.tree_flatten_with_path(g_ref)[0]:
        b = g_got
        for kk in path:
            b = b[kk.key]
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom < 1e-14:
            continue
        cos = float(a @ b / denom)
        scale = np.linalg.norm(b) / max(np.linalg.norm(a), 1e-14)
        assert cos > 0.97, (path, cos)
        assert 0.8 < scale < 1.25, (path, scale)


def test_fused_step_fn_end_to_end_trains():
    import optax

    from aon_tpu.ops.train_fused_level import make_fused_step_fn

    g = np.random.default_rng(1)
    B = 64
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(-4.0 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
        "ray_ids": jnp.arange(B),
    }
    mlp_model = NeRFMLP()
    key = jax.random.PRNGKey(0)
    enc = jnp.zeros((2, 4, 63))
    venc = jnp.zeros((2, 27))
    params = {
        "coarse_mlp": mlp_model.init(key, enc, venc)["params"],
        "fine_mlp": mlp_model.init(jax.random.fold_in(key, 1), enc, venc)["params"],
    }
    step_fn = make_fused_step_fn(2.0, 6.0, True, num_coarse=8, num_fine=8)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for i in range(8):
        loss, aux, grads = step_fn(params, batch, jax.random.fold_in(key, i))
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

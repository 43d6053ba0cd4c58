"""Fused training loss path (interpret mode): parity with the flax loss."""

import os

os.environ["AON_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from aon_tpu.models import VanillaNeRF
from aon_tpu.ops.train_pallas import make_fused_loss_fn


def _setup(B=64, S=8):
    g = np.random.default_rng(0)
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(-4 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
    }
    model = VanillaNeRF(num_coarse_samples=S, num_fine_samples=S)
    key = jax.random.PRNGKey(0)
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
    params = model.init(key, rays, key, True, True, 2.0, 6.0)["params"]
    return model, params, batch, key, S


def test_fused_loss_matches_flax_loss():
    model, params, batch, key, S = _setup()
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}

    def flax_loss(p):
        out = model.apply({"params": p}, rays, None, False, True, 2.0, 6.0)
        l0 = jnp.mean((out[0][0] - batch["target"]) ** 2)
        l1 = jnp.mean((out[1][0] - batch["target"]) ** 2)
        return l0 + l1

    # deterministic quantiles on both paths -> identical sample positions;
    # remaining delta is bf16 matmuls only.  (The randomized fused path draws
    # sorted order-statistic quantiles — same distribution as the reference's
    # draw-then-sort, but not the same stream, so it can't be compared
    # sample-for-sample.)
    fused_loss_fn = make_fused_loss_fn(
        2.0, 6.0, True, num_coarse=S, num_fine=S, tile=64, randomized=False
    )
    l_flax = float(flax_loss(params))
    l_fused, aux = fused_loss_fn(params, batch, key)
    np.testing.assert_allclose(float(l_fused), l_flax, rtol=2e-2)
    assert float(aux["loss0"]) > 0 and float(aux["loss1"]) > 0

    # randomized path: sane loss in the same ballpark
    fused_rand = make_fused_loss_fn(2.0, 6.0, True, num_coarse=S, num_fine=S, tile=64)
    l_rand, _ = fused_rand(params, batch, key)
    assert np.isfinite(float(l_rand))
    np.testing.assert_allclose(float(l_rand), l_flax, rtol=0.5)


def test_fused_loss_grads_flow_to_both_mlps():
    model, params, batch, key, S = _setup()
    fused_loss_fn = make_fused_loss_fn(2.0, 6.0, True, num_coarse=S, num_fine=S, tile=64)
    (_, _), grads = jax.value_and_grad(fused_loss_fn, has_aux=True)(params, batch, key)
    for mlp in ("coarse_mlp", "fine_mlp"):
        total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(grads[mlp]))
        assert total > 0, mlp


def test_fused_loss_trains():
    import optax

    model, params, batch, key, S = _setup()
    fused_loss_fn = make_fused_loss_fn(2.0, 6.0, True, num_coarse=S, num_fine=S, tile=64)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for i in range(10):
        (loss, _), grads = jax.value_and_grad(fused_loss_fn, has_aux=True)(
            params, batch, jax.random.fold_in(key, i)
        )
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

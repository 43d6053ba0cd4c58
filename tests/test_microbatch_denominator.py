"""Whole-batch masked-MSE denominator under microbatching / sharding.

The reference computes the AE's masked photometric loss over the WHOLE ray
batch (model_ae_art.py:380-387): sum(mask * err^2) / (3 * sum(mask)).  Our
grad accumulation splits the batch into k equal microbatches and the mesh
shards it over chips; the ``prepare_shared`` hook must make the composed
result EXACTLY the whole-batch masked mean even when mask counts differ
across microbatches / shards (where a naive per-microbatch denominator is
the mean of per-microbatch masked means — a different objective).
"""

import os

os.environ["AON_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from aon_tpu.models.articulated import ArticulatedNeRFMLP
from aon_tpu.ops.train_fused_level_art import make_fused_ae_step_fn
from aon_tpu.parallel import get_mesh, stack_step_batches
from aon_tpu.train.microbatch import (
    accumulated_grads,
    make_train_many,
    make_train_many_sharded,
)


def _tiny_encode_fn(enc_params, src, deg):
    f = jnp.mean(src)
    latents = {
        "density": enc_params["encoder"]["d"] * f,
        "color": enc_params["encoder"]["c"] * f,
        "articulation_deg": enc_params["deg_embedding"]["e"] + 0.0 * deg.sum(),
    }
    pred_state = jnp.sum(enc_params["joint_state"]["w"]) * f + deg * 0.9
    return latents, pred_state


def _setup(B=16, S=8, seed=7):
    g = np.random.default_rng(seed)
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # mask counts deliberately UNEQUAL between the two halves: 7/8 vs 2/8
    mask = np.zeros((B,), np.float32)
    mask[: B // 2 - 1] = 1.0
    mask[B // 2 : B // 2 + 2] = 1.0
    batch = {
        "rays_o": (-4.0 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(B, 3)).astype(np.float32),
        "ray_ids": np.arange(B, dtype=np.int32),
        "instance_mask": mask,
        "src_imgs": g.normal(size=(1, 3, 8, 8)).astype(np.float32),
        "deg": np.asarray([0.5], dtype=np.float32),
    }
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
    step_fn = make_fused_ae_step_fn(
        _tiny_encode_fn, 2.0, 6.0, False, num_coarse=S, num_fine=S
    )
    return batch, params, step_fn


def test_ae_k2_matches_k1_with_unequal_mask_counts():
    """accumulated_grads k=2 must reproduce the k=1 whole-batch objective
    exactly — the per-microbatch mask counts are 7 and 2 by construction."""
    batch, params, step_fn = _setup()
    key = jax.random.PRNGKey(3)
    B = batch["rays_o"].shape[0]
    m = B // 2

    loss1, aux1, grads1 = accumulated_grads(step_fn, params, batch, key)

    ray_keys = ("rays_o", "rays_d", "viewdirs", "target", "ray_ids", "instance_mask")
    stacked = dict(batch)
    for k in ray_keys:
        v = np.asarray(batch[k])
        stacked[k] = v.reshape(2, m, *v.shape[1:])
    # per-microbatch PRNG: accumulated_grads splits the key for k>1; for the
    # comparison both paths must sample identical t-vals, which ray_ids
    # guarantee (per-ray fold_in, layout-independent by design)
    loss2, aux2, grads2 = accumulated_grads(step_fn, params, stacked, key)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(
        float(aux2["loss0"]), float(aux1["loss0"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads2)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-7
        )


def test_ae_sharded_matches_single_with_unequal_shard_masks(eight_devices):
    """2-device shard_map + k=2 microbatching must match the 1-device run:
    prepare_shared psums the mask count over the mesh data axis."""
    batch, params, step_fn = _setup()
    state0 = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=optax.sgd(1e-2)
    )
    state0 = state0.replace(step=jnp.asarray(0, jnp.int32))

    def metrics_fn(loss, aux):
        return {"train/loss": loss, "train/loss_state": aux["loss_state"]}

    key = jax.random.PRNGKey(1)
    mesh1 = get_mesh(1)
    many1 = make_train_many(step_fn, metrics_fn)
    sb1 = stack_step_batches([batch], mesh1, microbatch=8)
    s1, m1 = many1(state0, sb1, key)

    batch2, params2, step_fn2 = _setup()
    state2 = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params2, tx=optax.sgd(1e-2)
    )
    state2 = state2.replace(step=jnp.asarray(0, jnp.int32))
    mesh2 = get_mesh(2)
    many2 = make_train_many_sharded(step_fn2, metrics_fn, mesh2)
    sb2 = stack_step_batches([batch2], mesh2, microbatch=8)
    s2, m2 = many2(state2, sb2, key)

    np.testing.assert_allclose(
        float(m1["train/loss"]), float(m2["train/loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

"""Multi-chip v3 ARTICULATED train path: shard_map'd scan-of-steps with
pmean'd in-kernel gradients (interpret-mode kernels, 8-device CPU mesh).
Mirrors tests/test_sharded_fused.py for the auto-decoder step."""

import os

os.environ["AON_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from aon_tpu.models.articulated import ArticulatedNeRFMLP
from aon_tpu.models.code_library import CodeLibraryArticulated
from aon_tpu.ops.train_fused_level_art import make_fused_autodecoder_step_fn
from aon_tpu.parallel import get_mesh, stack_step_batches
from aon_tpu.train.microbatch import make_train_many, make_train_many_sharded


def _setup(B=64, S=8):
    g = np.random.default_rng(0)
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": (-4 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(B, 3)).astype(np.float32),
        "instance_id": np.int32(0),
        "articulation_id": np.int32(1),
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
        "code_library": lib.init(
            jax.random.fold_in(key, 2), jnp.array(0), jnp.array(0)
        )["params"],
    }
    # sgd, not adam: adam normalizes near-zero gradients to +-lr, turning
    # f32 psum reduction-order noise into O(lr) param flips; sgd keeps
    # param diffs proportional to grad diffs, which is what this test pins
    state = TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=optax.sgd(1e-2)
    )
    state = state.replace(step=jnp.asarray(0, jnp.int32))
    step_fn = make_fused_autodecoder_step_fn(
        lib.apply, 2.0, 6.0, False, num_coarse=S, num_fine=S
    )
    return batch, state, step_fn


def test_sharded_v3_art_train_many_matches_single(eight_devices):
    batch, state0, step_fn = _setup()

    def metrics_fn(loss, aux):
        return {"train/loss": loss, "train/reg": aux["reg"]}

    key = jax.random.PRNGKey(1)
    T = 2

    mesh1 = get_mesh(1)
    many1 = make_train_many(step_fn, metrics_fn)
    sb1 = stack_step_batches([batch] * T, mesh1, microbatch=32)
    s1, m1 = many1(state0, sb1, key)

    # 1-vs-2 layout independence: interpret-mode Pallas x 8 partitions is
    # execution-bound on 1-core hosts; the canonical 1-vs-8 fused parity is
    # test_sharded_fused.py (vanilla), which shares this sharding machinery.
    batch8, state8, step_fn8 = _setup()
    mesh8 = get_mesh(2)
    many8 = make_train_many_sharded(step_fn8, metrics_fn, mesh8)
    sb8 = stack_step_batches([batch8] * T, mesh8, microbatch=32)
    s8, m8 = many8(state8, sb8, key)

    np.testing.assert_allclose(
        float(m1["train/loss"]), float(m8["train/loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

"""Multi-chip fused train path: shard_map'd scan-of-steps with pmean'd
gradients (interpret-mode kernels on the 8-device CPU mesh)."""

import os

os.environ["AON_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from aon_tpu.models import VanillaNeRF
from aon_tpu.ops.train_pallas import make_fused_loss_fn
from aon_tpu.parallel import get_mesh, stack_step_batches
from aon_tpu.train.microbatch import make_train_many, make_train_many_sharded
from aon_tpu.train.systems import VanillaSystem
from aon_tpu.utils.config import Config


def _setup(B=64, S=8):
    g = np.random.default_rng(0)
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": (-4 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(B, 3)).astype(np.float32),
    }
    cfg = Config(N_samples=S, N_importance=S, compute_dtype="float32")
    system = VanillaSystem(cfg, 2.0, 6.0, True)  # CPU -> flax loss; init only
    state = system.init_state(jax.random.PRNGKey(0))
    return batch, state, S


def test_sharded_fused_train_many_matches_single(eight_devices):
    batch, state0, S = _setup()
    loss_fn = make_fused_loss_fn(2.0, 6.0, True, num_coarse=S, num_fine=S, tile=64)

    def metrics_fn(loss, aux):
        return {"train/loss": loss}

    key = jax.random.PRNGKey(1)
    T = 2

    # single-device reference (plain jit path)
    mesh1 = get_mesh(1)
    many1 = make_train_many(loss_fn, metrics_fn)
    sb1 = stack_step_batches([batch] * T, mesh1, microbatch=32)
    s1, m1 = many1(state0, sb1, key)

    # 8-device sharded path
    batch8, state8, _ = _setup()
    mesh8 = get_mesh(8)
    many8 = make_train_many_sharded(loss_fn, metrics_fn, mesh8)
    sb8 = stack_step_batches([batch8] * T, mesh8, microbatch=32)
    s8, m8 = many8(state8, sb8, key)

    np.testing.assert_allclose(float(m1["train/loss"]), float(m8["train/loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

"""Joint-state regressor: articulation latent (32) -> scalar joint angle.

Contract from reference ``models/vanilla_nerf/model_autodecoder.py:42-57``:
32 -> 64 -> 32 -> 1 with ReLU between layers, linear output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class JointStateDecoder(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(64, name="fc1")(x))
        x = nn.relu(nn.Dense(32, name="fc2")(x))
        return nn.Dense(1, name="fc_joint_state")(x)

"""Vanilla NeRF MLP (flax.linen), TPU-first.

Architecture contract from reference ``models/vanilla_nerf/model.py:39-120``:
trunk of ``netdepth`` x ``netwidth`` dense+ReLU with the *encoded input*
re-concatenated after every layer whose index satisfies
``idx % skip_layer == 0 and idx > 0``; a linear bottleneck; a 1-channel
density head off the trunk; and a view-conditioned branch
(``netdepth_condition`` x ``netwidth_condition``) consuming
``[bottleneck, viewdir_enc]`` feeding the rgb head.

TPU notes: the (B, S, C) sample grid is flattened to one big (B*S, C)
matmul batch so every layer is a single MXU-shaped GEMM; compute dtype is
configurable (bfloat16 on TPU) with fp32 params and fp32 head outputs.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

_DENSE_KW = dict(
    kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros,
)


class NeRFMLP(nn.Module):
    netdepth: int = 8
    netwidth: int = 256
    netdepth_condition: int = 1
    netwidth_condition: int = 128
    skip_layer: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, samples_enc: jnp.ndarray, viewdirs_enc: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """samples_enc: (B, S, Cpos); viewdirs_enc: (B, Cview).

        Returns (raw_rgb (B, S, 3), raw_density (B, S, 1)) in float32.
        """
        B, S, feat = samples_enc.shape
        x = samples_enc.reshape(B * S, feat).astype(self.dtype)
        inputs = x

        for idx in range(self.netdepth):
            x = nn.Dense(self.netwidth, dtype=self.dtype, **_DENSE_KW, name=f"pts_{idx}")(x)
            x = nn.relu(x)
            if idx % self.skip_layer == 0 and idx > 0:
                x = jnp.concatenate([x, inputs], axis=-1)

        raw_density = nn.Dense(
            self.num_density_channels, dtype=jnp.float32, **_DENSE_KW, name="density"
        )(x)
        raw_density = raw_density.reshape(B, S, self.num_density_channels)

        bottleneck = nn.Dense(
            self.netwidth, dtype=self.dtype, **_DENSE_KW, name="bottleneck"
        )(x)
        cond = jnp.broadcast_to(
            viewdirs_enc[:, None, :].astype(self.dtype), (B, S, viewdirs_enc.shape[-1])
        ).reshape(B * S, -1)
        x = jnp.concatenate([bottleneck, cond], axis=-1)
        for idx in range(self.netdepth_condition):
            x = nn.Dense(
                self.netwidth_condition, dtype=self.dtype, **_DENSE_KW, name=f"views_{idx}"
            )(x)
            x = nn.relu(x)

        raw_rgb = nn.Dense(
            self.num_rgb_channels, dtype=jnp.float32, **_DENSE_KW, name="rgb"
        )(x)
        raw_rgb = raw_rgb.reshape(B, S, self.num_rgb_channels)
        return raw_rgb, raw_density

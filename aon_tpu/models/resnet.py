"""Flax ResNet-34 multi-head image encoder for the auto-encoder variant.

Contract from reference ``models/resnet_encoder.py:292-512``
(``ImgEncoder_MultiHead_Art`` defaults): torchvision resnet34 backbone with
every BatchNorm2d swapped for InstanceNorm2d (affine-free, resnet_encoder.py
:23-48); shared trunk conv1..layer3 (shared_layers=3); three heads, each its
OWN copy of layer4 + global avgpool + linear: color->128, density->128,
articulation->32.  Multi-view aggregation by mean (resnet_encoder.py:428-447)
via ``encode_views``.

Pretrained ImageNet weights are not downloadable in this offline image; by
default the encoder trains from random init (the reference's
``pretrained=True`` is an initialization choice — the encoder is trained
end-to-end either way).  ``ImgEncoderMultiHeadArt.params_from_npz`` loads
converted torchvision weights produced by
``scripts/convert_resnet_weights.py`` (run it on a machine with
torchvision); the converter + loader + flax forward are golden-tested
against a torch forward pass in tests/test_weight_convert.py, and the
training system picks the file up automatically via ``AON_RESNET_WEIGHTS``
(or ``weights/resnet34.npz``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# ResNet-34 stage plan: (num_blocks, channels)
RESNET34_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) on NHWC (torch default config)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = instance_norm(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(y)
        y = instance_norm(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(
                self.channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample",
            )(x)
            residual = instance_norm(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    num_blocks: int
    channels: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = BasicBlock(
                self.channels, stride=self.stride if i == 0 else 1,
                dtype=self.dtype, name=f"block{i}",
            )(x)
        return x


class ImgEncoderMultiHeadArt(nn.Module):
    """ResNet-34 trunk (conv1..layer3 shared) + per-head layer4/avgpool/linear."""

    color_size: int = 128
    density_size: int = 128
    art_size: int = 32
    shared_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: (B, 3, H, W) torch layout (matching the dataset's src_imgs) or
        (B, H, W, 3).  Returns {color (B,128), density (B,128),
        articulation (B,32)}."""
        if x.shape[1] == 3 and (x.ndim == 4 and x.shape[-1] != 3):
            x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = x.astype(self.dtype)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = instance_norm(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        strides = (1, 2, 2, 2)
        for stage_idx in range(self.shared_layers):
            n_blocks, ch = RESNET34_STAGES[stage_idx]
            x = ResNetStage(
                n_blocks, ch, strides[stage_idx], dtype=self.dtype,
                name=f"layer{stage_idx + 1}",
            )(x)

        out = {}
        n_blocks4, ch4 = RESNET34_STAGES[3]
        for head, size in (
            ("color", self.color_size),
            ("density", self.density_size),
            ("articulation", self.art_size),
        ):
            h = ResNetStage(
                n_blocks4, ch4, strides[3], dtype=self.dtype, name=f"{head}_layer4"
            )(x)
            h = jnp.mean(h, axis=(1, 2))  # global avgpool
            out[head] = nn.Dense(size, dtype=jnp.float32, name=f"{head}_fc")(h)
        return out

    @staticmethod
    def aggregate_views(outs: Sequence[Dict[str, jnp.ndarray]], how: str = "mean"):
        """Multi-view latent aggregation (resnet_encoder.py:428-447)."""
        keys = outs[0].keys()
        if how == "mean":
            return {k: jnp.mean(jnp.stack([o[k] for o in outs], 0), 0) for k in keys}
        if how == "max":
            return {k: jnp.max(jnp.stack([o[k] for o in outs], 0), 0) for k in keys}
        raise NotImplementedError(f"aggregation {how!r} not supported")

    @staticmethod
    def params_from_npz(params: Dict, npz_path: str) -> Dict:
        """Overlay converted ResNet-34 backbone weights onto a params tree.

        ``npz_path`` is the output of ``scripts/convert_resnet_weights.py``:
        conv kernels keyed by flax path (``conv1/kernel``,
        ``layer1/block0/conv1/kernel``, ..., ``layer4/...``).  The shared
        trunk takes conv1..layer3; each head's private layer4 copy is
        initialized from the SAME torchvision layer4 (the reference
        deep-copies layer4 per head, resnet_encoder.py:365-391).  Head fc
        layers keep their existing (random) values — they have no
        torchvision counterpart.  Raises KeyError/ValueError on missing
        paths or shape mismatches.
        """
        import numpy as np
        from flax.traverse_util import flatten_dict, unflatten_dict

        data = np.load(npz_path)
        flat = {"/".join(k): v for k, v in flatten_dict(params).items()}
        for key in data.files:
            val = data[key]
            targets = (
                [f"{head}_layer4/{key[len('layer4/'):]}"
                 for head in ("color", "density", "articulation")]
                if key.startswith("layer4/")
                else [key]
            )
            for t in targets:
                if t not in flat:
                    raise KeyError(f"converted weight {key!r} has no param at {t!r}")
                if tuple(flat[t].shape) != tuple(val.shape):
                    raise ValueError(
                        f"shape mismatch at {t!r}: param {tuple(flat[t].shape)} "
                        f"vs converted {tuple(val.shape)}"
                    )
                flat[t] = jnp.asarray(val, dtype=flat[t].dtype)
        return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})

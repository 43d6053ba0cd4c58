"""Articulated NeRF: latent-conditioned MLP with a deformation field.

Architecture contract from reference
``models/vanilla_nerf/model_autodecoder.py:60-337`` (shared by the
auto-decoder and auto-encoder systems; ``model_ae_art.py`` differs only in
activations and where latents come from):

* deformation MLP: ``netdepth_deformation`` x ``netwidth_deformation`` on
  ``[xyz, shape_latent, articulation_latent]`` producing a 3-vector offset
  added to xyz (enc_after=True path: positional encoding applied AFTER the
  deformation, model_autodecoder.py:200-213);
* trunk input: ``[pos_enc(xyz + dxyz), shape_latent]`` with skip re-concat;
* view branch input: ``[bottleneck, viewdir_enc, appearance_latent]``,
  ``netdepth_condition=4`` x 128;
* auto-decoder head activations (model_autodecoder.py:265-267, 321-323):
  ``sigma = softplus(raw + density_bias)`` (bias -1.0) and
  ``rgb = sigmoid(raw) * (1 + 2*rgb_padding) - rgb_padding`` (padding 1e-3);
* auto-encoder variant (model_ae_art.py:232-233, 289-292) uses plain ReLU
  sigma and un-padded sigmoid rgb — select via ``sigma_activation`` /
  ``rgb_padding`` config here.

NOTE (reference bug, not reproduced): ``model_ae_art.py:294`` unpacks three
values from the four-tuple ``volumetric_rendering`` returns, which raises at
runtime in the reference.  We keep the correct 4-tuple plumbing.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aon_tpu.core import sampling
from aon_tpu.core.rendering import volumetric_rendering
from aon_tpu.models.mlp import _DENSE_KW

Dtype = Any


class ArticulatedNeRFMLP(nn.Module):
    min_deg_point: int = 0
    max_deg_point: int = 10
    netdepth: int = 8
    netwidth: int = 256
    netdepth_deformation: int = 4
    netwidth_deformation: int = 128
    netdepth_condition: int = 4
    netwidth_condition: int = 128
    skip_layer: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    deformation_mlp: bool = True
    enc_after: bool = True
    use_deg_embedding: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pos: jnp.ndarray,
        condition: jnp.ndarray,
        latents: Dict[str, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pos: (B, S, 3) RAW sample coords (enc_after) or encoded coords;
        condition: (B, Cview) encoded viewdirs; latents: dict with
        ``density`` (shape code), ``color`` (appearance code),
        ``articulation`` (or ``articulation_deg`` when use_deg_embedding),
        each (1, C) or (C,) broadcast to all samples (the reference trains
        one instance/articulation per step, model_autodecoder.py:186-194).
        """
        B, S, feat = pos.shape
        BN = B * S
        x_pos = pos.reshape(BN, feat).astype(self.dtype)

        def bcast(code):
            code = code.reshape(-1)[None, :].astype(self.dtype)
            return jnp.broadcast_to(code, (BN, code.shape[-1]))

        shape_code = bcast(latents["density"])
        appearance_code = bcast(latents["color"])
        art_key = "articulation_deg" if self.use_deg_embedding else "articulation"
        articulation_code = bcast(latents[art_key])

        x = jnp.concatenate([x_pos, shape_code, articulation_code], axis=-1)

        if self.deformation_mlp:
            for idx in range(self.netdepth_deformation):
                x = nn.Dense(
                    self.netwidth_deformation, dtype=self.dtype, **_DENSE_KW,
                    name=f"deform_{idx}",
                )(x)
                x = nn.relu(x)
            out_dim = 3 if self.enc_after else feat
            x = nn.Dense(out_dim, dtype=self.dtype, **_DENSE_KW, name="deform_out")(x) + x_pos
            if self.enc_after:
                x = sampling.pos_enc(x, self.min_deg_point, self.max_deg_point)
            x = jnp.concatenate([x, shape_code], axis=-1)

        inputs = x
        for idx in range(self.netdepth):
            x = nn.Dense(self.netwidth, dtype=self.dtype, **_DENSE_KW, name=f"pts_{idx}")(x)
            x = nn.relu(x)
            if idx % self.skip_layer == 0 and idx > 0:
                x = jnp.concatenate([x, inputs], axis=-1)

        raw_density = nn.Dense(
            self.num_density_channels, dtype=jnp.float32, **_DENSE_KW, name="density"
        )(x).reshape(B, S, self.num_density_channels)

        bottleneck = nn.Dense(self.netwidth, dtype=self.dtype, **_DENSE_KW, name="bottleneck")(x)
        cond = jnp.broadcast_to(
            condition[:, None, :].astype(self.dtype), (B, S, condition.shape[-1])
        ).reshape(BN, -1)
        x = jnp.concatenate([bottleneck, cond, appearance_code], axis=-1)
        for idx in range(self.netdepth_condition):
            x = nn.Dense(
                self.netwidth_condition, dtype=self.dtype, **_DENSE_KW, name=f"views_{idx}"
            )(x)
            x = nn.relu(x)

        raw_rgb = nn.Dense(
            self.num_rgb_channels, dtype=jnp.float32, **_DENSE_KW, name="rgb"
        )(x).reshape(B, S, self.num_rgb_channels)
        return raw_rgb, raw_density


class ArticulatedNeRF(nn.Module):
    """Two-level hierarchical articulated NeRF (reference NeRF_AE_Art).

    ``sigma_activation``: "softplus_bias" (auto-decoder contract,
    softplus(raw + density_bias)) or "relu" (auto-encoder contract).
    ``rgb_padding``: 0 disables the sigmoid padding.
    """

    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    noise_std: float = 0.0
    lindisp: bool = False
    rgb_padding: float = 0.001
    density_bias: float = -1.0
    sigma_activation: str = "softplus_bias"
    enc_after: bool = True
    use_deg_embedding: bool = False
    remat: bool = True  # rematerialize MLP activations in backward (HBM saver)
    dtype: Dtype = jnp.float32

    def setup(self):
        mlp_kw = dict(
            min_deg_point=self.min_deg_point,
            max_deg_point=self.max_deg_point,
            enc_after=self.enc_after,
            use_deg_embedding=self.use_deg_embedding,
            dtype=self.dtype,
        )
        mlp_cls = nn.remat(ArticulatedNeRFMLP) if self.remat else ArticulatedNeRFMLP
        self.coarse_mlp = mlp_cls(**mlp_kw)
        self.fine_mlp = mlp_cls(**mlp_kw)

    def __call__(
        self,
        rays: Dict[str, jnp.ndarray],
        latents: Dict[str, jnp.ndarray],
        key: Optional[jax.Array],
        randomized: bool,
        white_bkgd: bool,
        near: float,
        far: float,
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        if randomized:
            keys = jax.random.split(key, 2 * self.num_levels)
        else:
            keys = [None] * (2 * self.num_levels)

        ret = []
        t_vals = None
        weights = None
        for i_level in range(self.num_levels):
            if i_level == 0:
                t_vals, samples = sampling.sample_along_rays(
                    keys[0],
                    rays["rays_o"],
                    rays["rays_d"],
                    self.num_coarse_samples,
                    near,
                    far,
                    randomized=randomized,
                    lindisp=self.lindisp,
                )
                mlp = self.coarse_mlp
            else:
                t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
                t_vals, samples = sampling.sample_pdf(
                    keys[2 * i_level],
                    t_mids,
                    weights[..., 1:-1],
                    rays["rays_o"],
                    rays["rays_d"],
                    t_vals,
                    self.num_fine_samples,
                    randomized=randomized,
                )
                mlp = self.fine_mlp

            if self.enc_after:
                samples_enc = samples  # encoding happens after deformation
            else:
                samples_enc = sampling.pos_enc(samples, self.min_deg_point, self.max_deg_point)
            viewdirs_enc = sampling.pos_enc(rays["viewdirs"], 0, self.deg_view)
            raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc, latents)

            if self.noise_std > 0 and randomized:
                raw_sigma = raw_sigma + (
                    jax.random.uniform(keys[2 * i_level + 1], raw_sigma.shape, raw_sigma.dtype)
                    * self.noise_std
                )

            rgb = nn.sigmoid(raw_rgb)
            if self.rgb_padding > 0:
                rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding
            if self.sigma_activation == "softplus_bias":
                sigma = nn.softplus(raw_sigma + self.density_bias)
            elif self.sigma_activation == "relu":
                sigma = nn.relu(raw_sigma)
            else:
                raise ValueError(f"unknown sigma_activation: {self.sigma_activation}")

            comp_rgb, acc, weights, depth = volumetric_rendering(
                rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd
            )
            ret.append((comp_rgb, acc, depth))
        return ret

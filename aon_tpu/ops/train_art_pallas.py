"""Fused training loss for the ARTICULATED NeRF (auto-decoder variant).

Mirrors ops/train_pallas.py for the latent-conditioned model: sampling and
compositing in XLA, both MLP passes through ``fused_art_mlp_train``
(ops/fused_art.py) with gradients flowing to model weights AND latent
tables.  Head activations follow the auto-decoder contract
(model_autodecoder.py:265-267, 321-323): softplus(raw + density_bias),
padded sigmoid rgb.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from aon_tpu.core.rays import effective_intervals
from aon_tpu.core import sampling
from aon_tpu.core.rendering import img2mse, volumetric_rendering
from aon_tpu.ops.resample_pallas import sample_pdf_fused
from aon_tpu.ops.fused_art import fused_art_mlp_train

TILE = 512


def _activations(raw_rgb, raw_sigma, sigma_activation, rgb_padding, density_bias):
    rgb = jax.nn.sigmoid(raw_rgb)
    if rgb_padding > 0:
        rgb = rgb * (1 + 2 * rgb_padding) - rgb_padding
    if sigma_activation == "softplus_bias":
        sigma = jax.nn.softplus(raw_sigma + density_bias)
    else:
        sigma = jax.nn.relu(raw_sigma)
    return rgb, sigma


def fused_two_level_train(
    model_params: Dict,
    latents: Dict,
    batch: Dict,
    key: jax.Array,
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int,
    num_fine: int,
    sigma_activation: str,
    rgb_padding: float,
    density_bias: float,
    lindisp: bool = False,
    tile: int = TILE,
):
    """Shared randomized two-level fused render for articulated training.

    Returns ((comp0, acc0), (comp1, acc1)) — used by both the auto-decoder
    and auto-encoder losses (they differ only in where latents come from
    and which losses they compute)."""
    rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
    ray_ids = batch.get("ray_ids")
    k0, k2 = jax.random.split(key)

    def level(mlp_params, t_vals, samples):
        raw_rgb, raw_sigma = fused_art_mlp_train(
            mlp_params, latents, samples, rays["viewdirs"], tile
        )
        rgb, sigma = _activations(
            raw_rgb, raw_sigma, sigma_activation, rgb_padding, density_bias
        )
        return volumetric_rendering(rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)

    t_vals, samples = sampling.sample_along_rays(
        k0, rays["rays_o"], rays["rays_d"], num_coarse,
        *effective_intervals(batch, near, far),
        randomized=True, lindisp=lindisp, ray_ids=ray_ids,
    )
    comp0, acc0, weights, _ = level(model_params["coarse_mlp"], t_vals, samples)

    t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
    t_vals, samples = sample_pdf_fused(
        k2, t_mids, weights[..., 1:-1], rays["rays_o"], rays["rays_d"],
        t_vals, num_fine, randomized=True, ray_ids=ray_ids,
    )
    comp1, acc1, _, _ = level(model_params["fine_mlp"], t_vals, samples)
    return (comp0, acc0), (comp1, acc1)


def make_fused_autodecoder_loss_fn(
    lib_apply: Callable,
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    sigma_activation: str = "softplus_bias",
    rgb_padding: float = 0.001,
    density_bias: float = -1.0,
    lindisp: bool = False,
    tile: int = TILE,
):
    """loss_fn(params, batch, key) for AutoDecoderSystem with
    params = {"model": flax ArticulatedNeRFMLP x2 tree, "code_library": ...}.
    """

    def level(mlp_params, latents, rays, t_vals, samples):
        raw_rgb, raw_sigma = fused_art_mlp_train(
            mlp_params, latents, samples, rays["viewdirs"], tile
        )
        rgb, sigma = _activations(
            raw_rgb, raw_sigma, sigma_activation, rgb_padding, density_bias
        )
        return volumetric_rendering(rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)

    def loss_fn(params: Dict, batch: Dict, key: jax.Array):
        latents = lib_apply(
            {"params": params["code_library"]},
            batch["instance_id"],
            batch["articulation_id"],
        )
        rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
        ray_ids = batch.get("ray_ids")
        k0, k2 = jax.random.split(key)

        t_vals, samples = sampling.sample_along_rays(
            k0, rays["rays_o"], rays["rays_d"], num_coarse,
            *effective_intervals(batch, near, far),
            randomized=True, lindisp=lindisp, ray_ids=ray_ids,
        )
        comp0, _, weights, _ = level(params["model"]["coarse_mlp"], latents, rays, t_vals, samples)

        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_vals, samples = sample_pdf_fused(
            k2, t_mids, weights[..., 1:-1], rays["rays_o"], rays["rays_d"],
            t_vals, num_fine, randomized=True, ray_ids=ray_ids,
        )
        comp1, _, _, _ = level(params["model"]["fine_mlp"], latents, rays, t_vals, samples)

        w = batch.get("loss_w")  # mean-1 importance weights or None
        if w is None:
            loss0 = img2mse(comp0, batch["target"])
            loss1 = img2mse(comp1, batch["target"])
        else:
            w = w.reshape(-1, 1)
            loss0 = jnp.mean(w * (comp0 - batch["target"]) ** 2)
            loss1 = jnp.mean(w * (comp1 - batch["target"]) ** 2)
        # latent-norm regularization (model_autodecoder.py:456-466)
        reg = 1e-4 * (
            jnp.mean(jnp.linalg.norm(latents["density"], axis=0))
            + jnp.mean(jnp.linalg.norm(latents["color"], axis=0))
            + jnp.mean(jnp.linalg.norm(latents["articulation"], axis=0))
        )
        return loss0 + loss1 + reg, {"loss0": loss0, "loss1": loss1, "reg": reg}

    return loss_fn


def make_fused_art_render_fn(
    lib_apply: Callable,
    mesh,
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    sigma_activation: str = "softplus_bias",
    rgb_padding: float = 0.001,
    density_bias: float = -1.0,
    lindisp: bool = False,
    tile: int = 1024,
):
    """Deterministic fused two-level renderer for the auto-decoder:
    fn(params, rays, instance_id, articulation_id, is_test) ->
    {comp_rgb, acc, depth}; rays sharded P("data") over the mesh."""
    import functools

    from jax.sharding import PartitionSpec as P

    from aon_tpu.ops.fused_art import fused_art_mlp_eval

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def level(mlp_params, latents, rays, t_vals, samples):
        raw_rgb, raw_sigma = fused_art_mlp_eval(
            mlp_params, latents, samples, rays["viewdirs"], tile=tile
        )
        rgb, sigma = _activations(
            raw_rgb, raw_sigma, sigma_activation, rgb_padding, density_bias
        )
        return volumetric_rendering(rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)

    def local_render(params, rays, latents):
        t_vals, samples = sampling.sample_along_rays(
            None, rays["rays_o"], rays["rays_d"], num_coarse,
            rays.get("t_near", near), rays.get("t_far", far),
            randomized=False, lindisp=lindisp,
        )
        _, _, weights, _ = level(params["model"]["coarse_mlp"], latents, rays, t_vals, samples)
        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_vals, samples = sample_pdf_fused(
            None, t_mids, weights[..., 1:-1], rays["rays_o"], rays["rays_d"],
            t_vals, num_fine, randomized=False,
        )
        comp_rgb, acc, _, depth = level(
            params["model"]["fine_mlp"], latents, rays, t_vals, samples
        )
        return {"comp_rgb": comp_rgb, "acc": acc, "depth": depth}

    if mesh is not None and mesh.devices.size > 1:
        out_spec = {"comp_rgb": P("data"), "acc": P("data"), "depth": P("data")}
        _cache = {}

        def inner(params, rays, latents):
            # rays may or may not carry t_near/t_far (AABB path): build the
            # shard_map per key-set (specs are static per closure)
            ks = tuple(sorted(rays))
            if ks not in _cache:
                rays_spec = {k: P("data") for k in ks}
                _cache[ks] = shard_map(
                    local_render, mesh=mesh, in_specs=(P(), rays_spec, P()),
                    out_specs=out_spec, check_vma=False,
                )
            return _cache[ks](params, rays, latents)
    else:
        inner = local_render

    @functools.partial(jax.jit, static_argnames=("is_test",))
    def render_fn(params, rays, instance_id, articulation_id, is_test=False):
        latents = lib_apply(
            {"params": params["code_library"]}, instance_id, articulation_id,
            is_test=is_test,
        )
        return inner(params, rays, latents)

    return render_fn

"""Fused training loss for the vanilla NeRF (Pallas fwd + custom-VJP bwd).

Replaces the flax forward inside ``VanillaSystem``'s loss with the
``fused_mlp_train`` kernels (ops/fused_mlp_train.py): sampling, positional
encoding and compositing stay in XLA (they are cheap and fuse), both MLP
passes run through the fused kernel with the on-chip backward.  Numerics
match the flax path within bf16-matmul tolerance (see
tests/test_pallas_kernels.py).

The packing of flax params into the kernel layout happens inside the loss,
so autodiff transposes the pack (slice/pad/reshape) automatically and
gradients land back on the ordinary flax param tree — optimizer and
checkpoint formats are unchanged.
"""

from __future__ import annotations

from typing import Dict

import jax

from aon_tpu.core.rays import effective_intervals
from aon_tpu.core import sampling
from aon_tpu.core.rendering import img2mse, volumetric_rendering
from aon_tpu.ops.fused_mlp import make_posenc_constants
from aon_tpu.ops.fused_mlp_train import fused_mlp_train_xyz
from aon_tpu.ops.resample_pallas import sample_pdf_fused

TILE = 512  # per-sample rows per kernel tile (flat v2 kernels)


def _level_train(mlp_params, enc_consts, rays, t_vals, samples, key, white_bkgd, noise_std, tile):
    raw_rgb, raw_sigma = fused_mlp_train_xyz(
        mlp_params, enc_consts, samples, rays["viewdirs"], tile
    )
    if noise_std > 0 and key is not None:
        raw_sigma = raw_sigma + jax.random.uniform(key, raw_sigma.shape) * noise_std
    rgb = jax.nn.sigmoid(raw_rgb)
    sigma = jax.nn.relu(raw_sigma)
    return volumetric_rendering(rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd)


def make_fused_loss_fn(
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    min_deg: int = 0,
    max_deg: int = 10,
    deg_view: int = 4,
    noise_std: float = 0.0,
    lindisp: bool = False,
    tile: int = TILE,
    randomized: bool = True,
):
    """Returns ``loss_fn(params, batch, key) -> (loss, aux)`` matching the
    VanillaSystem contract (params = flax VanillaNeRF params tree).

    ``randomized=False`` freezes both sampling levels to their deterministic
    quantiles (linspace u) — used by tests to compare against the flax path
    sample-for-sample (the randomized fine-level quantiles are sorted order
    statistics, stream-incompatible with core.sampling's iid draws)."""
    enc_consts = make_posenc_constants(max_deg=max_deg, view_deg=deg_view)

    def loss_fn(params: Dict, batch: Dict, key: jax.Array):
        rays = {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}
        ray_ids = batch.get("ray_ids")  # layout-independent per-ray RNG
        k0, k1, k2, k3 = jax.random.split(key, 4)
        packed_c = params["coarse_mlp"]
        packed_f = params["fine_mlp"]

        t_vals, samples = sampling.sample_along_rays(
            k0, rays["rays_o"], rays["rays_d"], num_coarse,
            *effective_intervals(batch, near, far),
            randomized=randomized, lindisp=lindisp, ray_ids=ray_ids,
        )
        comp0, acc0, weights, _ = _level_train(
            packed_c, enc_consts, rays, t_vals, samples,
            k1 if noise_std > 0 else None, white_bkgd, noise_std, tile,
        )

        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_vals, samples = sample_pdf_fused(
            k2, t_mids, weights[..., 1:-1], rays["rays_o"], rays["rays_d"],
            t_vals, num_fine, randomized=randomized, ray_ids=ray_ids,
        )
        comp1, acc1, _, _ = _level_train(
            packed_f, enc_consts, rays, t_vals, samples,
            k3 if noise_std > 0 else None, white_bkgd, noise_std, tile,
        )

        loss0 = img2mse(comp0, batch["target"])
        loss1 = img2mse(comp1, batch["target"])
        return loss0 + loss1, {"loss0": loss0, "loss1": loss1}

    return loss_fn

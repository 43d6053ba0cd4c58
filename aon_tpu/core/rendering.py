"""Alpha-composited volume rendering (pure jnp).

Contract matches reference ``models/vanilla_nerf/helper.py:157-195``:
  * last inter-sample distance is 1e10 (open far interval),
  * distances are scaled by ||rays_d|| (a no-op for the SAPIEN datasets,
    whose direction vectors are unit-norm due to the reference's in-place
    normalization aliasing in ``datasets/ray_utils.py:145-147``),
  * alpha = 1 - exp(-sigma * delta),
  * transmittance via exclusive cumprod of (1 - alpha + 1e-10),
  * depth = sum(w * t) with nan -> +inf then clamped to [min, max] of itself,
  * white background composites ``+(1 - acc)``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def volumetric_rendering(
    rgb: jnp.ndarray,
    density: jnp.ndarray,
    t_vals: jnp.ndarray,
    dirs: jnp.ndarray,
    white_bkgd: bool,
    nocs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample rgb/sigma into per-ray outputs.

    Args:
      rgb: (B, S, 3) per-sample color in [0, 1].
      density: (B, S, 1) per-sample non-negative density.
      t_vals: (B, S) sample positions along each ray.
      dirs: (B, 3) ray direction vectors (norm scales the step size).
      white_bkgd: composite onto a white background.
      nocs: optional (B, S, C) extra field to composite instead of depth.

    Returns:
      (comp_rgb (B, 3), acc (B,), weights (B, S), depth (B,))
      or (comp_rgb, acc, weights, comp_nocs) when ``nocs`` is given —
      the same (4-tuple) signature as reference helper.py:157-195.
    """
    eps = 1e-10
    dists = jnp.concatenate(
        [
            t_vals[..., 1:] - t_vals[..., :-1],
            jnp.full_like(t_vals[..., :1], 1e10),
        ],
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    alpha = 1.0 - jnp.exp(-density[..., 0] * dists)
    # max() blocks XLA from constant-folding (1.0 + eps) -> 1.0 and
    # reassociating `1 - alpha + eps` into `1 - alpha`, which would make the
    # cumprod factor exactly 0 at opaque samples (the reference's torch
    # evaluation keeps the strict left-to-right >= eps floor, helper.py:170)
    accum_prod = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(jnp.maximum(1.0 - alpha[..., :-1], 0.0) + eps, axis=-1),
        ],
        axis=-1,
    )
    weights = alpha * accum_prod

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])

    if nocs is not None:
        comp_nocs = jnp.sum(weights[..., None] * nocs, axis=-2)
        return comp_rgb, acc, weights, comp_nocs

    depth = jnp.sum(weights * t_vals, axis=-1)
    depth = jnp.nan_to_num(depth, nan=jnp.inf)
    depth = jnp.clip(depth, jnp.min(depth), jnp.max(depth))
    return comp_rgb, acc, weights, depth


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (reference helper.py:17-18)."""
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR from MSE assuming [0, 1] signal range (reference helper.py:21-22)."""
    return -10.0 * jnp.log(mse) / math.log(10.0)

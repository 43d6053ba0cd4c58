"""Image quality metrics (pure JAX/numpy): PSNR, SSIM, object-PSNR, LPIPS.

Replaces the reference's piqa-based metrics (``models/interface.py:53-171``):

* ``psnr``: clip to [0,1] then -10 log10(mse) (interface.py:54-62).
* ``ssim``: standard Gaussian-window SSIM (window 11, sigma 1.5, k1=0.01,
  k2=0.03 on dynamic range 1) — the same algorithm piqa's SSIM implements.
* ``object psnr``: seg-mask-selected pixels only
  (``models/utils.py:102-109``).
* ``lpips``: VGG16-feature perceptual distance.  Pretrained VGG weights are
  not downloadable in this offline image; if a converted weight file exists
  (env ``AON_LPIPS_WEIGHTS`` or ``weights/lpips_vgg.npz``) it is used,
  otherwise LPIPS is reported as ``None`` (see eval/lpips.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    pred = np.clip(np.asarray(pred, np.float32), 0, 1)
    gt = np.clip(np.asarray(gt, np.float32), 0, 1)
    mse = np.mean((pred - gt) ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))


def psnr_masked(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray) -> float:
    """Object-PSNR over seg-selected pixels (models/utils.py:102-109)."""
    mask = np.asarray(mask, bool).reshape(-1)
    p = np.asarray(pred, np.float32).reshape(-1, 3)[mask]
    g = np.asarray(gt, np.float32).reshape(-1, 3)[mask]
    if p.size == 0:
        return float("nan")
    mse = np.mean((np.clip(p, 0, 1) - np.clip(g, 0, 1)) ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _filter2d(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode Gaussian filter; img: (H, W, C)."""
    img = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID")
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), "VALID")
    return jnp.moveaxis(out[:, 0], 0, -1)  # (H', W', C)


@jax.jit
def _ssim_jit(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    k = _gaussian_kernel()
    c1, c2 = 0.01**2, 0.03**2
    mu_p = _filter2d(pred, k)
    mu_g = _filter2d(gt, k)
    mu_pp = _filter2d(pred * pred, k)
    mu_gg = _filter2d(gt * gt, k)
    mu_pg = _filter2d(pred * gt, k)
    var_p = mu_pp - mu_p**2
    var_g = mu_gg - mu_g**2
    cov = mu_pg - mu_p * mu_g
    ssim_map = ((2 * mu_p * mu_g + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_g**2 + c1) * (var_p + var_g + c2)
    )
    return jnp.mean(ssim_map)


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    pred = jnp.clip(jnp.asarray(pred, jnp.float32), 0, 1)
    gt = jnp.clip(jnp.asarray(gt, jnp.float32), 0, 1)
    return float(_ssim_jit(pred, gt))


_warned_lpips = False


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    from aon_tpu.eval.lpips import lpips_fn

    fn = lpips_fn()
    if fn is None:
        global _warned_lpips
        if not _warned_lpips:
            _warned_lpips = True
            import sys

            print(
                "WARNING: LPIPS reported as null — VGG weights not found "
                "(weights/lpips_vgg.npz or $AON_LPIPS_WEIGHTS missing; see "
                "weights/README.md for the one-step produce-and-verify recipe)",
                file=sys.stderr,
            )
        return None
    return float(fn(np.asarray(pred), np.asarray(gt)))


def summarize(name: str, values: List[float]) -> dict:
    """Reference results.json stat dict shape (interface.py:125-171), plus a
    per-frame ``each`` list so committed artifacts can back frame-level
    analyses (e.g. learned-vs-interpolated latent frames of the 19-pose
    articulation sweep, where even indices use trained codes and odd
    indices midpoint-interpolated ones — code_library.py:55-71)."""
    vals = [v for v in values if v is not None and np.isfinite(v)]
    mean = float(np.mean(vals)) if vals else float("nan")
    each = [None if v is None or not np.isfinite(v) else float(v) for v in values]
    return {"name": name, "mean": mean, "test": mean, "each": each}

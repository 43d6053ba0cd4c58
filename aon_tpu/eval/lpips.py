"""LPIPS (VGG16) perceptual metric in flax, with offline-gated weights.

Replaces the reference's ``piqa.lpips.LPIPS(network="vgg")``
(``models/interface.py:113-123``).  Architecture: VGG16 features tapped after
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, unit-normalized along channels,
squared difference, 1x1 linear weighting, spatial mean, summed over taps —
the standard LPIPS formulation.

This image has no network egress, so torchvision's pretrained VGG weights
cannot be downloaded.  Weights are loaded from ``AON_LPIPS_WEIGHTS`` (or
``weights/lpips_vgg.npz`` relative to the repo) when present — produce one
with ``scripts/convert_lpips_weights.py`` on a machine with torchvision —
otherwise ``lpips_fn()`` returns ``None`` and eval reports LPIPS as null.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_TAPS = {1, 3, 6, 9, 12}  # conv indices (0-based among convs) after which features are tapped
# LPIPS normalization constants (standard)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path() -> Optional[str]:
    cand = os.environ.get("AON_LPIPS_WEIGHTS")
    if cand and os.path.exists(cand):
        return cand
    here = os.path.join(os.path.dirname(__file__), "..", "..", "weights", "lpips_vgg.npz")
    here = os.path.abspath(here)
    return here if os.path.exists(here) else None


def _vgg_features(params, x):
    """x: (1, H, W, 3) in [-1, 1] LPIPS-normalized; returns list of taps."""
    feats = []
    conv_idx = 0
    h = x
    for item in _VGG_CFG:
        if item == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        w = params[f"conv{conv_idx}_w"]
        b = params[f"conv{conv_idx}_b"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        h = jax.nn.relu(h)
        if conv_idx in _TAPS:
            feats.append(h)
        conv_idx += 1
    return feats


def _lpips_distance(params, pred, gt):
    def prep(img):
        img = img * 2.0 - 1.0  # [0,1] -> [-1,1]
        img = (img - _SHIFT) / _SCALE
        return img[None]

    fp = _vgg_features(params, prep(pred))
    fg = _vgg_features(params, prep(gt))
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, fg)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = params[f"lin{i}_w"]  # (1, 1, C, 1)
        d = jax.lax.conv_general_dilated(
            diff, lin, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        total = total + jnp.mean(d)
    return total


def lpips_weights_kind() -> Optional[str]:
    """None (no weights), "pretrained", or "synthetic" (random-weight npz
    from scripts/make_synthetic_lpips_weights.py — plumbing-test only; its
    values are meaningless as a perceptual metric).  Recorded in every eval
    results.json that reports a non-null LPIPS."""
    path = _weights_path()
    if path is None:
        return None
    with np.load(path) as data:
        return "synthetic" if "__synthetic__" in data.files else "pretrained"


@functools.lru_cache(maxsize=1)
def lpips_fn() -> Optional[Callable]:
    path = _weights_path()
    if path is None:
        return None
    data = np.load(path)
    params = {
        k: jnp.asarray(data[k]) for k in data.files if k != "__synthetic__"
    }
    dist = jax.jit(lambda p, g: _lpips_distance(params, p, g))

    def fn(pred: np.ndarray, gt: np.ndarray) -> float:
        pred = jnp.clip(jnp.asarray(pred, jnp.float32), 0, 1)
        gt = jnp.clip(jnp.asarray(gt, jnp.float32), 0, 1)
        return float(dist(pred, gt))

    return fn

"""Pallas TPU kernel: fused vanilla NeRF MLP evaluation.

Why: XLA compiles the 10-layer MLP as one GEMM kernel per layer, each
reading/writing (num_samples, 256) activations through HBM — for a 640x480
eval frame that's ~3 GB of pure activation traffic per level.  This kernel
keeps every activation in VMEM: it streams tiles of encoded samples in,
runs the whole trunk + heads on-chip (weights are ~2.3 MB and live in VMEM
for the entire grid), and writes only the 4 output channels
(raw_rgb, raw_sigma) back.  HBM traffic drops to inputs+outputs
(~100 bytes/sample vs ~10 KB/sample), leaving the kernel MXU-bound.

Architecture mirrors NeRFMLP (aon_tpu/models/mlp.py; reference
model.py:39-120): 8x256 trunk with the encoded input re-concatenated after
layer 4, bottleneck, density head, 1x128 view branch, rgb head.  The skip
concat is algebraized: layer5's (319, 256) kernel is split into a (256, 256)
part applied to the activation and a (64, 256) zero-padded part applied to
the encoded input, so no in-kernel concatenation is needed; the view branch
input concat is split the same way.

Weights are packed once per checkpoint via ``pack_vanilla_mlp_params``
(zero-padding 63->64 and 27->32 on the K dimension) and passed as plain
arrays; all matmuls accumulate in float32 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POS_ENC_DIM = 63  # (2*10 + 1) * 3
POS_PAD = 64
VIEW_ENC_DIM = 27  # (2*4 + 1) * 3
VIEW_PAD = 32
WIDTH = 256
COND_WIDTH = 128
TILE = 512  # samples per grid step


def _interpret() -> bool:
    """Interpreter mode for CPU testing (env AON_PALLAS_INTERPRET=1)."""
    import os

    return os.environ.get("AON_PALLAS_INTERPRET", "0") == "1"


def pack_vanilla_mlp_params(params: Dict, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Pack a NeRFMLP params subtree (flax, from models/mlp.py) for the kernel.

    Splits the skip layer (pts_5) and view-branch input kernels, zero-pads
    encoded-input K dims to lane multiples, and casts to the compute dtype.
    """

    def pad_k(w, k_pad):
        return jnp.pad(w, ((0, k_pad - w.shape[0]), (0, 0)))

    out = {}
    w0 = params["pts_0"]["kernel"]  # (63, 256)
    out["w0"] = pad_k(w0, POS_PAD).astype(dtype)
    out["b0"] = params["pts_0"]["bias"].astype(jnp.float32)
    for i in range(1, 8):
        w = params[f"pts_{i}"]["kernel"]
        if i == 5:  # (256 + 63, 256) -> split
            out["w5a"] = w[:WIDTH].astype(dtype)
            out["w5b"] = pad_k(w[WIDTH:], POS_PAD).astype(dtype)
        else:
            out[f"w{i}"] = w.astype(dtype)
        out[f"b{i}"] = params[f"pts_{i}"]["bias"].astype(jnp.float32)
    out["wb"] = params["bottleneck"]["kernel"].astype(dtype)
    out["bb"] = params["bottleneck"]["bias"].astype(jnp.float32)
    out["wd"] = params["density"]["kernel"].astype(dtype)  # (256, 1)
    out["bd"] = params["density"]["bias"].astype(jnp.float32)
    wv = params["views_0"]["kernel"]  # (256 + 27, 128)
    out["wva"] = wv[:WIDTH].astype(dtype)
    out["wvb"] = pad_k(wv[WIDTH:], VIEW_PAD).astype(dtype)
    out["bv"] = params["views_0"]["bias"].astype(jnp.float32)
    out["wrgb"] = params["rgb"]["kernel"].astype(dtype)  # (128, 3)
    out["brgb"] = params["rgb"]["bias"].astype(jnp.float32)
    return out


_WEIGHT_ORDER = (
    "w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
    "w5a", "w5b", "b5", "w6", "b6", "w7", "b7",
    "wb", "bb", "wd", "bd", "wva", "wvb", "bv", "wrgb", "brgb",
)


def _mlp_body(enc, venc, w, out_ref):
    """Shared trunk+heads body; enc (T, 64) and venc (T, 32) in compute dtype."""
    dtype = enc.dtype

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    h = jnp.maximum(dot(enc, w["w0"][...]) + w["b0"][...], 0.0).astype(dtype)
    for i in (1, 2, 3, 4):
        h = jnp.maximum(dot(h, w[f"w{i}"][...]) + w[f"b{i}"][...], 0.0).astype(dtype)
    # skip concat after layer 4: layer5(cat[h, enc]) == h@w5a + enc@w5b
    h = jnp.maximum(
        dot(h, w["w5a"][...]) + dot(enc, w["w5b"][...]) + w["b5"][...], 0.0
    ).astype(dtype)
    for i in (6, 7):
        h = jnp.maximum(dot(h, w[f"w{i}"][...]) + w[f"b{i}"][...], 0.0).astype(dtype)

    sigma = dot(h, w["wd"][...]) + w["bd"][...]  # (T, 1) fp32
    bottleneck = (dot(h, w["wb"][...]) + w["bb"][...]).astype(dtype)
    v = jnp.maximum(
        dot(bottleneck, w["wva"][...]) + dot(venc, w["wvb"][...]) + w["bv"][...], 0.0
    ).astype(dtype)
    rgb = dot(v, w["wrgb"][...]) + w["brgb"][...]  # (T, 3) fp32
    out_ref[...] = jnp.concatenate([rgb, sigma], axis=-1)


def _kernel(enc_ref, venc_ref, *refs):
    weight_refs = refs[:-1]
    out_ref = refs[-1]
    w = dict(zip(_WEIGHT_ORDER, weight_refs))
    dtype = w["w0"].dtype

    enc = enc_ref[...].astype(dtype)  # (T, 64)
    venc = venc_ref[...].astype(dtype)  # (T, 32)
    _mlp_body(enc, venc, w, out_ref)


def _kernel_per_ray(enc_ref, venc_ref, *refs):
    """venc arrives per-RAY (R, 32); repeated to per-sample in VMEM —
    saving the N x 32 HBM stream of the flat variant."""
    weight_refs = refs[:-1]
    out_ref = refs[-1]
    w = dict(zip(_WEIGHT_ORDER, weight_refs))
    dtype = w["w0"].dtype

    enc = enc_ref[...].astype(dtype)  # (R*S, 64)
    venc_rays = venc_ref[...].astype(dtype)  # (R, 32)
    rows = enc.shape[0]
    n_rays = venc_rays.shape[0]
    repeats = rows // n_rays
    # Expand per-ray venc to per-sample via a selection-matrix matmul:
    # E[i, r] = 1 iff sample-row i belongs to ray r.  (jnp.repeat lowers to
    # scatter and broadcast+reshape across a non-lane dim both fail Mosaic;
    # a tiny (rows, R) GEMM is cheap and always lowers.)
    row_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, n_rays), 0) // repeats
    col_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, n_rays), 1)
    select = (row_ray == col_ray).astype(dtype)
    venc = jax.lax.dot_general(
        select, venc_rays, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)
    _mlp_body(enc, venc, w, out_ref)


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_nerf_mlp(
    packed: Dict[str, jnp.ndarray],
    samples_enc: jnp.ndarray,
    viewdirs_enc: jnp.ndarray,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the fused MLP.

    Args:
      packed: output of pack_vanilla_mlp_params.
      samples_enc: (N, 63) or (N, 64) encoded positions; N % tile == 0.
      viewdirs_enc: (N, 27) or (N, 32) encoded view dirs (pre-tiled per sample).

    Returns (raw_rgb (N, 3), raw_sigma (N, 1)) in float32.
    """
    n = samples_enc.shape[0]
    n_pad = (n + tile - 1) // tile * tile
    if n_pad != n:
        samples_enc = jnp.pad(samples_enc, ((0, n_pad - n), (0, 0)))
        viewdirs_enc = jnp.pad(viewdirs_enc, ((0, n_pad - n), (0, 0)))
    if samples_enc.shape[1] != POS_PAD:
        samples_enc = jnp.pad(samples_enc, ((0, 0), (0, POS_PAD - samples_enc.shape[1])))
    if viewdirs_enc.shape[1] != VIEW_PAD:
        viewdirs_enc = jnp.pad(viewdirs_enc, ((0, 0), (0, VIEW_PAD - viewdirs_enc.shape[1])))

    # biases are small 1-D fp32 vectors; reshape to (1, C) for clean tiling
    weights = [packed[k] for k in _WEIGHT_ORDER]
    weights = [wt.reshape(1, -1) if wt.ndim == 1 else wt for wt in weights]

    grid = (n_pad // tile,)
    out = pl.pallas_call(
        _kernel,
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, POS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, VIEW_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (64 * 256 + 6 * 256 * 256 + 64 * 256 + 2 * 256 * 256
                               + 256 + (256 + 32) * 128 + 128 * 3),
            bytes_accessed=n_pad * (64 + 32 + 4) * 4,
            transcendentals=0,
        ),
    )(samples_enc, viewdirs_enc, *weights)
    return out[:n, :3], out[:n, 3:]


@functools.partial(jax.jit, static_argnames=("ray_tile",))
def fused_nerf_mlp_per_ray(
    packed: Dict[str, jnp.ndarray],
    samples_enc: jnp.ndarray,
    viewdirs_enc: jnp.ndarray,
    ray_tile: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray variant: viewdir encodings are read once per RAY and expanded
    on-chip, instead of streaming a per-sample copy from HBM (which costs
    ~N x 128 B for a render pass).

    Args:
      samples_enc: (B, S, 63|64) encoded positions.
      viewdirs_enc: (B, 27|32) per-ray encoded view dirs.

    Returns (raw_rgb (B, S, 3), raw_sigma (B, S, 1)) in float32.
    """
    B, S, feat = samples_enc.shape
    b_pad = (B + ray_tile - 1) // ray_tile * ray_tile
    if b_pad != B:
        samples_enc = jnp.pad(samples_enc, ((0, b_pad - B), (0, 0), (0, 0)), mode="edge")
        viewdirs_enc = jnp.pad(viewdirs_enc, ((0, b_pad - B), (0, 0)), mode="edge")
    if feat != POS_PAD:
        samples_enc = jnp.pad(samples_enc, ((0, 0), (0, 0), (0, POS_PAD - feat)))
    if viewdirs_enc.shape[1] != VIEW_PAD:
        viewdirs_enc = jnp.pad(viewdirs_enc, ((0, 0), (0, VIEW_PAD - viewdirs_enc.shape[1])))

    enc_flat = samples_enc.reshape(b_pad * S, POS_PAD)
    weights = [packed[k] for k in _WEIGHT_ORDER]
    weights = [wt.reshape(1, -1) if wt.ndim == 1 else wt for wt in weights]

    rows = ray_tile * S
    grid = (b_pad // ray_tile,)
    out = pl.pallas_call(
        _kernel_per_ray,
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, POS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, VIEW_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=pl.BlockSpec((rows, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * S, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * S * (64 * 256 + 6 * 256 * 256 + 64 * 256 + 2 * 256 * 256
                                   + 256 + (256 + 32) * 128 + 128 * 3),
            bytes_accessed=b_pad * S * (64 + 4) * 4 + b_pad * 32 * 4,
            transcendentals=0,
        ),
    )(enc_flat, viewdirs_enc, *weights)
    out = out.reshape(b_pad, S, 4)[:B]
    return out[..., :3], out[..., 3:]

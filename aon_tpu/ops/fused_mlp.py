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


def make_posenc_constants(max_deg: int = 10, view_deg: int = 4, dtype=jnp.float32):
    """Constants for IN-KERNEL positional encoding from raw coords.

    pos_enc is a linear map followed by a masked sin:
      pre = x @ S + P;  enc = where(col < 3, pre, sin(pre))
    with S scattering x_c * 2^d into the frequency-major layout of
    core/sampling.pos_enc and P holding the pi/2 phase of the cos block.
    Streaming raw (N, 4) coords instead of (N, 64) encodings cuts the
    kernel's input HBM traffic ~12x.
    """
    import numpy as np

    def build(deg, width):
        s = np.zeros((4, width), np.float32)
        p = np.zeros((1, width), np.float32)
        for c in range(3):
            s[c, c] = 1.0  # identity channels
        for d in range(deg):
            for c in range(3):
                s[c, 3 + d * 3 + c] = 2.0**d  # sin block
                s[c, 3 + 3 * deg + d * 3 + c] = 2.0**d  # cos block
                p[0, 3 + 3 * deg + d * 3 + c] = 0.5 * np.pi
        return jnp.asarray(s, dtype), jnp.asarray(p, dtype)

    s_pos, p_pos = build(max_deg, POS_PAD)
    s_view, p_view = build(view_deg, VIEW_PAD)
    return {"s_pos": s_pos, "p_pos": p_pos, "s_view": s_view, "p_view": p_view}


_ENC_ORDER = ("s_pos", "p_pos", "s_view", "p_view")


def _encode_in_kernel(x4, s, p, dtype):
    """x4 (T, 4) raw coords -> (T, width) pos-enc, computed on VPU/MXU.

    The scale/phase matmul and the sine run in FLOAT32: bf16 coords scaled
    by 2^9 carry O(radians) of phase error at the high frequencies, which
    destroys the encoding.  Only the post-sine values are cast down.
    """
    # ELEMENTWISE scale/scatter (VPU, exact f32): an MXU dot here would run
    # at bf16 input precision (f32 matmuls decompose to bf16 passes), and a
    # ~2^-8 relative coordinate error scaled by 2^9 is O(radians) of phase —
    # garbage at the high frequencies.
    x4 = x4.astype(jnp.float32)
    s = s[...].astype(jnp.float32)
    pre = (
        x4[:, 0:1] * s[0:1, :]
        + x4[:, 1:2] * s[1:2, :]
        + x4[:, 2:3] * s[2:3, :]
        + p[...].astype(jnp.float32)
    )
    # Explicit range reduction to [-pi, pi]: the TPU's hardware sine has no
    # argument reduction, and |x * 2^9| reaches ~1500 rad at the highest
    # frequency (interpret mode uses the host libm and hides both issues).
    two_pi = 2.0 * 3.14159265358979
    reduced = pre - two_pi * jnp.floor(pre / two_pi + 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    return jnp.where(col < 3, pre, jnp.sin(reduced)).astype(dtype)


def _mlp_body(enc, venc, w, out_ref):
    """Shared trunk+heads body; enc (T, 64) and venc (T, 32) in compute dtype."""
    out_ref[...] = _mlp_compute(enc, venc, w)


def _mlp_compute(enc, venc, w):
    """Trunk + heads returning the (T, 4) [rgb | sigma] block."""
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
    return jnp.concatenate([rgb, sigma], axis=-1)


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


def _kernel_xyz_per_ray(xyz_ref, vdir_ref, *refs):
    """v2 eval kernel: raw (R*S, 4) sample coords + per-ray (R, 4) viewdirs;
    both positional encodings computed in-kernel (make_posenc_constants)."""
    enc_refs = refs[: len(_ENC_ORDER)]
    weight_refs = refs[len(_ENC_ORDER) : -1]
    out_ref = refs[-1]
    e = dict(zip(_ENC_ORDER, enc_refs))
    w = dict(zip(_WEIGHT_ORDER, weight_refs))
    dtype = w["w0"].dtype

    xyz = xyz_ref[...]
    vdir_rays = vdir_ref[...]  # (R, 4)
    rows = xyz.shape[0]
    n_rays = vdir_rays.shape[0]
    repeats = rows // n_rays

    enc = _encode_in_kernel(xyz, e["s_pos"], e["p_pos"], dtype)
    row_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, n_rays), 0) // repeats
    col_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, n_rays), 1)
    # f32 selection GEMM: keeps viewdir values exact pre-encoding
    select = (row_ray == col_ray).astype(jnp.float32)
    vdir = jax.lax.dot_general(
        select, vdir_rays.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    venc = _encode_in_kernel(vdir, e["s_view"], e["p_view"], dtype)
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


@functools.partial(jax.jit, static_argnames=("ray_tile",))
def fused_nerf_mlp_xyz(
    packed: Dict[str, jnp.ndarray],
    enc_consts: Dict[str, jnp.ndarray],
    samples: jnp.ndarray,
    viewdirs: jnp.ndarray,
    ray_tile: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v2 eval entry: raw coords in, encodings computed in-kernel.

    Args:
      enc_consts: make_posenc_constants() output.
      samples: (B, S, 3) raw sample positions.
      viewdirs: (B, 3) per-ray unit view dirs.

    Returns (raw_rgb (B, S, 3), raw_sigma (B, S, 1)) fp32.
    """
    B, S_in, _ = samples.shape
    S = (S_in + 7) // 8 * 8  # rows per tile must be 8-divisible (Mosaic)
    if S != S_in:
        samples = jnp.pad(samples, ((0, 0), (0, S - S_in), (0, 0)))
    b_pad = (B + ray_tile - 1) // ray_tile * ray_tile
    if b_pad != B:
        samples = jnp.pad(samples, ((0, b_pad - B), (0, 0), (0, 0)), mode="edge")
        viewdirs = jnp.pad(viewdirs, ((0, b_pad - B), (0, 0)), mode="edge")
    xyz = jnp.pad(samples.reshape(b_pad * S, 3), ((0, 0), (0, 1)))
    vdir = jnp.pad(viewdirs, ((0, 0), (0, 1)))

    enc_args = [enc_consts[k] for k in _ENC_ORDER]
    weights = [packed[k] for k in _WEIGHT_ORDER]
    weights = [wt.reshape(1, -1) if wt.ndim == 1 else wt for wt in weights]

    rows = ray_tile * S
    out = pl.pallas_call(
        _kernel_xyz_per_ray,
        interpret=_interpret(),
        grid=(b_pad // ray_tile,),
        in_specs=[
            pl.BlockSpec((rows, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in enc_args],
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=pl.BlockSpec((rows, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * S, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * S * (64 * 256 + 6 * 256 * 256 + 64 * 256 + 2 * 256 * 256
                                   + 256 + (256 + 32) * 128 + 128 * 3),
            bytes_accessed=b_pad * S * 8 * 4,
            transcendentals=b_pad * S * (60 + 24),
        ),
    )(xyz, vdir, *enc_args, *weights)
    out = out.reshape(b_pad, S, 4)[:B, :S_in]
    return out[..., :3], out[..., 3:]

"""Pallas training kernels for the vanilla NeRF MLP: fused forward +
fused backward with in-kernel rematerialization.

Key observation: in NeRF training the MLP inputs (encoded sample positions
and view directions) carry NO parameter gradients — sample positions are
stop-gradient (aon_tpu/core/sampling.py) and viewdirs are data.  So the
backward pass only needs WEIGHT gradients, never dx.  That lets the whole
backward run as one Pallas kernel that:

  * recomputes the forward activations tile-by-tile in VMEM (remat, but
    on-chip — zero HBM activation traffic, unlike XLA remat which still
    spills between fusions), and
  * accumulates all 26 weight/bias gradients in VMEM across the grid
    (constant output index_map; TPU grids execute sequentially so the
    accumulators persist on-chip and are written back once).

Exposed as ``fused_mlp_train`` with a ``jax.custom_vjp``: weights enter as
an fp32 packed dict (see ``pack_vanilla_mlp_params_f32``), matmuls run in
bf16 with fp32 accumulation, gradients come back fp32.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aon_tpu.ops.fused_mlp import (
    POS_PAD,
    VIEW_PAD,
    _ENC_ORDER,
    _WEIGHT_ORDER,
    _encode_in_kernel,
    _interpret,
    _kernel,
)

# 512 rows: the bwd kernel holds fp32 weights + fp32 grad accumulators
# (~4.8 MB) plus ~12 live activation tiles; 1024-row tiles overflow the
# 16 MB VMEM budget by ~0.4 MB.
#
# NOTE (round-2 measurement): preconverting weights to bf16 outside the
# kernels REGRESSES the end-to-end step ~6% (69k -> 65k rays/s on v5e):
# the MXU converts f32 operands to its bf16 pass for free in the load
# path, while bf16 weights flip the fwd body's compute dtype and force
# explicit per-layer activation casts.  Keep fp32 packed weights.
TRAIN_TILE = 512

# (rows, cols) of every packed tensor, in _WEIGHT_ORDER (biases as (1, C))
_SHAPES = {
    "w0": (POS_PAD, 256), "b0": (1, 256),
    "w1": (256, 256), "b1": (1, 256),
    "w2": (256, 256), "b2": (1, 256),
    "w3": (256, 256), "b3": (1, 256),
    "w4": (256, 256), "b4": (1, 256),
    "w5a": (256, 256), "w5b": (POS_PAD, 256), "b5": (1, 256),
    "w6": (256, 256), "b6": (1, 256),
    "w7": (256, 256), "b7": (1, 256),
    "wb": (256, 256), "bb": (1, 256),
    "wd": (256, 1), "bd": (1, 1),
    "wva": (256, 128), "wvb": (VIEW_PAD, 128), "bv": (1, 128),
    "wrgb": (128, 3), "brgb": (1, 3),
}


def pack_vanilla_mlp_params_f32(params: Dict) -> Dict[str, jnp.ndarray]:
    """fp32 packing (training path — fp32 grads; kernels cast to bf16)."""
    from aon_tpu.ops.fused_mlp import pack_vanilla_mlp_params

    packed = pack_vanilla_mlp_params(params, dtype=jnp.float32)
    return {k: v.reshape(1, -1) if v.ndim == 1 else v for k, v in packed.items()}


def _fwd_activations(enc, venc, w):
    """Forward pass returning every tensor the backward needs."""
    bf = jnp.bfloat16

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # activations stored bf16 (they re-enter bf16 matmuls anyway) to halve
    # the VMEM footprint of the backward's rematerialized state
    acts = {}
    a = jnp.maximum(dot(enc, w["w0"][...]) + w["b0"][...], 0.0).astype(bf)
    acts["a0"] = a
    for i in (1, 2, 3, 4):
        a = jnp.maximum(dot(a, w[f"w{i}"][...]) + w[f"b{i}"][...], 0.0).astype(bf)
        acts[f"a{i}"] = a
    a = jnp.maximum(
        dot(acts["a4"], w["w5a"][...]) + dot(enc, w["w5b"][...]) + w["b5"][...], 0.0
    ).astype(bf)
    acts["a5"] = a
    for i in (6, 7):
        a = jnp.maximum(dot(a, w[f"w{i}"][...]) + w[f"b{i}"][...], 0.0).astype(bf)
        acts[f"a{i}"] = a
    acts["sigma"] = dot(acts["a7"], w["wd"][...]) + w["bd"][...]
    acts["bottleneck"] = (dot(acts["a7"], w["wb"][...]) + w["bb"][...]).astype(bf)
    acts["v"] = jnp.maximum(
        dot(acts["bottleneck"], w["wva"][...]) + dot(venc, w["wvb"][...]) + w["bv"][...],
        0.0,
    ).astype(bf)
    acts["rgb"] = dot(acts["v"], w["wrgb"][...]) + w["brgb"][...]
    return acts


def _bwd_kernel(enc_ref, venc_ref, g_ref, *refs):
    """refs = [26 weight refs] + [26 grad-accumulator refs]."""
    n_w = len(_WEIGHT_ORDER)
    w = dict(zip(_WEIGHT_ORDER, refs[:n_w]))
    gw = dict(zip(_WEIGHT_ORDER, refs[n_w:]))
    bf = jnp.bfloat16

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for name in _WEIGHT_ORDER:
            gw[name][...] = jnp.zeros_like(gw[name])

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_tn(a, b):
        # a^T @ b with a (T, M), b (T, N) -> (M, N)
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_nt(a, b):
        # a @ b^T with a (T, N), b (M, N) -> (T, M)
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    enc = enc_ref[...]
    venc = venc_ref[...]
    g = g_ref[...]
    g_rgb, g_sigma = g[:, :3], g[:, 3:4]

    acts = _fwd_activations(enc, venc, {k: w[k] for k in _WEIGHT_ORDER})

    def acc(name, val):
        gw[name][...] += val

    def bias_grad(gr):
        return jnp.sum(gr, axis=0, keepdims=True)

    # rgb head
    acc("wrgb", dot_tn(acts["v"], g_rgb))
    acc("brgb", bias_grad(g_rgb))
    dv = dot_nt(g_rgb, w["wrgb"][...]) * (acts["v"].astype(jnp.float32) > 0)

    # view branch
    acc("wva", dot_tn(acts["bottleneck"], dv))
    acc("wvb", dot_tn(venc, dv))
    acc("bv", bias_grad(dv))
    dbott = dot_nt(dv, w["wva"][...])

    # bottleneck (linear) + density head, both from a7
    acc("wb", dot_tn(acts["a7"], dbott))
    acc("bb", bias_grad(dbott))
    acc("wd", dot_tn(acts["a7"], g_sigma))
    acc("bd", bias_grad(g_sigma))
    da = (dot_nt(dbott, w["wb"][...]) + dot_nt(g_sigma, w["wd"][...])) * (acts["a7"].astype(jnp.float32) > 0)

    # trunk layers 7, 6
    acc("w7", dot_tn(acts["a6"], da))
    acc("b7", bias_grad(da))
    da = dot_nt(da, w["w7"][...]) * (acts["a6"].astype(jnp.float32) > 0)
    acc("w6", dot_tn(acts["a5"], da))
    acc("b6", bias_grad(da))
    da = dot_nt(da, w["w6"][...]) * (acts["a5"].astype(jnp.float32) > 0)

    # skip layer 5: inputs a4 and enc
    acc("w5a", dot_tn(acts["a4"], da))
    acc("w5b", dot_tn(enc, da))
    acc("b5", bias_grad(da))
    da = dot_nt(da, w["w5a"][...]) * (acts["a4"].astype(jnp.float32) > 0)

    # layers 4..1
    for idx in (4, 3, 2, 1):
        acc(f"w{idx}", dot_tn(acts[f"a{idx - 1}"], da))
        acc(f"b{idx}", bias_grad(da))
        da = dot_nt(da, w[f"w{idx}"][...]) * (acts[f"a{idx - 1}"].astype(jnp.float32) > 0)

    # layer 0: input enc
    acc("w0", dot_tn(enc, da))
    acc("b0", bias_grad(da))


def _pad_features(enc, venc):
    if enc.shape[1] != POS_PAD:
        enc = jnp.pad(enc, ((0, 0), (0, POS_PAD - enc.shape[1])))
    if venc.shape[1] != VIEW_PAD:
        venc = jnp.pad(venc, ((0, 0), (0, VIEW_PAD - venc.shape[1])))
    return enc, venc


def _fwd_call(packed: Dict[str, jnp.ndarray], enc: jnp.ndarray, venc: jnp.ndarray,
              tile: int) -> jnp.ndarray:
    enc, venc = _pad_features(enc, venc)
    n = enc.shape[0]
    n_pad = (n + tile - 1) // tile * tile
    if n_pad != n:
        enc = jnp.pad(enc, ((0, n_pad - n), (0, 0)))
        venc = jnp.pad(venc, ((0, n_pad - n), (0, 0)))
    weights = [packed[k] for k in _WEIGHT_ORDER]
    out = pl.pallas_call(
        _kernel,
        interpret=_interpret(),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, POS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, VIEW_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
    )(enc, venc, *weights)
    return out[:n]


def _bwd_call(packed, enc, venc, g, tile: int) -> Dict[str, jnp.ndarray]:
    enc, venc = _pad_features(enc, venc)
    n = enc.shape[0]
    n_pad = (n + tile - 1) // tile * tile
    if n_pad != n:
        # zero-padding: padded rows contribute zero gradient (g = 0)
        enc = jnp.pad(enc, ((0, n_pad - n), (0, 0)))
        venc = jnp.pad(venc, ((0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    weights = [packed[k] for k in _WEIGHT_ORDER]
    out_shapes = [
        jax.ShapeDtypeStruct(_SHAPES[k], jnp.float32) for k in _WEIGHT_ORDER
    ]
    grads = pl.pallas_call(
        _bwd_kernel,
        interpret=_interpret(),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, POS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, VIEW_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=[
            pl.BlockSpec(_SHAPES[k], lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in _WEIGHT_ORDER
        ],
        out_shape=out_shapes,
    )(enc, venc, g, *weights)
    return dict(zip(_WEIGHT_ORDER, grads))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp_train(packed, enc, venc, tile=TRAIN_TILE):
    """Differentiable fused MLP: (packed fp32, enc (N,64), venc (N,32)) ->
    (raw_rgb (N,3), raw_sigma (N,1)).  Gradients flow to ``packed`` only."""
    out = _fwd_call(packed, enc, venc, tile)
    return out[:, :3], out[:, 3:]


def _train_fwd(packed, enc, venc, tile):
    out = _fwd_call(packed, enc, venc, tile)
    return (out[:, :3], out[:, 3:]), (packed, enc, venc)


def _train_bwd(tile, res, cotangents):
    packed, enc, venc = res
    g_rgb, g_sigma = cotangents
    g = jnp.concatenate([g_rgb, g_sigma], axis=-1).astype(jnp.float32)
    d_packed = _bwd_call(packed, enc, venc, g, tile)
    return d_packed, jnp.zeros_like(enc), jnp.zeros_like(venc)


fused_mlp_train.defvjp(_train_fwd, _train_bwd)


# ---------------------------------------------------------------- v2 (xyz)
# Raw coords in, positional encodings computed in-kernel: cuts the per-level
# input stream from (N x 96 f32) to (N x 4 + B x 4) — the dominant HBM
# traffic once the MLP itself is fused.


def _kernel_xyz_flat(xv_ref, *refs):
    """Flat v2 fwd kernel.

    Streams arrive TRANSPOSED: ``xv_ref`` is an (8, T) block holding
    [x, y, z, pad, vx, vy, vz, pad] rows, and the output block is (4, T)
    [r, g, b, sigma] rows.  Narrow-minor (T, 4) operands would force XLA to
    relayout each 16-byte row into a 512-byte T(8,128) tile row — 32x HBM
    scratch (3 GB per 2M samples, the round-2 eval OOM); wide-minor (8, T)
    blocks carry zero padding, and the (8, T) -> (T, 8) transpose is a
    cheap in-register shuffle."""
    e = dict(zip(_ENC_ORDER, refs[: len(_ENC_ORDER)]))
    rest = refs[len(_ENC_ORDER) :]
    w = dict(zip(_WEIGHT_ORDER, rest[:-1]))
    out_ref = rest[-1]
    from aon_tpu.ops.fused_mlp import _mlp_compute

    dtype = w["w0"].dtype
    xv = jnp.transpose(xv_ref[...])  # (T, 8)
    enc = _encode_in_kernel(xv[:, :4], e["s_pos"], e["p_pos"], dtype)
    venc = _encode_in_kernel(xv[:, 4:], e["s_view"], e["p_view"], dtype)
    out_ref[...] = jnp.transpose(_mlp_compute(enc, venc, w))


def _bwd_kernel_xyz_flat(xv_ref, g_ref, *refs):
    """Flat v2 bwd kernel: transposed (8, T) coord/viewdir and (4, T)
    cotangent streams (see _kernel_xyz_flat); 512-row tiles fit VMEM."""
    e = dict(zip(_ENC_ORDER, refs[: len(_ENC_ORDER)]))
    rest = refs[len(_ENC_ORDER) :]
    n_w = len(_WEIGHT_ORDER)
    w = dict(zip(_WEIGHT_ORDER, rest[:n_w]))
    gw = dict(zip(_WEIGHT_ORDER, rest[n_w:]))
    bf = jnp.bfloat16

    xv = jnp.transpose(xv_ref[...])  # (T, 8)
    enc = _encode_in_kernel(xv[:, :4], e["s_pos"], e["p_pos"], bf)
    venc = _encode_in_kernel(xv[:, 4:], e["s_view"], e["p_view"], bf)
    _bwd_body(enc, venc, jnp.transpose(g_ref[...]), w, gw, pl.program_id(0))


def _bwd_body(enc, venc, g, w, gw, program_i):
    """Backward math shared by the enc-input and xyz-input kernels."""
    bf = jnp.bfloat16

    @pl.when(program_i == 0)
    def _init():
        for name in _WEIGHT_ORDER:
            gw[name][...] = jnp.zeros_like(gw[name])

    def dot_tn(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_nt(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g_rgb, g_sigma = g[:, :3], g[:, 3:4]
    acts = _fwd_activations(enc, venc, w)

    def acc(name, val):
        gw[name][...] += val

    def bias_grad(gr):
        return jnp.sum(gr, axis=0, keepdims=True)

    def relu_mask(a):
        return a.astype(jnp.float32) > 0

    acc("wrgb", dot_tn(acts["v"], g_rgb))
    acc("brgb", bias_grad(g_rgb))
    dv = dot_nt(g_rgb, w["wrgb"][...]) * relu_mask(acts["v"])

    acc("wva", dot_tn(acts["bottleneck"], dv))
    acc("wvb", dot_tn(venc, dv))
    acc("bv", bias_grad(dv))
    dbott = dot_nt(dv, w["wva"][...])

    acc("wb", dot_tn(acts["a7"], dbott))
    acc("bb", bias_grad(dbott))
    acc("wd", dot_tn(acts["a7"], g_sigma))
    acc("bd", bias_grad(g_sigma))
    da = (dot_nt(dbott, w["wb"][...]) + dot_nt(g_sigma, w["wd"][...])) * relu_mask(acts["a7"])

    acc("w7", dot_tn(acts["a6"], da))
    acc("b7", bias_grad(da))
    da = dot_nt(da, w["w7"][...]) * relu_mask(acts["a6"])
    acc("w6", dot_tn(acts["a5"], da))
    acc("b6", bias_grad(da))
    da = dot_nt(da, w["w6"][...]) * relu_mask(acts["a5"])

    acc("w5a", dot_tn(acts["a4"], da))
    acc("w5b", dot_tn(enc, da))
    acc("b5", bias_grad(da))
    da = dot_nt(da, w["w5a"][...]) * relu_mask(acts["a4"])

    for idx in (4, 3, 2, 1):
        acc(f"w{idx}", dot_tn(acts[f"a{idx - 1}"], da))
        acc(f"b{idx}", bias_grad(da))
        da = dot_nt(da, w[f"w{idx}"][...]) * relu_mask(acts[f"a{idx - 1}"])

    acc("w0", dot_tn(enc, da))
    acc("b0", bias_grad(da))


def _pack_xv_T(xyz, vdir_rays, tile):
    """(B, S, 3) coords + (B, 3) per-ray dirs -> TRANSPOSED (8, n_pad)
    stream [x, y, z, 0, vx, vy, vz, 0] (see _kernel_xyz_flat: wide-minor
    layout avoids the 32x T(8,128) relayout scratch of (N, 4) operands)."""
    B, S, _ = xyz.shape
    n = B * S
    n_pad = (n + tile - 1) // tile * tile
    xyz4 = jnp.pad(xyz.reshape(n, 3), ((0, n_pad - n), (0, 1)))
    vdir = jnp.broadcast_to(vdir_rays[:, None, :], (B, S, 3)).reshape(n, 3)
    vdir4 = jnp.pad(vdir, ((0, n_pad - n), (0, 1)))
    return jnp.concatenate([xyz4, vdir4], axis=1).T, n, n_pad


def _fwd_call_xyz(packed, enc_consts, xyz, vdir_rays, tile):
    """Flat dispatch: (B, S, 3) coords + (B, 3) per-ray dirs -> one
    transposed (8, N) stream (the vdir broadcast costs 16 B/sample, still
    ~24x less than streaming precomputed encodings)."""
    B, S, _ = xyz.shape
    xv, n, n_pad = _pack_xv_T(xyz, vdir_rays, tile)
    enc_args = [enc_consts[k] for k in _ENC_ORDER]
    weights = [packed[k] for k in _WEIGHT_ORDER]
    out = pl.pallas_call(
        _kernel_xyz_flat,
        interpret=_interpret(),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in enc_args],
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
    )(xv, *enc_args, *weights)
    return out.T[:n].reshape(B, S, 4)


def _bwd_call_xyz(packed, enc_consts, xyz, vdir_rays, g, tile):
    B, S, _ = xyz.shape
    xv, n, n_pad = _pack_xv_T(xyz, vdir_rays, tile)
    g_flat = jnp.pad(g.reshape(n, 4), ((0, n_pad - n), (0, 0))).T  # zero grad pad
    enc_args = [enc_consts[k] for k in _ENC_ORDER]
    weights = [packed[k] for k in _WEIGHT_ORDER]
    grads = pl.pallas_call(
        _bwd_kernel_xyz_flat,
        interpret=_interpret(),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in enc_args],
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=[
            pl.BlockSpec(_SHAPES[k], lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in _WEIGHT_ORDER
        ],
        out_shape=[jax.ShapeDtypeStruct(_SHAPES[k], jnp.float32) for k in _WEIGHT_ORDER],
    )(xv, g_flat, *enc_args, *weights)
    return dict(zip(_WEIGHT_ORDER, grads))


def unpack_vanilla_mlp_grads(d: Dict[str, jnp.ndarray], pos_dim: int = 63,
                             view_dim: int = 27) -> Dict:
    """Packed-layout gradients -> flax NeRFMLP params-tree layout.

    Inverse of pack_vanilla_mlp_params' pad/split (zero-padded K rows carry
    zero gradient, so slicing them off is exact)."""
    out = {
        "pts_0": {"kernel": d["w0"][:pos_dim], "bias": d["b0"][0]},
        "bottleneck": {"kernel": d["wb"], "bias": d["bb"][0]},
        "density": {"kernel": d["wd"], "bias": d["bd"][0]},
        "views_0": {
            "kernel": jnp.concatenate([d["wva"], d["wvb"][:view_dim]], axis=0),
            "bias": d["bv"][0],
        },
        "rgb": {"kernel": d["wrgb"], "bias": d["brgb"][0]},
    }
    for i in range(1, 8):
        if i == 5:
            k = jnp.concatenate([d["w5a"], d["w5b"][:pos_dim]], axis=0)
        else:
            k = d[f"w{i}"]
        out[f"pts_{i}"] = {"kernel": k, "bias": d[f"b{i}"][0]}
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_mlp_train_xyz(mlp_params, enc_consts, samples, viewdirs, tile=TRAIN_TILE):
    """v2 differentiable fused MLP: takes the FLAX NeRFMLP params subtree
    directly (packing happens inside both fwd and bwd, and gradients are
    unpacked back to the flax layout manually — keeping pad/slice transposes
    out of the autodiff graph, which trips a jaxpr-cache KeyError when the
    pack is traced under scan on TPU).

    Raw (B, S, 3) sample coords + per-ray (B, 3) viewdirs; encodings
    computed in-kernel.  Returns (raw_rgb (B, S, 3), raw_sigma (B, S, 1))."""
    packed = pack_vanilla_mlp_params_f32(mlp_params)
    out = _fwd_call_xyz(packed, enc_consts, samples, viewdirs, tile)
    return out[..., :3], out[..., 3:]


def _train_fwd_xyz(mlp_params, enc_consts, samples, viewdirs, tile):
    packed = pack_vanilla_mlp_params_f32(mlp_params)
    out = _fwd_call_xyz(packed, enc_consts, samples, viewdirs, tile)
    return (out[..., :3], out[..., 3:]), (packed, enc_consts, samples, viewdirs)


def _train_bwd_xyz(tile, res, cotangents):
    packed, enc_consts, samples, viewdirs = res
    g_rgb, g_sigma = cotangents
    g = jnp.concatenate([g_rgb, g_sigma], axis=-1).astype(jnp.float32)
    d_packed = _bwd_call_xyz(packed, enc_consts, samples, viewdirs, g, tile)
    return (
        unpack_vanilla_mlp_grads(d_packed),
        jax.tree.map(jnp.zeros_like, enc_consts),
        jnp.zeros_like(samples),
        jnp.zeros_like(viewdirs),
    )


fused_mlp_train_xyz.defvjp(_train_fwd_xyz, _train_bwd_xyz)


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_nerf_mlp_xyz_eval(packed, enc_consts, samples, viewdirs, tile=1024):
    """Eval-only flat v2 entry (no grads): raw coords + per-ray viewdirs,
    encodings in-kernel.  ``packed`` may be bf16 (pack_vanilla_mlp_params).
    The per-ray variant's big ray-tiles overflow Mosaic's scoped-vmem stack
    estimate at S~200; flat 1024-row tiles are comfortably inside."""
    packed = {k: (v.reshape(1, -1) if v.ndim == 1 else v) for k, v in packed.items()}
    out = _fwd_call_xyz(packed, enc_consts, samples, viewdirs, tile)
    return out[..., :3], out[..., 3:]

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
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aon_tpu.ops.fused_mlp import (
    POS_PAD,
    VIEW_PAD,
    _WEIGHT_ORDER,
    _interpret,
    _kernel,
)

# 512 rows: the bwd kernel holds fp32 weights + fp32 grad accumulators
# (~4.8 MB) plus ~12 live activation tiles; 1024-row tiles overflow the
# 16 MB VMEM budget by ~0.4 MB.
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

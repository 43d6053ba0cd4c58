"""Fused Pallas kernels for the ARTICULATED NeRF MLP (deformation variant).

Key reduction: the latent codes (shape 128 / articulation 32 / appearance
128) are constant across a training batch (one instance+articulation per
step, reference model_autodecoder.py:186-194), so every place a latent
enters a concat-then-linear it folds into an EFFECTIVE BIAS:

    [x, s, a] @ W + b  ==  x @ W_x  +  (b + s @ W_s + a @ W_a)

The folding happens in XLA (three tiny matvecs per layer), the kernel sees
a vanilla-shaped MLP plus a 4x128 deformation prefix whose output offsets
the coordinates BEFORE the in-kernel positional encoding
(model_autodecoder.py:200-213, enc_after=True).  Latent gradients fall out
of the effective-bias gradients:  d s = W_s @ d b_eff  (summed over the
three fold sites), computed in the custom_vjp wrapper.

Unlike the vanilla kernels, the backward here DOES need d(enc): the trunk
input depends on the deformation output, so the bwd kernel backprops
d_enc -> d_x' (positional-encoding VJP, cos computed in-kernel) -> the
deformation MLP.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aon_tpu.ops.fused_mlp import POS_PAD, VIEW_PAD, _encode_in_kernel, _interpret

# flax ArticulatedNeRFMLP dims (models/articulated.py; reference
# model_autodecoder.py:60-169)
SHAPE_DIM = 128
ART_DIM = 32
APP_DIM = 128
DEF_WIDTH = 128
POS_DIM = 63

_EFF_ORDER = (
    # deformation prefix
    "wd0x", "bd0", "wd1", "bd1", "wd2", "bd2", "wd3", "bd3", "wdo", "bdo",
    # trunk (vanilla-shaped after folding)
    "w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
    "w5a", "w5b", "b5", "w6", "b6", "w7", "b7",
    "wb", "bb", "wdn", "bdn", "wva", "wvb", "bv", "wrgb", "brgb",
)

_EFF_SHAPES = {
    "wd0x": (4, DEF_WIDTH), "bd0": (1, DEF_WIDTH),
    "wd1": (DEF_WIDTH, DEF_WIDTH), "bd1": (1, DEF_WIDTH),
    "wd2": (DEF_WIDTH, DEF_WIDTH), "bd2": (1, DEF_WIDTH),
    "wd3": (DEF_WIDTH, DEF_WIDTH), "bd3": (1, DEF_WIDTH),
    "wdo": (DEF_WIDTH, 4), "bdo": (1, 4),
    "w0": (POS_PAD, 256), "b0": (1, 256),
    "w1": (256, 256), "b1": (1, 256),
    "w2": (256, 256), "b2": (1, 256),
    "w3": (256, 256), "b3": (1, 256),
    "w4": (256, 256), "b4": (1, 256),
    "w5a": (256, 256), "w5b": (POS_PAD, 256), "b5": (1, 256),
    "w6": (256, 256), "b6": (1, 256),
    "w7": (256, 256), "b7": (1, 256),
    "wb": (256, 256), "bb": (1, 256),
    "wdn": (256, 1), "bdn": (1, 1),
    "wva": (256, 128), "wvb": (VIEW_PAD, 128), "bv": (1, 128),
    "wrgb": (128, 3), "brgb": (1, 3),
}

_ENC_ORDER = ("s_pos", "p_pos", "s_view", "p_view")


def fold_latents(params: Dict, latents: Dict) -> Dict[str, jnp.ndarray]:
    """flax ArticulatedNeRFMLP params + latent codes -> effective packed
    weights (fp32; biases as (1, C)).  Differentiable, but the train path
    computes its own transpose (see _train_bwd)."""
    s = latents["density"].reshape(-1)
    app = latents["color"].reshape(-1)
    art_key = "articulation_deg" if "articulation_deg" in latents else "articulation"
    art = latents[art_key].reshape(-1)

    def pad_k(w, k_pad):
        return jnp.pad(w, ((0, k_pad - w.shape[0]), (0, 0)))

    e = {}
    wd0 = params["deform_0"]["kernel"]  # (3 + 128 + 32, 128)
    e["wd0x"] = pad_k(wd0[:3], 4)
    e["bd0"] = (params["deform_0"]["bias"] + s @ wd0[3 : 3 + SHAPE_DIM]
                + art @ wd0[3 + SHAPE_DIM :]).reshape(1, -1)
    for i in (1, 2, 3):
        e[f"wd{i}"] = params[f"deform_{i}"]["kernel"]
        e[f"bd{i}"] = params[f"deform_{i}"]["bias"].reshape(1, -1)
    e["wdo"] = jnp.pad(params["deform_out"]["kernel"], ((0, 0), (0, 1)))  # (128, 4)
    e["bdo"] = jnp.pad(params["deform_out"]["bias"], (0, 1)).reshape(1, -1)

    w0 = params["pts_0"]["kernel"]  # (63 + 128, 256)
    e["w0"] = pad_k(w0[:POS_DIM], POS_PAD)
    e["b0"] = (params["pts_0"]["bias"] + s @ w0[POS_DIM:]).reshape(1, -1)
    for i in range(1, 8):
        w = params[f"pts_{i}"]["kernel"]
        if i == 5:  # (256 + 63 + 128, 256)
            e["w5a"] = w[:256]
            e["w5b"] = pad_k(w[256 : 256 + POS_DIM], POS_PAD)
            e["b5"] = (params["pts_5"]["bias"] + s @ w[256 + POS_DIM :]).reshape(1, -1)
        else:
            e[f"w{i}"] = w
            e[f"b{i}"] = params[f"pts_{i}"]["bias"].reshape(1, -1)
    e["wb"] = params["bottleneck"]["kernel"]
    e["bb"] = params["bottleneck"]["bias"].reshape(1, -1)
    e["wdn"] = params["density"]["kernel"]
    e["bdn"] = params["density"]["bias"].reshape(1, -1)
    wv = params["views_0"]["kernel"]  # (256 + 27 + 128, 128)
    e["wva"] = wv[:256]
    e["wvb"] = pad_k(wv[256 : 256 + 27], VIEW_PAD)
    e["bv"] = (params["views_0"]["bias"] + app @ wv[256 + 27 :]).reshape(1, -1)
    # views_1..3 are plain 128x128 layers; keep them in the view stack
    for i in (1, 2, 3):
        e[f"wv{i}"] = params[f"views_{i}"]["kernel"]
        e[f"bv{i}"] = params[f"views_{i}"]["bias"].reshape(1, -1)
    e["wrgb"] = params["rgb"]["kernel"]
    e["brgb"] = params["rgb"]["bias"].reshape(1, -1)
    return {k: v.astype(jnp.float32) for k, v in e.items()}


# extend order/shapes with the extra view layers (netdepth_condition=4)
_EFF_ORDER = _EFF_ORDER[:-2] + (
    "wv1", "bv1", "wv2", "bv2", "wv3", "bv3", "wrgb", "brgb",
)
for _i in (1, 2, 3):
    _EFF_SHAPES[f"wv{_i}"] = (128, 128)
    _EFF_SHAPES[f"bv{_i}"] = (1, 128)


def _art_forward(xyz4, vdir4, e, enc_consts, dtype):
    """Shared forward: returns dict of activations needed by bwd."""
    bf = jnp.bfloat16

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acts = {}
    h = jnp.maximum(dot(xyz4, e["wd0x"][...]) + e["bd0"][...], 0.0).astype(bf)
    acts["hd0"] = h
    for i in (1, 2, 3):
        h = jnp.maximum(dot(h, e[f"wd{i}"][...]) + e[f"bd{i}"][...], 0.0).astype(bf)
        acts[f"hd{i}"] = h
    delta = dot(h, e["wdo"][...]) + e["bdo"][...]  # (T, 4), col 3 == bdo pad 0
    xp = xyz4.astype(jnp.float32) + delta
    acts["xp"] = xp

    enc = _encode_in_kernel(xp, enc_consts["s_pos"], enc_consts["p_pos"], bf)
    venc = _encode_in_kernel(vdir4, enc_consts["s_view"], enc_consts["p_view"], bf)
    acts["enc"] = enc
    acts["venc"] = venc

    a = jnp.maximum(dot(enc, e["w0"][...]) + e["b0"][...], 0.0).astype(bf)
    acts["a0"] = a
    for i in (1, 2, 3, 4):
        a = jnp.maximum(dot(a, e[f"w{i}"][...]) + e[f"b{i}"][...], 0.0).astype(bf)
        acts[f"a{i}"] = a
    a = jnp.maximum(
        dot(acts["a4"], e["w5a"][...]) + dot(enc, e["w5b"][...]) + e["b5"][...], 0.0
    ).astype(bf)
    acts["a5"] = a
    for i in (6, 7):
        a = jnp.maximum(dot(a, e[f"w{i}"][...]) + e[f"b{i}"][...], 0.0).astype(bf)
        acts[f"a{i}"] = a
    acts["sigma"] = dot(acts["a7"], e["wdn"][...]) + e["bdn"][...]
    acts["bottleneck"] = (dot(acts["a7"], e["wb"][...]) + e["bb"][...]).astype(bf)
    v = jnp.maximum(
        dot(acts["bottleneck"], e["wva"][...]) + dot(venc, e["wvb"][...]) + e["bv"][...],
        0.0,
    ).astype(bf)
    acts["v0"] = v
    for i in (1, 2, 3):
        v = jnp.maximum(dot(v, e[f"wv{i}"][...]) + e[f"bv{i}"][...], 0.0).astype(bf)
        acts[f"v{i}"] = v
    acts["rgb"] = dot(v, e["wrgb"][...]) + e["brgb"][...]
    return acts


def _art_fwd_kernel(xv_ref, *refs):
    """xv_ref: TRANSPOSED (8, T) [x,y,z,0,vx,vy,vz,0] stream; out (4, T).
    Wide-minor blocks avoid the 32x T(8,128) relayout scratch that narrow
    (T, 4) operands force on XLA (see fused_mlp_train._kernel_xyz_flat)."""
    enc_c = dict(zip(_ENC_ORDER, refs[: len(_ENC_ORDER)]))
    rest = refs[len(_ENC_ORDER) :]
    e = dict(zip(_EFF_ORDER, rest[:-1]))
    out_ref = rest[-1]
    xv = jnp.transpose(xv_ref[...])  # (T, 8)
    acts = _art_forward(xv[:, :4], xv[:, 4:], e, enc_c, jnp.bfloat16)
    out_ref[...] = jnp.transpose(
        jnp.concatenate([acts["rgb"], acts["sigma"]], axis=-1)
    )


def _posenc_vjp(d_enc, xp, s_pos, p_pos):
    """VJP of the in-kernel positional encoding at xp: returns d_xp (T, 4)."""
    s = s_pos[...].astype(jnp.float32)
    p = p_pos[...].astype(jnp.float32)
    pre = (
        xp[:, 0:1] * s[0:1, :] + xp[:, 1:2] * s[1:2, :] + xp[:, 2:3] * s[2:3, :] + p
    )
    two_pi = 2.0 * 3.14159265358979
    reduced = pre - two_pi * jnp.floor(pre / two_pi + 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    d_pre = jnp.where(col < 3, d_enc, d_enc * jnp.cos(reduced))  # (T, 64) f32
    # d_xp_c = sum_j s[c, j] * d_pre_j  ==  d_pre @ s^T  (row 3 of s is zero)
    return jax.lax.dot_general(
        d_pre.astype(jnp.bfloat16), s.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _art_bwd_kernel(xv_ref, g_ref, *refs):
    """Transposed (8, T) coord/viewdir and (4, T) cotangent streams."""
    enc_c = dict(zip(_ENC_ORDER, refs[: len(_ENC_ORDER)]))
    rest = refs[len(_ENC_ORDER) :]
    n_e = len(_EFF_ORDER)
    e = dict(zip(_EFF_ORDER, rest[:n_e]))
    ge = dict(zip(_EFF_ORDER, rest[n_e:]))
    bf = jnp.bfloat16

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for name in _EFF_ORDER:
            ge[name][...] = jnp.zeros_like(ge[name])

    xv = jnp.transpose(xv_ref[...])  # (T, 8)
    xyz4 = xv[:, :4]
    g = jnp.transpose(g_ref[...])  # (T, 4)
    g_rgb, g_sigma = g[:, :3], g[:, 3:4]

    acts = _art_forward(xyz4, xv[:, 4:], e, enc_c, bf)
    _art_bwd_from_acts(xyz4, g_rgb, g_sigma, acts, e, ge, enc_c)


def _art_bwd_from_acts(xyz4, g_rgb, g_sigma, acts, e, ge, enc_c):
    """Grad accumulation into ``ge`` refs given LIVE activations (shared by
    the v2 bwd kernel, which rematerializes them, and the v3 fused level
    kernel, which keeps them from its own forward)."""
    bf = jnp.bfloat16

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

    def acc(name, val):
        ge[name][...] += val

    def bias_grad(gr):
        return jnp.sum(gr, axis=0, keepdims=True)

    def relu_mask(a):
        return a.astype(jnp.float32) > 0

    # rgb head + 4-layer view branch
    acc("wrgb", dot_tn(acts["v3"], g_rgb))
    acc("brgb", bias_grad(g_rgb))
    dv = dot_nt(g_rgb, e["wrgb"][...]) * relu_mask(acts["v3"])
    for i_v in (3, 2, 1):
        acc(f"wv{i_v}", dot_tn(acts[f"v{i_v - 1}"], dv))
        acc(f"bv{i_v}", bias_grad(dv))
        dv = dot_nt(dv, e[f"wv{i_v}"][...]) * relu_mask(acts[f"v{i_v - 1}"])
    acc("wva", dot_tn(acts["bottleneck"], dv))
    acc("wvb", dot_tn(acts["venc"], dv))
    acc("bv", bias_grad(dv))
    dbott = dot_nt(dv, e["wva"][...])

    # bottleneck + density head
    acc("wb", dot_tn(acts["a7"], dbott))
    acc("bb", bias_grad(dbott))
    acc("wdn", dot_tn(acts["a7"], g_sigma))
    acc("bdn", bias_grad(g_sigma))
    da = (dot_nt(dbott, e["wb"][...]) + dot_nt(g_sigma, e["wdn"][...])) * relu_mask(acts["a7"])

    # trunk back, collecting d_enc
    acc("w7", dot_tn(acts["a6"], da))
    acc("b7", bias_grad(da))
    da = dot_nt(da, e["w7"][...]) * relu_mask(acts["a6"])
    acc("w6", dot_tn(acts["a5"], da))
    acc("b6", bias_grad(da))
    da = dot_nt(da, e["w6"][...]) * relu_mask(acts["a5"])

    acc("w5a", dot_tn(acts["a4"], da))
    acc("w5b", dot_tn(acts["enc"], da))
    acc("b5", bias_grad(da))
    d_enc = dot_nt(da, e["w5b"][...])  # skip-path contribution
    da = dot_nt(da, e["w5a"][...]) * relu_mask(acts["a4"])

    for idx in (4, 3, 2, 1):
        acc(f"w{idx}", dot_tn(acts[f"a{idx - 1}"], da))
        acc(f"b{idx}", bias_grad(da))
        da = dot_nt(da, e[f"w{idx}"][...]) * relu_mask(acts[f"a{idx - 1}"])
    acc("w0", dot_tn(acts["enc"], da))
    acc("b0", bias_grad(da))
    d_enc = d_enc + dot_nt(da, e["w0"][...])  # (T, 64)

    # through the positional encoding into the deformation output
    d_xp = _posenc_vjp(d_enc, acts["xp"], enc_c["s_pos"], enc_c["p_pos"])  # (T, 4)

    # deformation backward (d_xyz itself is not needed)
    acc("wdo", dot_tn(acts["hd3"], d_xp))
    acc("bdo", bias_grad(d_xp))
    dh = dot_nt(d_xp, e["wdo"][...]) * relu_mask(acts["hd3"])
    for i_d in (3, 2, 1):
        acc(f"wd{i_d}", dot_tn(acts[f"hd{i_d - 1}"], dh))
        acc(f"bd{i_d}", bias_grad(dh))
        dh = dot_nt(dh, e[f"wd{i_d}"][...]) * relu_mask(acts[f"hd{i_d - 1}"])
    acc("wd0x", dot_tn(xyz4, dh))
    acc("bd0", bias_grad(dh))


def _art_call(kernel, packed, enc_consts, samples, vdirs_per_ray, tile, out_kind, g=None):
    B, S, _ = samples.shape
    n = B * S
    n_pad = (n + tile - 1) // tile * tile
    xyz4 = jnp.pad(samples.reshape(n, 3), ((0, n_pad - n), (0, 1)))
    vdir = jnp.broadcast_to(vdirs_per_ray[:, None, :], (B, S, 3)).reshape(n, 3)
    vdir4 = jnp.pad(vdir, ((0, n_pad - n), (0, 1)))
    enc_args = [enc_consts[k] for k in _ENC_ORDER]
    weights = [packed[k] for k in _EFF_ORDER]
    # transposed wide-minor streams (see _art_fwd_kernel docstring)
    data_in = [jnp.concatenate([xyz4, vdir4], axis=1).T]
    data_specs = [
        pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    if g is not None:
        data_in.append(jnp.pad(g.reshape(n, 4), ((0, n_pad - n), (0, 0))).T)
        data_specs.append(
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
    if out_kind == "fwd":
        out_specs = pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((4, n_pad), jnp.float32)
    else:
        out_specs = [
            pl.BlockSpec(_EFF_SHAPES[k], lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in _EFF_ORDER
        ]
        out_shape = [
            jax.ShapeDtypeStruct(_EFF_SHAPES[k], jnp.float32) for k in _EFF_ORDER
        ]
    out = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(n_pad // tile,),
        in_specs=[
            *data_specs,
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in enc_args],
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(*data_in, *enc_args, *weights)
    if out_kind == "fwd":
        return out.T[:n].reshape(B, S, 4)
    return dict(zip(_EFF_ORDER, out))


def _unfold_grads(d_eff: Dict, params: Dict, latents: Dict):
    """Effective-weight gradients -> (flax params grads, latent grads)."""
    s = latents["density"].reshape(-1)
    app = latents["color"].reshape(-1)
    art_key = "articulation_deg" if "articulation_deg" in latents else "articulation"
    art = latents[art_key].reshape(-1)

    dp = {}
    wd0 = params["deform_0"]["kernel"]
    dbd0 = d_eff["bd0"][0]
    dp["deform_0"] = {
        "kernel": jnp.concatenate(
            [d_eff["wd0x"][:3], jnp.outer(s, dbd0), jnp.outer(art, dbd0)], axis=0
        ),
        "bias": dbd0,
    }
    for i in (1, 2, 3):
        dp[f"deform_{i}"] = {"kernel": d_eff[f"wd{i}"], "bias": d_eff[f"bd{i}"][0]}
    dp["deform_out"] = {"kernel": d_eff["wdo"][:, :3], "bias": d_eff["bdo"][0, :3]}

    db0 = d_eff["b0"][0]
    dp["pts_0"] = {
        "kernel": jnp.concatenate([d_eff["w0"][:POS_DIM], jnp.outer(s, db0)], axis=0),
        "bias": db0,
    }
    db5 = d_eff["b5"][0]
    for i in range(1, 8):
        if i == 5:
            dp["pts_5"] = {
                "kernel": jnp.concatenate(
                    [d_eff["w5a"], d_eff["w5b"][:POS_DIM], jnp.outer(s, db5)], axis=0
                ),
                "bias": db5,
            }
        else:
            dp[f"pts_{i}"] = {"kernel": d_eff[f"w{i}"], "bias": d_eff[f"b{i}"][0]}
    dp["bottleneck"] = {"kernel": d_eff["wb"], "bias": d_eff["bb"][0]}
    dp["density"] = {"kernel": d_eff["wdn"], "bias": d_eff["bdn"][0]}
    dbv = d_eff["bv"][0]
    dp["views_0"] = {
        "kernel": jnp.concatenate(
            [d_eff["wva"], d_eff["wvb"][:27], jnp.outer(app, dbv)], axis=0
        ),
        "bias": dbv,
    }
    for i in (1, 2, 3):
        dp[f"views_{i}"] = {"kernel": d_eff[f"wv{i}"], "bias": d_eff[f"bv{i}"][0]}
    dp["rgb"] = {"kernel": d_eff["wrgb"], "bias": d_eff["brgb"][0]}

    wv = params["views_0"]["kernel"]
    w0 = params["pts_0"]["kernel"]
    w5 = params["pts_5"]["kernel"]
    d_lat = {
        "density": (
            wd0[3 : 3 + SHAPE_DIM] @ dbd0 + w0[POS_DIM:] @ db0 + w5[256 + POS_DIM :] @ db5
        ).reshape(latents["density"].shape),
        "color": (wv[256 + 27 :] @ dbv).reshape(latents["color"].shape),
        art_key: (wd0[3 + SHAPE_DIM :] @ dbd0).reshape(latents[art_key].shape),
    }
    # zero grads for latent keys not consumed by this variant
    for k in latents:
        if k not in d_lat:
            d_lat[k] = jnp.zeros_like(latents[k])
    return dp, d_lat


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_art_mlp_train(mlp_params, latents, samples, viewdirs, tile=512):
    """Differentiable fused articulated MLP.

    mlp_params: flax ArticulatedNeRFMLP params subtree; latents: dict with
    density/color/articulation (or articulation_deg) codes, (1, C) or (C,).
    samples (B, S, 3) raw coords; viewdirs (B, 3).  Returns
    (raw_rgb (B, S, 3), raw_sigma (B, S, 1)); grads flow to mlp_params and
    latents.
    """
    from aon_tpu.ops.fused_mlp import make_posenc_constants

    enc_consts = make_posenc_constants()
    packed = fold_latents(mlp_params, latents)
    out = _art_call(_art_fwd_kernel, packed, enc_consts, samples, viewdirs, tile, "fwd")
    return out[..., :3], out[..., 3:]


def _train_fwd(mlp_params, latents, samples, viewdirs, tile):
    from aon_tpu.ops.fused_mlp import make_posenc_constants

    enc_consts = make_posenc_constants()
    packed = fold_latents(mlp_params, latents)
    out = _art_call(_art_fwd_kernel, packed, enc_consts, samples, viewdirs, tile, "fwd")
    return (out[..., :3], out[..., 3:]), (mlp_params, latents, packed, samples, viewdirs)


def _train_bwd(tile, res, cotangents):
    from aon_tpu.ops.fused_mlp import make_posenc_constants

    mlp_params, latents, packed, samples, viewdirs = res
    g_rgb, g_sigma = cotangents
    g = jnp.concatenate([g_rgb, g_sigma], axis=-1).astype(jnp.float32)
    enc_consts = make_posenc_constants()
    d_eff = _art_call(
        _art_bwd_kernel, packed, enc_consts, samples, viewdirs, tile, "bwd", g=g
    )
    dp, d_lat = _unfold_grads(d_eff, mlp_params, latents)
    return dp, d_lat, jnp.zeros_like(samples), jnp.zeros_like(viewdirs)


fused_art_mlp_train.defvjp(_train_fwd, _train_bwd)


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_art_mlp_eval(mlp_params, latents, samples, viewdirs, tile=1024):
    """Eval-only fused articulated MLP (no grads, larger tiles)."""
    from aon_tpu.ops.fused_mlp import make_posenc_constants

    enc_consts = make_posenc_constants()
    packed = fold_latents(mlp_params, latents)
    out = _art_call(_art_fwd_kernel, packed, enc_consts, samples, viewdirs, tile, "fwd")
    return out[..., :3], out[..., 3:]

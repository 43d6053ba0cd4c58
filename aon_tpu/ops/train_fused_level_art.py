"""One-kernel-per-level ARTICULATED NeRF training (v3 train path).

The articulated analogue of ops/train_fused_level.py: each training level
is a single Pallas kernel over ray-major tiles that runs the deformation
prefix + trunk + view-branch forward (ops/fused_art._art_forward, latents
pre-folded into effective biases), the auto-decoder head activations
(reference model_autodecoder.py:265-267,321-323: padded sigmoid rgb,
softplus(raw + density_bias) sigma), the volume compositing + loss, the
compositing VJP, and the full MLP backward from LIVE activations — 3x
forward-FLOPs per level instead of the v2 custom_vjp path's 4x (separate
fwd kernel + in-kernel remat) and no XLA compositing stage.

The in-kernel loss is generalized to cover BOTH articulated systems:

* per-ray loss weight ``lw`` rides the sample stream; the photometric term
  is sum_r lw_r * |comp_r - target_r|^2.  The auto-decoder's plain MSE
  (model_autodecoder.py:450-455) is lw = 1/(B*3); the auto-encoder's
  instance-masked MSE (model_ae_art.py:380-387) is lw = mask_r / denom.
* optional opacity BCE-with-logits on acc vs mask (model_ae_art.py:646-663,
  the AE's 0.5 * BCE(acc, mask) per level): d_acc = bce_w * (sigmoid(acc)
  - m) / B feeds the compositing backward in-kernel; the BCE *value* is
  computed outside from the per-ray acc output.

Latent gradients fall out of the effective-bias gradients exactly as in
the v2 path (ops/fused_art._unfold_grads).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aon_tpu.core.rays import effective_intervals
from aon_tpu.ops.fused_mlp import _interpret
from aon_tpu.ops.fused_art import (
    _EFF_ORDER,
    _EFF_SHAPES,
    _ENC_ORDER,
    _art_bwd_from_acts,
    _art_forward,
    _unfold_grads,
    fold_latents,
)
from aon_tpu.ops.train_fused_level import (
    _choose_tile,
    _round_up,
    _seg_scan_excl_prod,
    _seg_scan_excl_suffix_sum,
    _vmem_params,
)

_HI = jax.lax.Precision.HIGHEST


def _art_level_kernel(
    n_rays_total,
    rays_per_tile,
    s_pad,
    s_real,
    white_bkgd,
    rgb_padding,
    density_bias,
    bce_weight,
    sigma_act,
    xv_ref,
    *refs,
):
    """refs = [enc consts] + [eff weights] + [eff grad accums, per_sample_out].

    xv stream rows (16, rows): x,y,z,t | vx,vy,vz,0 | tr,tg,tb,lw | m,0,0,0
    where lw is the per-ray photometric loss weight and m the opacity-BCE
    target mask (both broadcast onto sample rows by the caller)."""
    n_enc = len(_ENC_ORDER)
    n_w = len(_EFF_ORDER)
    enc_c = dict(zip(_ENC_ORDER, refs[:n_enc]))
    e = dict(zip(_EFF_ORDER, refs[n_enc : n_enc + n_w]))
    ge = dict(zip(_EFF_ORDER, refs[n_enc + n_w : n_enc + 2 * n_w]))
    ps_out = refs[n_enc + 2 * n_w]  # (8, rows): [w, err2@seg0, acc@seg0, ...]
    bf = jnp.bfloat16

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for name in _EFF_ORDER:
            ge[name][...] = jnp.zeros_like(ge[name])

    xv = jnp.transpose(xv_ref[...])  # (rows, 16)
    rows = xv.shape[0]
    R = rays_per_tile

    seg_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % s_pad
    real = seg_idx < s_real
    last = seg_idx == s_real - 1

    # ---- forward (deformation + trunk + view branch; live activations) ----
    xyz4 = jnp.concatenate([xv[:, :3], jnp.zeros_like(xv[:, :1])], axis=1)
    acts = _art_forward(xyz4, xv[:, 4:8], e, enc_c, bf)
    raw_rgb = acts["rgb"]  # (rows, 3) f32
    raw_sigma = acts["sigma"]  # (rows, 1) f32

    # ---- head activations ----
    # auto-decoder: padded sigmoid + softplus(raw + bias)
    # (model_autodecoder.py:265-267,321-323); AE: plain sigmoid + relu
    # (model_ae_art.py:232-233,289-292)
    sig = jax.nn.sigmoid(raw_rgb)
    rgb = sig * (1.0 + 2.0 * rgb_padding) - rgb_padding
    if sigma_act == "softplus_bias":
        sp_in = raw_sigma + density_bias
        sigma = jax.nn.softplus(sp_in)
    else:  # relu
        sigma = jnp.maximum(raw_sigma, 0.0)

    # ---- compositing forward (identical to train_fused_level) ----
    t = xv[:, 3:4]
    t_next = pltpu.roll(t, rows - 1, 0)
    dist = jnp.where(last, 1e10, t_next - t)
    dist = jnp.where(real, dist, 0.0)
    alpha = jnp.where(real, 1.0 - jnp.exp(-sigma * dist), 0.0)
    # max() blocks XLA's (1 + eps) -> 1 fold (see train_fused_level.py)
    u = jnp.maximum(1.0 - alpha, 0.0) + 1e-10
    T = _seg_scan_excl_prod(u, seg_idx, s_pad)
    wgt = alpha * T

    row_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 0) // s_pad
    col_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 1)
    sel = (row_ray == col_ray).astype(jnp.float32)

    def seg_sum(x):
        return jax.lax.dot_general(
            sel, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_HI,
        )

    def bcast(x):
        return jax.lax.dot_general(
            sel, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_HI,
        )

    comp = seg_sum(wgt * rgb)  # (R, 3)
    acc_ray = seg_sum(wgt)  # (R, 1)
    if white_bkgd:
        comp = comp + (1.0 - acc_ray)

    tgt_rows = xv[:, 8:11]
    lw_rows = xv[:, 11:12]  # per-ray loss weight (0 on batch padding)
    row_global = pl.program_id(0) * rows + jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0
    )
    ray_valid_rows = (row_global // s_pad < n_rays_total).astype(jnp.float32)
    lw_rows = lw_rows * ray_valid_rows
    err_rows = bcast(comp) - tgt_rows  # (rows, 3)

    # ---- compositing backward ----
    # photometric: L_photo = sum_r lw_r |err_r|^2  ->  dL/dcomp = 2 lw err
    dcomp_rows = 2.0 * lw_rows * err_rows
    d_rgb = wgt * dcomp_rows
    # Per-sample-VARYING G (photometric, and the white term whose constant
    # part is dominated by it) through the suffix scan; the opacity BCE's
    # d_acc — a loss DOMINATED by a per-ray-constant dL/dw — through the
    # telescoped closed form  d_acc * T_total / u: the scan formulation
    # cancels two O(1) terms to the tiny residual Gc*T_total/u and the
    # lost digits matter exactly when acc saturates (T_total -> 0), the
    # regime the BCE must escape.
    G = jnp.sum(dcomp_rows * rgb, axis=1, keepdims=True)
    if white_bkgd:
        G = G - jnp.sum(dcomp_rows, axis=1, keepdims=True)
    P = _seg_scan_excl_suffix_sum(wgt * G, seg_idx, s_pad)
    d_alpha = T * G - P / u
    if bce_weight != 0.0:
        # opacity BCE-with-logits(acc, mask), mean over rays, weight bce_w:
        # d/dacc = bce_w * (sigmoid(acc) - m) / B; acc = sum_s w_s.
        m_rows = xv[:, 12:13]
        acc_rows = bcast(acc_ray)
        d_acc = (
            (jax.nn.sigmoid(acc_rows) - m_rows)
            * (bce_weight / n_rays_total)
            * ray_valid_rows
        )
        T_total = bcast(seg_sum(jnp.where(last, T * u, 0.0)))
        d_alpha = d_alpha + d_acc * T_total / u
    d_sigma = jnp.where(real, d_alpha * dist * (1.0 - alpha), 0.0)

    # head VJPs
    g_rgb = (d_rgb * (1.0 + 2.0 * rgb_padding) * sig * (1.0 - sig)).astype(
        jnp.float32
    )
    if sigma_act == "softplus_bias":
        g_sigma = d_sigma * jax.nn.sigmoid(sp_in)
    else:
        g_sigma = jnp.where(raw_sigma > 0, d_sigma, 0.0)

    # ---- MLP backward from LIVE activations ----
    _art_bwd_from_acts(xyz4, g_rgb, g_sigma, acts, e, ge, enc_c)

    # ---- auxiliary outputs ----
    err2_rows = jnp.sum(err_rows * err_rows, axis=1, keepdims=True) * lw_rows
    seg0 = seg_idx == 0
    ps_out[...] = jnp.transpose(
        jnp.concatenate(
            [
                wgt,
                jnp.where(seg0, err2_rows, 0.0),
                jnp.where(seg0, bcast(acc_ray) * ray_valid_rows, 0.0),
                jnp.zeros((rows, 5), jnp.float32),
            ],
            axis=1,
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "white_bkgd", "rgb_padding", "density_bias", "bce_weight", "sigma_act",
        "max_tile_rows",
    ),
)
def fused_level_train_art_grads(
    packed: Dict[str, jnp.ndarray],
    enc_consts: Dict[str, jnp.ndarray],
    t_vals: jnp.ndarray,  # (B, S) sorted sample positions
    rays_o: jnp.ndarray,  # (B, 3)
    rays_d: jnp.ndarray,  # (B, 3) unit-norm (SAPIEN contract)
    viewdirs: jnp.ndarray,  # (B, 3)
    target: jnp.ndarray,  # (B, 3)
    loss_w: jnp.ndarray,  # (B,) per-ray photometric loss weight
    mask: jnp.ndarray,  # (B,) opacity-BCE target (ignored if bce_weight == 0)
    white_bkgd: bool,
    rgb_padding: float = 0.001,
    density_bias: float = -1.0,
    bce_weight: float = 0.0,
    sigma_act: str = "softplus_bias",
    max_tile_rows: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One articulated training level, fully fused.

    Returns ``(photo_loss, weights (B, S), acc (B,), eff grads)`` where
    ``photo_loss = sum_r loss_w_r * |comp_r - target_r|^2`` and the grads are
    d(photo_loss [+ bce_weight * mean BCE(acc, mask)])/d(packed effective
    weights) — unfold with ops.fused_art._unfold_grads.
    """
    B, S = t_vals.shape
    s_pad, R = _choose_tile(S, max_tile_rows)
    b_pad = _round_up(B, R)
    rows = b_pad * s_pad

    t_p = jnp.pad(t_vals, ((0, b_pad - B), (0, s_pad - S)), mode="edge")
    o_p = jnp.pad(rays_o, ((0, b_pad - B), (0, 0)))
    d_p = jnp.pad(rays_d, ((0, b_pad - B), (0, 0)), constant_values=1.0)
    v_p = jnp.pad(viewdirs, ((0, b_pad - B), (0, 0)), constant_values=1.0)
    tgt_p = jnp.pad(target, ((0, b_pad - B), (0, 0)))
    lw_p = jnp.pad(loss_w.reshape(B, 1), ((0, b_pad - B), (0, 0)))
    m_p = jnp.pad(mask.reshape(B, 1), ((0, b_pad - B), (0, 0)))

    coords = o_p[:, None, :] + t_p[..., None] * d_p[:, None, :]
    per_ray = jnp.concatenate([v_p, jnp.zeros((b_pad, 1)), tgt_p, lw_p, m_p], axis=1)
    xv = jnp.concatenate(
        [
            coords,
            t_p[..., None],
            jnp.broadcast_to(per_ray[:, None, :], (b_pad, s_pad, 9)),
            jnp.zeros((b_pad, s_pad, 3), t_vals.dtype),
        ],
        axis=-1,
    ).reshape(rows, 16).T  # (16, rows)

    enc_args = [enc_consts[k] for k in _ENC_ORDER]
    weights = [packed[k] for k in _EFF_ORDER]
    tile_rows = R * s_pad
    grid = (b_pad // R,)

    kernel = functools.partial(
        _art_level_kernel, B, R, s_pad, S, bool(white_bkgd),
        float(rgb_padding), float(density_bias), float(bce_weight), sigma_act,
    )
    interpret = _interpret()
    compiler_params = None
    if not interpret:
        # live articulated activations + f32 eff weights + grad accumulators
        # exceed the conservative 16M default scoped-vmem budget; scale with
        # the tile, capacity-checked per generation (train_fused_level)
        compiler_params = _vmem_params(48 if tile_rows <= 1024 else 80)
    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=compiler_params,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in enc_args],
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        ],
        out_specs=[
            *[
                pl.BlockSpec(_EFF_SHAPES[k], lambda i: (0, 0), memory_space=pltpu.VMEM)
                for k in _EFF_ORDER
            ],
            pl.BlockSpec((8, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(_EFF_SHAPES[k], jnp.float32) for k in _EFF_ORDER],
            jax.ShapeDtypeStruct((8, rows), jnp.float32),
        ],
    )(xv, *enc_args, *weights)

    grads = dict(zip(_EFF_ORDER, outs[: len(_EFF_ORDER)]))
    per_sample = outs[len(_EFF_ORDER)]  # (8, rows)

    wgt = per_sample[0].reshape(b_pad, s_pad)[:B, :S]
    photo_loss = jnp.sum(per_sample[1])
    acc = per_sample[2].reshape(b_pad, s_pad)[:B, 0]
    return photo_loss, wgt, acc, grads


def _latent_reg(latents: Dict) -> jnp.ndarray:
    """Latent-norm regularization (model_autodecoder.py:456-466)."""
    return 1e-4 * (
        jnp.mean(jnp.linalg.norm(latents["density"], axis=0))
        + jnp.mean(jnp.linalg.norm(latents["color"], axis=0))
        + jnp.mean(jnp.linalg.norm(latents["articulation"], axis=0))
    )


def make_fused_autodecoder_step_fn(
    lib_apply: Callable,
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    rgb_padding: float = 0.001,
    density_bias: float = -1.0,
    lindisp: bool = False,
):
    """v3 auto-decoder step: ``fn(params, batch, key) -> (loss, aux, grads)``
    with grads computed in-kernel (loss_fn.returns_grads protocol).

    params = {"model": {coarse_mlp, fine_mlp}, "code_library": ...}; latent
    and code-table gradients flow through fold_latents / lib_apply vjps.
    """
    from aon_tpu.core import sampling
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.resample_pallas import sample_pdf_fused

    enc_consts = make_posenc_constants()

    def step_fn(params, batch, key):
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        viewdirs, target = batch["viewdirs"], batch["target"]
        ray_ids = batch.get("ray_ids")
        B = rays_o.shape[0]
        k0, k2 = jax.random.split(key)

        def lat_fn(cl):
            lat = lib_apply(
                {"params": cl}, batch["instance_id"], batch["articulation_id"]
            )
            return lat, _latent_reg(lat)

        (latents, reg), lat_vjp = jax.vjp(lat_fn, params["code_library"])

        # optional per-ray importance weights (object-pixel oversampling,
        # data/sapien_multi._draw_pixels) — mean-1 by construction, so the
        # default uniform case is lw = 1/(B*3) exactly
        w = batch.get("loss_w")
        lw = (
            jnp.full((B,), 1.0 / (B * 3.0))
            if w is None
            else w.reshape(-1) / (B * 3.0)
        )
        m = jnp.zeros((B,))

        def level(mlp_params, t_vals):
            # fold_latents under vjp so d(packed) -> (d mlp, d latents);
            # _unfold_grads is the same transpose in closed form — reuse it
            # directly (cheaper than re-deriving through jax.vjp of the fold).
            packed = fold_latents(mlp_params, latents)
            photo, wgt, _, g_eff = fused_level_train_art_grads(
                packed, enc_consts, t_vals, rays_o, rays_d, viewdirs, target,
                lw, m, white_bkgd, rgb_padding=rgb_padding,
                density_bias=density_bias, bce_weight=0.0,
            )
            dp, d_lat = _unfold_grads(g_eff, mlp_params, latents)
            return photo, wgt, dp, d_lat

        t_near_eff, t_far_eff = effective_intervals(batch, near, far)
        t_vals, _ = sampling.sample_along_rays(
            k0, rays_o, rays_d, num_coarse,
            t_near_eff, t_far_eff,
            randomized=True, lindisp=lindisp, ray_ids=ray_ids,
        )
        loss0, wgt, dp_c, d_lat_c = level(params["model"]["coarse_mlp"], t_vals)

        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_union, _ = sample_pdf_fused(
            k2, t_mids, wgt[..., 1:-1], rays_o, rays_d, t_vals, num_fine,
            randomized=True, ray_ids=ray_ids,
        )
        loss1, _, dp_f, d_lat_f = level(params["model"]["fine_mlp"], t_union)

        d_lat = jax.tree.map(jnp.add, d_lat_c, d_lat_f)
        (d_cl,) = lat_vjp((d_lat, jnp.ones_like(reg)))

        loss = loss0 + loss1 + reg
        grads = {
            "model": {"coarse_mlp": dp_c, "fine_mlp": dp_f},
            "code_library": d_cl,
        }
        return loss, {"loss0": loss0, "loss1": loss1, "reg": reg}, grads

    step_fn.returns_grads = True
    return step_fn


def make_fused_ae_step_fn(
    encode_fn: Callable,
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    opacity_lambda: float = 0.5,
    lindisp: bool = False,
    bg_lambda: float = 0.0,
    sigma_act: str = "relu",
    density_bias: float = 0.0,
):
    """v3 auto-encoder step: ``fn(params, batch, key) -> (loss, aux, grads)``.

    ``encode_fn(enc_params, src, deg) -> (latents, pred_state)`` covers the
    ResNet encoder + joint-state decoder + deg embedding (the AE system's
    ``_encode``); its params subtrees ride through a jax.vjp so encoder
    gradients flow from the in-kernel latent cotangents.  Loss contract:
    model_ae_art.py:380-408 — instance-masked MSE + joint-state MSE +
    opacity BCE on both levels (relu sigma, un-padded sigmoid rgb).

    Microbatching is EXACT: the masked-MSE denominator is the whole-batch
    3*sum(mask) (reference model_ae_art.py:380-387), computed once over all
    k microbatches (and psum-med across chips under shard_map) by the
    ``prepare_shared`` hook and divided by k*n_chips so the accumulator's
    (1/k) mean and the cross-chip pmean recompose the reference's
    whole-batch masked mean bit-for-bit in exact arithmetic.  The BCE's
    1/B normalization needs no such correction — equal-size microbatches
    make the mean of per-microbatch BCE means equal the whole-batch mean.

    ``bg_lambda`` > 0 adds bg_lambda * (background-masked MSE) — mean over
    the (1-mask) pixels against the seg-masked GT background color — as an
    extra per-ray loss-weight component (the kernel's photometric path is
    already sum_r lw_r |err_r|^2, so no kernel change).  Default 0 keeps
    the exact reference objective (model_ae_art.py:380-387); the AABB/occ
    tightened production configs need it because the reference's
    BCE-on-acc-as-logits quirk alone cannot clear in-box free space (see
    Config.bg_loss_lambda).  Its denominator gets the same whole-batch
    pre-division, so microbatching stays exact.
    """
    from aon_tpu.core import sampling
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.resample_pallas import sample_pdf_fused

    enc_consts = make_posenc_constants()
    enc_keys = ("encoder", "joint_state", "deg_embedding")

    def _bce(logits, targets):
        return jnp.mean(
            jnp.maximum(logits, 0)
            - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    def step_fn(params, batch, key):
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        viewdirs, target = batch["viewdirs"], batch["target"]
        ray_ids = batch.get("ray_ids")
        B = rays_o.shape[0]
        k0, k2 = jax.random.split(key)

        src = batch["src_imgs"]
        if src.ndim == 3:
            src = src[None]

        def enc_fn(enc_params):
            latents, pred_state = encode_fn(enc_params, src, batch["deg"])
            loss_state = jnp.mean((pred_state - batch["deg"]) ** 2)
            return latents, loss_state

        enc_sub = {k: params[k] for k in enc_keys}
        (latents, loss_state), enc_vjp = jax.vjp(enc_fn, enc_sub)

        mask = batch["instance_mask"].reshape(-1).astype(jnp.float32)
        denom = batch.get("photo_denom")
        if denom is None:  # unaccumulated call: the batch IS the whole batch
            denom = jnp.maximum(3.0 * jnp.sum(mask), 1.0)
        lw = mask / denom
        if bg_lambda != 0.0:
            denom_bg = batch.get("photo_denom_bg")
            if denom_bg is None:
                denom_bg = jnp.maximum(3.0 * jnp.sum(1.0 - mask), 1.0)
            # bg_scale: linear warmup ramp injected by trainer.fit
            # (Config.bg_loss_warmup_steps) — full-strength bg MSE from step
            # 0 extinguishes all density before the object establishes, and
            # relu sigma never recovers
            bg_scale = batch.get("bg_scale", 1.0)
            lw = lw + (bg_lambda * bg_scale) * (1.0 - mask) / denom_bg

        def level(mlp_params, t_vals):
            packed = fold_latents(mlp_params, latents)
            photo, wgt, acc, g_eff = fused_level_train_art_grads(
                packed, enc_consts, t_vals, rays_o, rays_d, viewdirs, target,
                lw, mask, white_bkgd, rgb_padding=0.0,
                density_bias=float(density_bias),
                bce_weight=float(opacity_lambda), sigma_act=sigma_act,
            )
            dp, d_lat = _unfold_grads(g_eff, mlp_params, latents)
            return photo, wgt, acc, dp, d_lat

        t_near_eff, t_far_eff = effective_intervals(batch, near, far)
        t_vals, _ = sampling.sample_along_rays(
            k0, rays_o, rays_d, num_coarse,
            t_near_eff, t_far_eff,
            randomized=True, lindisp=lindisp, ray_ids=ray_ids,
        )
        loss0, wgt, acc0, dp_c, d_lat_c = level(params["model"]["coarse_mlp"], t_vals)

        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_union, _ = sample_pdf_fused(
            k2, t_mids, wgt[..., 1:-1], rays_o, rays_d, t_vals, num_fine,
            randomized=True, ray_ids=ray_ids,
        )
        loss1, _, acc1, dp_f, d_lat_f = level(params["model"]["fine_mlp"], t_union)

        d_lat = jax.tree.map(jnp.add, d_lat_c, d_lat_f)
        (d_enc_sub,) = enc_vjp((d_lat, jnp.ones_like(loss_state)))

        opacity = opacity_lambda * (_bce(acc0, mask) + _bce(acc1, mask))
        loss = loss0 + loss1 + loss_state + opacity
        grads = {"model": {"coarse_mlp": dp_c, "fine_mlp": dp_f}, **d_enc_sub}
        aux = {
            "loss0": loss0,
            "loss1": loss1,
            "loss_state": loss_state,
            "opacity_loss": opacity,
        }
        return loss, aux, grads

    def prepare_shared(batch, axis_name=None):
        """Whole-batch masked-MSE denominator, pre-divided by (k microbatches
        x n chips) so downstream mean-reductions recompose it exactly."""
        k = 1 if batch["rays_o"].ndim == 2 else batch["rays_o"].shape[0]
        m = batch["instance_mask"].astype(jnp.float32)
        s, s_bg = jnp.sum(m), jnp.sum(1.0 - m)
        n = 1
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            s_bg = jax.lax.psum(s_bg, axis_name)
            n = jax.lax.axis_size(axis_name)
        return {
            "photo_denom": jnp.maximum(3.0 * s, 1.0) / (k * n),
            "photo_denom_bg": jnp.maximum(3.0 * s_bg, 1.0) / (k * n),
        }

    step_fn.returns_grads = True
    step_fn.prepare_shared = prepare_shared
    return step_fn

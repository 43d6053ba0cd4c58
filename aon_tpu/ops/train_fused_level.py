"""One-kernel-per-level NeRF training: forward MLP + volume compositing +
MSE loss + full backward in a single Pallas kernel (v3 train path).

The v2 path runs THREE passes over every sample per level: a fwd kernel
(for the loss), XLA compositing fwd+bwd, and a bwd kernel that REMATERIALIZES
the forward before accumulating weight grads — 4x forward-FLOPs total.
Here each level is one kernel over ray-major tiles (R rays x S_pad
consecutive sample rows): the forward activations stay live in VMEM, the
compositing (reference helper.py:157-195) and its VJP run in-register via
segmented Hillis-Steele scans over the sample rows, and the backward reuses
the live activations — 3x forward-FLOPs, no XLA compositing stage, no
separate cotangent stream.

Segmented scans: transmittance is an exclusive per-ray cumPRODUCT of
(1 - alpha + eps) and the alpha-backward needs an exclusive per-ray SUFFIX
sum of w*G; both are log2(S_pad) steps of ``pltpu.roll`` along sublanes
with iota masks at segment boundaries (rows of one ray are consecutive).
Per-ray reductions/broadcasts use tiny one-hot selection matmuls at
HIGHEST precision (exact in f32).

Contracts matched (loss-relevant parts of helper.py:157-195 + the MSE of
model.py:271-282): last-interval dist 1e10, alpha = 1-exp(-relu(sigma)*dist),
T via exclusive cumprod of (1-alpha+1e-10), white-background compositing,
loss = mean((comp-target)^2) summed over both levels.  Supported config:
noise_std == 0 (the reference default), unit-norm rays_d (the SAPIEN
dataset contract — dists are not rescaled in-kernel).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aon_tpu.ops.fused_mlp import (
    _ENC_ORDER,
    _WEIGHT_ORDER,
    _encode_in_kernel,
    _interpret,
)
from aon_tpu.ops.fused_mlp_train import _SHAPES, _fwd_activations, unpack_vanilla_mlp_grads

_HI = jax.lax.Precision.HIGHEST


def _round_up(n, m):
    return (n + m - 1) // m * m


def _seg_scan_excl_prod(u, seg_idx, s_pad):
    """Exclusive per-segment prefix product along rows; u (rows, 1).

    Masked Hillis-Steele INCLUSIVE scan (x_s *= x_{s-k} when the segment
    index reaches k, so x_{s-k} already covers [max(0, s-2k), s-k]) followed
    by a shift-down-by-one with identity fill."""
    x = u
    k = 1
    while k < s_pad:
        x = x * jnp.where(seg_idx >= k, pltpu.roll(x, k, 0), 1.0)
        k *= 2
    return jnp.where(seg_idx >= 1, pltpu.roll(x, 1, 0), 1.0)


def _seg_scan_excl_suffix_sum(v, seg_idx, s_pad):
    """Exclusive per-segment suffix sum along rows; v (rows, C)."""
    rows = v.shape[0]
    x = v
    k = 1
    while k < s_pad:
        x = x + jnp.where(seg_idx + k <= s_pad - 1, pltpu.roll(x, rows - k, 0), 0.0)
        k *= 2
    return jnp.where(seg_idx <= s_pad - 2, pltpu.roll(x, rows - 1, 0), 0.0)


def _level_kernel(
    n_rays_total,
    rays_per_tile,
    s_pad,
    s_real,
    white_bkgd,
    xv_ref,
    *refs,
):
    """refs = [enc consts] + [26 weights] + [26 grad accums, per_sample_out].

    All per-ray inputs (target) and outputs (err^2) ride the per-SAMPLE
    streams: Mosaic's lane-divisibility rule (block lane dim % 128) forbids
    narrow (8, R) per-ray blocks, so the target is broadcast onto sample
    rows by the caller and the squared error is written to each segment's
    row 0."""
    n_enc = len(_ENC_ORDER)
    n_w = len(_WEIGHT_ORDER)
    e = dict(zip(_ENC_ORDER, refs[:n_enc]))
    w = dict(zip(_WEIGHT_ORDER, refs[n_enc : n_enc + n_w]))
    gw = dict(zip(_WEIGHT_ORDER, refs[n_enc + n_w : n_enc + 2 * n_w]))
    ps_out = refs[n_enc + 2 * n_w]  # (8, rows): [w, err2@seg0, ...]
    bf = jnp.bfloat16

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for name in _WEIGHT_ORDER:
            gw[name][...] = jnp.zeros_like(gw[name])

    xv = jnp.transpose(xv_ref[...])  # (rows, 16): x,y,z,t, vx,vy,vz,0, tr,tg,tb,0,...
    rows = xv.shape[0]
    R = rays_per_tile

    seg_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % s_pad
    real = seg_idx < s_real  # padded sample rows contribute nothing
    last = seg_idx == s_real - 1

    # ---- forward MLP (activations stay live for the backward) ----
    xyz4 = jnp.concatenate([xv[:, :3], jnp.zeros_like(xv[:, :1])], axis=1)
    enc = _encode_in_kernel(xyz4, e["s_pos"], e["p_pos"], bf)
    venc = _encode_in_kernel(
        jnp.concatenate([xv[:, 4:7], jnp.zeros_like(xv[:, :1])], axis=1),
        e["s_view"], e["p_view"], bf,
    )
    acts = _fwd_activations(enc, venc, w)
    raw_rgb = acts["rgb"]  # (rows, 3) f32
    raw_sigma = acts["sigma"]  # (rows, 1) f32

    # ---- compositing forward (helper.py:157-195; unit-norm dirs) ----
    t = xv[:, 3:4]
    t_next = pltpu.roll(t, rows - 1, 0)  # t_{s+1}
    dist = jnp.where(last, 1e10, t_next - t)
    dist = jnp.where(real, dist, 0.0)
    sigma = jnp.maximum(raw_sigma, 0.0)
    rgb = jax.nn.sigmoid(raw_rgb)
    alpha = jnp.where(real, 1.0 - jnp.exp(-sigma * dist), 0.0)
    # NOT `1.0 - alpha + 1e-10`: XLA constant-folds (1.0 + 1e-10) -> 1.0 and
    # reassociates, yielding u = 0 exactly at opaque samples -> NaN at the
    # P/u division below.  The max() blocks the rewrite (and is an identity:
    # alpha <= 1), preserving the reference's strict left-to-right
    # (1 - alpha) + 1e-10 >= 1e-10 (helper.py:170).
    u = jnp.maximum(1.0 - alpha, 0.0) + 1e-10
    T = _seg_scan_excl_prod(u, seg_idx, s_pad)  # exclusive transmittance
    wgt = alpha * T  # (rows, 1)

    # per-ray reductions via one-hot selection matmuls (exact at HIGHEST)
    row_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 0) // s_pad
    col_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 1)
    sel = (row_ray == col_ray).astype(jnp.float32)  # (rows, R)

    def seg_sum(x):  # (rows, C) -> (R, C)
        return jax.lax.dot_general(
            sel, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_HI,
        )

    def bcast(x):  # (R, C) -> (rows, C)
        return jax.lax.dot_general(
            sel, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_HI,
        )

    comp = seg_sum(wgt * rgb)  # (R, 3)
    acc = seg_sum(wgt)  # (R, 1)
    if white_bkgd:
        comp = comp + (1.0 - acc)

    tgt_rows = xv[:, 8:11]  # target broadcast per sample row
    # zero out batch-padding rays so they contribute no loss/gradient
    row_global = pl.program_id(0) * rows + jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0
    )
    ray_valid_rows = (row_global // s_pad < n_rays_total).astype(jnp.float32)
    err_rows = (bcast(comp) - tgt_rows) * ray_valid_rows  # (rows, 3)
    # loss = mean over (n_rays_total, 3) of err^2  ->  dL/dcomp = 2 err / (B*3)
    # ---- compositing backward ----
    dcomp_rows = err_rows * (2.0 / (n_rays_total * 3.0))  # (rows, 3)
    d_rgb = wgt * dcomp_rows
    # G = dL/dw_s = <dcomp, rgb_s> - white * <dcomp, 1>.  The white term is
    # per-ray constant, for which the suffix scan cancels two O(1) terms
    # (analytically Gc*T_total/u) — benign HERE because the photometric
    # part varies per sample and dominates (validated by parity tests and
    # quality runs), but a loss DOMINATED by constant-G terms must use the
    # closed form: see the opacity BCE in train_fused_level_art.py.
    G = jnp.sum(dcomp_rows * rgb, axis=1, keepdims=True)
    if white_bkgd:
        G = G - jnp.sum(dcomp_rows, axis=1, keepdims=True)
    P = _seg_scan_excl_suffix_sum(wgt * G, seg_idx, s_pad)  # sum_{j>s} w_j G_j
    d_alpha = T * G - P / u
    d_sigma = jnp.where(real, d_alpha * dist * (1.0 - alpha), 0.0)

    g_rgb = (d_rgb * rgb * (1.0 - rgb)).astype(jnp.float32)  # sigmoid'
    g_sigma = jnp.where(raw_sigma > 0, d_sigma, 0.0)  # relu'

    # ---- MLP backward from LIVE activations (no remat) ----
    _bwd_from_acts(enc, venc, g_rgb, g_sigma, acts, w, gw)

    # ---- auxiliary outputs ----
    # row 0: compositing weights (consumed by the fine-level resample);
    # row 1: per-ray squared error, written on each segment's first row
    err2_rows = jnp.sum(err_rows * err_rows, axis=1, keepdims=True)
    err2_seg0 = jnp.where(seg_idx == 0, err2_rows, 0.0)
    ps_out[...] = jnp.transpose(
        jnp.concatenate(
            [wgt, err2_seg0, jnp.zeros((rows, 6), jnp.float32)], axis=1
        )
    )


def _bwd_from_acts(enc, venc, g_rgb, g_sigma, acts, w, gw):
    """Weight-grad accumulation given live activations (fused_mlp_train's
    _bwd_body minus the rematerialized forward)."""
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


@functools.lru_cache()
def _device_vmem_bytes() -> int:
    """Per-core VMEM capacity backing the scoped-vmem requests below.

    Known generations from public TPU specs (v5e/v5p/v6e: 128 MiB — the
    v5e figure is also validated by round-3 measurements: 64-80 MiB scoped
    requests compile and run).  UNKNOWN device kinds get the conservative
    16 MiB architectural floor so _vmem_params raises a clear error here
    instead of a mysterious Mosaic allocation failure mid-compile."""
    if jax.default_backend() != "tpu":
        return 1 << 30  # CPU / interpret mode: no VMEM constraint
    kind = jax.devices()[0].device_kind.lower()
    for tag in ("v5 lite", "v5litepod", "v5e", "v5p", "v6 lite", "v6e", "v6p"):
        if tag in kind:
            return 128 << 20
    return 16 << 20


def _vmem_params(mb: int):
    """CompilerParams for an ``mb``-MiB scoped-vmem request, checked against
    the device's capacity so other TPU generations fail LOUDLY with a fix."""
    cap = _device_vmem_bytes()
    if (mb << 20) > cap:
        raise RuntimeError(
            f"fused level-train kernel requests a {mb} MiB scoped-VMEM budget "
            f"but this device ({jax.devices()[0].device_kind}) has ~{cap >> 20} "
            "MiB VMEM; drop max_tile_rows (1024 -> 32 MiB, 512 -> 16 MiB) and "
            "re-tune with scripts/bench_level_tiles.py on this generation"
        )
    return pltpu.CompilerParams(vmem_limit_bytes=mb << 20)


def _choose_tile(s_real: int, max_rows: int = 1024) -> Tuple[int, int]:
    """(s_pad, rays_per_tile) minimizing pad waste, then maximizing tile.

    Mosaic requires the (8, R*s_pad) block's lane dim divisible by 128, so
    R must be a multiple of 128 / gcd(s_pad, 128).  Pad waste multiplies
    every FLOP, so minimize s_pad - s_real FIRST; among equal-waste
    candidates take the LARGEST R*s_pad <= max_rows — small tiles (e.g. the
    minimal 2x64=128 rows at S=64) leave the MXU short and burn grid-step
    overhead (measured: 4096-ray coarse level = 2048 steps).  VMEM: live
    activations are ~rows * (2.5 KB vanilla / 3.5 KB articulated) bf16 +
    f32 weights/grad accumulators (see vmem_limit_bytes at the call site)."""
    import math

    base = _round_up(s_real, 8)
    best = None  # (waste, -rows, s_pad, r)
    for s_pad in range(base, base + 72, 8):
        r_min = 128 // math.gcd(s_pad, 128)
        if r_min * s_pad > max_rows:
            continue
        r = (max_rows // s_pad) // r_min * r_min
        cand = (s_pad - s_real, -r * s_pad, s_pad, r)
        if best is None or cand < best:
            best = cand
    assert best is not None, s_real
    return best[2], best[3]


@functools.partial(
    jax.jit,
    static_argnames=("white_bkgd", "max_tile_rows"),
)
def fused_level_train_grads(
    packed: Dict[str, jnp.ndarray],
    enc_consts: Dict[str, jnp.ndarray],
    t_vals: jnp.ndarray,  # (B, S) sample positions (sorted)
    rays_o: jnp.ndarray,  # (B, 3)
    rays_d: jnp.ndarray,  # (B, 3) unit-norm (SAPIEN contract)
    viewdirs: jnp.ndarray,  # (B, 3)
    target: jnp.ndarray,  # (B, 3)
    white_bkgd: bool,
    max_tile_rows: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One training level, fully fused.

    Returns ``(sq_err_sum, weights (B, S), packed weight grads)`` where
    ``sq_err_sum`` is sum over rays of the per-ray 3-channel squared error
    (level loss = sq_err_sum / (B*3)) and grads are d(level loss)/d(packed).
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

    coords = o_p[:, None, :] + t_p[..., None] * d_p[:, None, :]  # (b_pad, s_pad, 3)
    xv = jnp.concatenate(
        [
            coords,
            t_p[..., None],
            jnp.broadcast_to(v_p[:, None, :], (b_pad, s_pad, 3)),
            jnp.zeros((b_pad, s_pad, 1), t_vals.dtype),
            jnp.broadcast_to(tgt_p[:, None, :], (b_pad, s_pad, 3)),
            jnp.zeros((b_pad, s_pad, 5), t_vals.dtype),
        ],
        axis=-1,
    ).reshape(rows, 16).T  # (16, rows) transposed stream (incl. target rows)

    enc_args = [enc_consts[k] for k in _ENC_ORDER]
    weights = [packed[k] for k in _WEIGHT_ORDER]
    tile_rows = R * s_pad
    grid = (b_pad // R,)

    kernel = functools.partial(
        _level_kernel, B, R, s_pad, S, bool(white_bkgd)
    )
    interpret = _interpret()
    compiler_params = None
    if not interpret:
        # live activations + f32 weights + f32 grad accumulators exceed the
        # conservative 16M default scoped-vmem budget (~18.4M at 640 rows);
        # scale the request with the tile, capacity-checked per generation
        compiler_params = _vmem_params(32 if tile_rows <= 1024 else 64)
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
                pl.BlockSpec(_SHAPES[k], lambda i: (0, 0), memory_space=pltpu.VMEM)
                for k in _WEIGHT_ORDER
            ],
            pl.BlockSpec((8, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(_SHAPES[k], jnp.float32) for k in _WEIGHT_ORDER],
            jax.ShapeDtypeStruct((8, rows), jnp.float32),
        ],
    )(xv, *enc_args, *weights)

    grads = dict(zip(_WEIGHT_ORDER, outs[: len(_WEIGHT_ORDER)]))
    per_sample = outs[len(_WEIGHT_ORDER)]  # (8, rows)

    wgt = per_sample[0].reshape(b_pad, s_pad)[:B, :S]
    sq_err_sum = jnp.sum(per_sample[1])
    return sq_err_sum, wgt, grads


def make_fused_step_fn(
    near: float,
    far: float,
    white_bkgd: bool,
    num_coarse: int = 64,
    num_fine: int = 128,
    max_deg: int = 10,
    deg_view: int = 4,
    lindisp: bool = False,
):
    """v3 step: returns ``fn(params, batch, key) -> (loss, aux, grads)``
    with grads already computed (no jax.value_and_grad around it).

    params is the flax VanillaNeRF tree {coarse_mlp, fine_mlp}; grads come
    back in the same tree.  Sampling/resampling stay outside (coarse
    stratified + Pallas resample kernel), matching the v2 path.
    """
    from aon_tpu.core import sampling
    from aon_tpu.core.rays import effective_intervals
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.fused_mlp_train import pack_vanilla_mlp_params_f32
    from aon_tpu.ops.resample_pallas import sample_pdf_fused

    enc_consts = make_posenc_constants(max_deg=max_deg, view_deg=deg_view)

    def step_fn(params, batch, key):
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        viewdirs, target = batch["viewdirs"], batch["target"]
        ray_ids = batch.get("ray_ids")
        B = rays_o.shape[0]
        k0, k2 = jax.random.split(key)

        packed_c = pack_vanilla_mlp_params_f32(params["coarse_mlp"])
        packed_f = pack_vanilla_mlp_params_f32(params["fine_mlp"])

        # AABB-tightened per-ray intervals when the batch carries them
        near_r, far_r = effective_intervals(batch, near, far)
        t_vals, _ = sampling.sample_along_rays(
            k0, rays_o, rays_d, num_coarse, near_r, far_r,
            randomized=True, lindisp=lindisp, ray_ids=ray_ids,
        )
        # coarse level (S=65): a 2048-row budget picks (s_pad=72, R=16) —
        # half the pad waste of (80, 8) and measured +13% on v5e
        # (scripts/bench_level_tiles.py); the fine level and the articulated
        # kernels measure FASTER at the 1024 default (VMEM pressure).
        # The 2048-row tile requests a 64 MiB scoped-vmem budget — derived
        # for the 128 MiB VMEM generations (v5e/v5p/v6e); smaller-VMEM parts
        # fall back to 1024-row tiles via the capacity table, and unknown
        # generations fail loudly in _vmem_params rather than in Mosaic.
        coarse_tile = 2048 if _device_vmem_bytes() >= (128 << 20) else 1024
        err0, wgt, g_c = fused_level_train_grads(
            packed_c, enc_consts, t_vals, rays_o, rays_d, viewdirs, target,
            white_bkgd, max_tile_rows=coarse_tile,
        )

        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_union, _ = sample_pdf_fused(
            k2, t_mids, wgt[..., 1:-1], rays_o, rays_d, t_vals, num_fine,
            randomized=True, ray_ids=ray_ids,
        )
        err1, _, g_f = fused_level_train_grads(
            packed_f, enc_consts, t_union, rays_o, rays_d, viewdirs, target,
            white_bkgd,
        )

        loss0 = err0 / (B * 3.0)
        loss1 = err1 / (B * 3.0)
        grads = {
            "coarse_mlp": unpack_vanilla_mlp_grads(g_c),
            "fine_mlp": unpack_vanilla_mlp_grads(g_f),
        }
        return loss0 + loss1, {"loss0": loss0, "loss1": loss1}, grads

    return step_fn

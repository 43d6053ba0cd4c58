"""Kernel-variant microbenchmarks on real TPU hardware (round-2 perf push).

Measures sustained TFLOP/s of the fused NeRF MLP kernels under candidate
optimizations: tile size, two-stream interleaving (software pipelining of
two half-tiles through the dependent layer chain), bf16 weight
preconversion for the training kernels, and bf16 accumulation.

Timing protocol for this axon-relayed chip (see BASELINE.md / memory notes):
block_until_ready acks early, so every measurement scans K dependent kernel
calls inside ONE dispatch and forces a single scalar host readback; the
dispatch RTT (~45 ms) is measured separately and subtracted.

Usage:  python scripts/bench_kernels.py [variant ...]   (default: all)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from aon_tpu.models.mlp import NeRFMLP  # noqa: E402
from aon_tpu.ops.fused_mlp import (  # noqa: E402
    POS_PAD,
    VIEW_PAD,
    _WEIGHT_ORDER,
    _interpret,
    _mlp_body,
    pack_vanilla_mlp_params,
)

MACS_PER_SAMPLE = (
    64 * 256 + 6 * 256 * 256 + (256 + 64) * 256 + 2 * 256 * 256
    + 256 * 256 + 256 + (256 + 32) * 128 + 128 * 3
)
FLOPS_PER_SAMPLE = 2 * MACS_PER_SAMPLE  # fwd only


def _params(dtype=jnp.bfloat16):
    mlp = NeRFMLP()
    variables = mlp.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 63)), jnp.zeros((2, 27))
    )
    packed = pack_vanilla_mlp_params(variables["params"], dtype=dtype)
    return {k: (v.reshape(1, -1) if v.ndim == 1 else v) for k, v in packed.items()}


# ------------------------------------------------------------------ variants


def _mlp_body_2s(enc, venc, w, out_ref):
    """Two-stream body: the tile is split into two independent halves whose
    layer-k GEMMs interleave, giving the scheduler MXU/VPU overlap across
    streams (a dependent single-stream chain stalls the MXU on every
    bias+relu+cast)."""
    dtype = enc.dtype
    half = enc.shape[0] // 2

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    ea, eb = enc[:half], enc[half:]
    va, vb = venc[:half], venc[half:]

    def layer(xa, xb, wk, bk):
        ya = dot(xa, wk)
        yb = dot(xb, wk)
        return (
            jnp.maximum(ya + bk, 0.0).astype(dtype),
            jnp.maximum(yb + bk, 0.0).astype(dtype),
        )

    ha, hb = layer(ea, eb, w["w0"][...], w["b0"][...])
    for i in (1, 2, 3, 4):
        ha, hb = layer(ha, hb, w[f"w{i}"][...], w[f"b{i}"][...])
    # skip layer
    sa = dot(ha, w["w5a"][...]) + dot(ea, w["w5b"][...])
    sb = dot(hb, w["w5a"][...]) + dot(eb, w["w5b"][...])
    ha = jnp.maximum(sa + w["b5"][...], 0.0).astype(dtype)
    hb = jnp.maximum(sb + w["b5"][...], 0.0).astype(dtype)
    for i in (6, 7):
        ha, hb = layer(ha, hb, w[f"w{i}"][...], w[f"b{i}"][...])

    sig_a = dot(ha, w["wd"][...]) + w["bd"][...]
    sig_b = dot(hb, w["wd"][...]) + w["bd"][...]
    bot_a = (dot(ha, w["wb"][...]) + w["bb"][...]).astype(dtype)
    bot_b = (dot(hb, w["wb"][...]) + w["bb"][...]).astype(dtype)
    v_a = jnp.maximum(
        dot(bot_a, w["wva"][...]) + dot(va, w["wvb"][...]) + w["bv"][...], 0.0
    ).astype(dtype)
    v_b = jnp.maximum(
        dot(bot_b, w["wva"][...]) + dot(vb, w["wvb"][...]) + w["bv"][...], 0.0
    ).astype(dtype)
    rgb_a = dot(v_a, w["wrgb"][...]) + w["brgb"][...]
    rgb_b = dot(v_b, w["wrgb"][...]) + w["brgb"][...]
    out_ref[:half] = jnp.concatenate([rgb_a, sig_a], axis=-1)
    out_ref[half:] = jnp.concatenate([rgb_b, sig_b], axis=-1)


def _mlp_body_bf16acc(enc, venc, w, out_ref):
    """Trunk GEMMs emit bf16 directly (halves accumulator writeback + kills
    the per-layer f32->bf16 cast); heads stay f32."""
    dtype = jnp.bfloat16

    def dotb(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
        )

    def dotf(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    h = jnp.maximum(dotb(enc, w["w0"][...]) + w["b0"][...].astype(dtype), 0.0)
    for i in (1, 2, 3, 4):
        h = jnp.maximum(dotb(h, w[f"w{i}"][...]) + w[f"b{i}"][...].astype(dtype), 0.0)
    h = jnp.maximum(
        dotb(h, w["w5a"][...]) + dotb(enc, w["w5b"][...]) + w["b5"][...].astype(dtype),
        0.0,
    )
    for i in (6, 7):
        h = jnp.maximum(dotb(h, w[f"w{i}"][...]) + w[f"b{i}"][...].astype(dtype), 0.0)

    sigma = dotf(h, w["wd"][...]) + w["bd"][...]
    bottleneck = (dotf(h, w["wb"][...]) + w["bb"][...]).astype(dtype)
    v = jnp.maximum(
        dotb(bottleneck, w["wva"][...]) + dotb(venc, w["wvb"][...])
        + w["bv"][...].astype(dtype),
        0.0,
    )
    rgb = dotf(v, w["wrgb"][...]) + w["brgb"][...]
    out_ref[...] = jnp.concatenate([rgb, sigma], axis=-1)


def _make_fwd(body, tile):
    def kernel(enc_ref, venc_ref, *refs):
        w = dict(zip(_WEIGHT_ORDER, refs[:-1]))
        out_ref = refs[-1]
        dtype = w["w0"].dtype
        body(enc_ref[...].astype(dtype), venc_ref[...].astype(dtype), w, out_ref)

    def call(packed, enc, venc):
        n = enc.shape[0]
        weights = [packed[k] for k in _WEIGHT_ORDER]
        return pl.pallas_call(
            kernel,
            interpret=_interpret(),
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, POS_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, VIEW_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
            ],
            out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        )(enc, venc, *weights)

    return call


# ------------------------------------------------------------------- timing


def measure_rtt() -> float:
    x = jnp.zeros(())
    f = jax.jit(lambda v: v + 1.0)
    _ = float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_fwd(name, body, tile, n=1 << 18, k=48, dtype=jnp.bfloat16, rtt=0.0):
    packed = _params(dtype)
    g = np.random.default_rng(0)
    enc = jnp.asarray(g.normal(size=(n, POS_PAD)), jnp.float32)
    venc = jnp.asarray(g.normal(size=(n, VIEW_PAD)), jnp.float32)
    call = _make_fwd(body, tile)

    @jax.jit
    def chained(packed, enc, venc):
        def step(c, _):
            out = call(packed, enc, venc * (1.0 + 0.0 * c))
            return jnp.sum(out[:, 3]), None

        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=k)
        return c

    t0 = time.perf_counter()
    _ = float(chained(packed, enc, venc))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(packed, enc, venc))
    dt = time.perf_counter() - t0 - rtt
    tflops = n * k * FLOPS_PER_SAMPLE / dt / 1e12
    print(json.dumps({
        "variant": name, "tile": tile, "tflops": round(tflops, 1),
        "ms": round(dt * 1e3, 1), "compile_s": round(compile_s, 1),
    }), flush=True)
    return tflops


def bench_train(name, n=1 << 17, k=12, tile=512, bf16_weights=False, rtt=0.0):
    """fwd+bwd of the actual training kernels (fused_mlp_train_xyz path)."""
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    import importlib; FT = importlib.import_module("aon_tpu.ops.fused_mlp_train")

    mlp = NeRFMLP()
    variables = mlp.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 63)), jnp.zeros((2, 27))
    )
    params = variables["params"]
    enc_consts = make_posenc_constants()
    g = np.random.default_rng(0)
    B, S = n // 256, 256
    samples = jnp.asarray(g.normal(size=(B, S, 3)), jnp.float32)
    viewdirs = jnp.asarray(g.normal(size=(B, 3)), jnp.float32)

    def loss(p, s):
        rgb, sig = FT.fused_mlp_train_xyz(p, enc_consts, s, viewdirs, tile)
        return jnp.sum(rgb) + jnp.sum(sig)

    @jax.jit
    def chained(params, samples):
        def step(c, _):
            l, grads = jax.value_and_grad(loss)(params, samples * (1.0 + 0.0 * c))
            return l + sum(jnp.sum(x) for x in jax.tree.leaves(grads)), None

        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=k)
        return c

    t0 = time.perf_counter()
    _ = float(chained(params, samples))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(params, samples))
    dt = time.perf_counter() - t0 - rtt
    # fwd in custom_vjp fwd + (remat fwd + dW + dx) in bwd ~= 4x fwd FLOPs
    tflops = n * k * FLOPS_PER_SAMPLE * 4 / dt / 1e12
    print(json.dumps({
        "variant": name, "tile": tile, "tflops_4x": round(tflops, 1),
        "ms": round(dt * 1e3, 1), "compile_s": round(compile_s, 1),
    }), flush=True)
    return tflops


def bench_parts(name, n=1 << 18, k=16, tile=512, wdtype=jnp.float32, part="fwd+bwd",
                rtt=0.0):
    """Time the raw train kernels (fused_mlp_train_xyz internals) with the
    packing hoisted OUT of the timed region, at a chosen weight dtype."""
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    import importlib; FT = importlib.import_module("aon_tpu.ops.fused_mlp_train")

    mlp = NeRFMLP()
    variables = mlp.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 63)), jnp.zeros((2, 27))
    )
    packed = pack_vanilla_mlp_params(variables["params"], dtype=wdtype)
    packed = {kk: (v.reshape(1, -1) if v.ndim == 1 else v) for kk, v in packed.items()}
    enc_consts = make_posenc_constants()
    g = np.random.default_rng(0)
    B, S = n // 256, 256
    samples = jnp.asarray(g.normal(size=(B, S, 3)), jnp.float32)
    viewdirs = jnp.asarray(g.normal(size=(B, 3)), jnp.float32)
    gout = jnp.ones((B, S, 4), jnp.float32)

    @jax.jit
    def chained(packed, samples):
        def step(c, _):
            s2 = samples * (1.0 + 0.0 * c)
            acc = jnp.zeros(())
            if "fwd" in part:
                out = FT._fwd_call_xyz(packed, enc_consts, s2, viewdirs, tile)
                acc = acc + jnp.sum(out[..., 3])
            if "bwd" in part:
                grads = FT._bwd_call_xyz(packed, enc_consts, s2, viewdirs, gout, tile)
                acc = acc + sum(jnp.sum(v) for v in grads.values())
            return acc, None

        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=k)
        return c

    t0 = time.perf_counter()
    _ = float(chained(packed, samples))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(packed, samples))
    dt = time.perf_counter() - t0 - rtt
    mult = {"fwd": 1, "bwd": 3, "fwd+bwd": 4}[part]
    tflops = n * k * FLOPS_PER_SAMPLE * mult / dt / 1e12
    print(json.dumps({
        "variant": name, "tile": tile, "part": part, "wdtype": str(wdtype.__name__),
        "tflops": round(tflops, 1), "ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)
    return tflops


def main():
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    rtt = measure_rtt()
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2)}), flush=True)

    specs = [
        ("fwdxyz512", dict(tile=512, part="fwd", wdtype=jnp.bfloat16)),
        ("fwdxyz1024", dict(tile=1024, part="fwd", wdtype=jnp.bfloat16)),
        ("bwd512f32", dict(tile=512, part="bwd", wdtype=jnp.float32)),
        ("bwd512bf16", dict(tile=512, part="bwd", wdtype=jnp.bfloat16)),
        ("bwd640bf16", dict(tile=640, part="bwd", wdtype=jnp.bfloat16)),
        ("bwd768bf16", dict(tile=768, part="bwd", wdtype=jnp.bfloat16)),
        ("step512f32", dict(tile=512, part="fwd+bwd", wdtype=jnp.float32)),
    ]
    for name, kw in specs:
        if on(name):
            try:
                bench_parts(name, rtt=rtt, **kw)
            except Exception as e:
                print(json.dumps({"variant": name, "error": repr(e)[:300]}), flush=True)

    from aon_tpu.ops.fused_mlp import _mlp_body

    body_specs = [
        ("body_base512", _mlp_body, 512),
        ("body_2s512", _mlp_body_2s, 512),
        ("body_2s1024", _mlp_body_2s, 1024),
        ("body_bf16acc512", _mlp_body_bf16acc, 512),
    ]
    for name, body, tile in body_specs:
        if on(name):
            try:
                bench_fwd(name, body, tile, rtt=rtt)
            except Exception as e:
                print(json.dumps({"variant": name, "error": repr(e)[:300]}), flush=True)
    if on("train512"):
        bench_train("train512", tile=512, rtt=rtt)




# ---------------------------------------------------- encoding variants

def _encode_mxu(x4, s, p, dtype):
    """pos-enc with the scale/scatter as an MXU f32 matmul (T,4)@(4,64)."""
    x4 = x4.astype(jnp.float32)
    pre = jax.lax.dot_general(
        x4, s[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + p[...].astype(jnp.float32)
    two_pi = 2.0 * 3.14159265358979
    reduced = pre - two_pi * jnp.floor(pre * (1.0 / two_pi) + 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    return jnp.where(col < 3, pre, jnp.sin(reduced)).astype(dtype)


def bench_xyz_body(name, encode_fn, tile=512, n=1 << 18, k=48, rtt=0.0):
    """xyz fwd kernel with a swappable encoding implementation."""
    from aon_tpu.ops.fused_mlp import (
        _ENC_ORDER, _mlp_body, make_posenc_constants,
    )

    packed = _params(jnp.bfloat16)
    enc_consts = make_posenc_constants()
    g = np.random.default_rng(0)
    xyz = jnp.asarray(np.pad(g.normal(size=(n, 3)), ((0, 0), (0, 1))), jnp.float32)
    vdir = jnp.asarray(np.pad(g.normal(size=(n, 3)), ((0, 0), (0, 1))), jnp.float32)

    def kernel(xyz_ref, vdir_ref, *refs):
        e = dict(zip(_ENC_ORDER, refs[: len(_ENC_ORDER)]))
        rest = refs[len(_ENC_ORDER):]
        w = dict(zip(_WEIGHT_ORDER, rest[:-1]))
        out_ref = rest[-1]
        dtype = w["w0"].dtype
        enc = encode_fn(xyz_ref[...], e["s_pos"], e["p_pos"], dtype)
        venc = encode_fn(vdir_ref[...], e["s_view"], e["p_view"], dtype)
        _mlp_body(enc, venc, w, out_ref)

    enc_args = [enc_consts[kk] for kk in _ENC_ORDER]
    weights = [packed[kk] for kk in _WEIGHT_ORDER]

    def call(xyz, vdir):
        return pl.pallas_call(
            kernel,
            interpret=_interpret(),
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in enc_args],
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
            ],
            out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        )(xyz, vdir, *enc_args, *weights)

    @jax.jit
    def chained(xyz, vdir):
        def step(c, _):
            out = call(xyz + 0.0 * c, vdir)
            return jnp.sum(out[:, 3]), None
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=48)
        return c

    t0 = time.perf_counter()
    _ = float(chained(xyz, vdir))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(xyz, vdir))
    dt = time.perf_counter() - t0 - rtt
    tflops = n * 48 * FLOPS_PER_SAMPLE / dt / 1e12
    print(json.dumps({"variant": name, "tile": tile, "tflops": round(tflops, 1),
                      "ms": round(dt * 1e3, 1), "compile_s": round(compile_s, 1)}),
          flush=True)
    return tflops


def _encode_doubling(x4, s, p, dtype, deg=None, width=None):
    """pos-enc via sin/cos angle-doubling: 2 transcendentals total, then
    per-octave (2s*c, 1-2s^2) recurrences + masked selects.  Exact w.r.t.
    range reduction (doubling a 2pi-reduced angle preserves sin/cos of the
    unreduced product)."""
    if width is None:
        width = s.shape[-1]
    if deg is None:
        deg = (width // 3 - 1) // 2  # 64 -> 10, 32 -> 4
    x4 = x4.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (x4.shape[0], width), 1)
    # xtile[:, j] = x_{c(j)} for every identity/sin/cos column
    c_of = jnp.where(col < 3, col, (col - 3) % 3)
    xtile = jnp.where(c_of == 0, x4[:, 0:1], 0.0)
    xtile = jnp.where(c_of == 1, x4[:, 1:2], xtile)
    xtile = jnp.where(c_of == 2, x4[:, 2:3], xtile)
    two_pi = 2.0 * 3.14159265358979
    r = xtile - two_pi * jnp.floor(xtile * (1.0 / two_pi) + 0.5)
    s_cur = jnp.sin(r)
    c_cur = jnp.cos(r)
    oct_sin = (col - 3) // 3
    oct_cos = (col - 3 - 3 * deg) // 3
    is_sin = (col >= 3) & (col < 3 + 3 * deg)
    is_cos = (col >= 3 + 3 * deg) & (col < 3 + 6 * deg)
    out = xtile  # identity cols survive; freq cols overwritten below
    for d in range(deg):
        out = jnp.where(is_sin & (oct_sin == d), s_cur, out)
        out = jnp.where(is_cos & (oct_cos == d), c_cur, out)
        if d + 1 < deg:
            s_next = 2.0 * s_cur * c_cur
            c_cur = 1.0 - 2.0 * s_cur * s_cur
            s_cur = s_next
    return out.astype(dtype)

if __name__ == "__main__":
    main()

"""A/B microbenchmark: v3 level-train kernel throughput vs max_tile_rows.

Times K dependent calls of fused_level_train_grads (vanilla) and
fused_level_train_art_grads (articulated) inside one dispatch with a forced
scalar readback (the axon relay acks early), for the two hot shapes
(coarse S=65, fine S=193) at candidate tile budgets.

Usage: python scripts/bench_level_tiles.py [--batch 8192] [--rows 1024 2048]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _rays(batch, seed=0):
    g = np.random.default_rng(seed)
    d = g.normal(size=(batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (
        jnp.asarray(-4.0 * d),
        jnp.asarray(d),
        jnp.asarray(d),
        jnp.asarray(g.uniform(size=(batch, 3)).astype(np.float32)),
    )


def bench(fn_maker, label, batch, s, rows_budget, k=24):
    """fn_maker(packed, tvals, ...) -> scalar; times k chained calls."""
    fn, operands = fn_maker(batch, s, rows_budget)

    @jax.jit
    def chained(*ops):
        def step(c, _):
            return fn(*ops, c), None

        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=k)
        return out

    r = float(chained(*operands))  # compile + warm
    t0 = time.perf_counter()
    r = float(chained(*operands))
    dt = time.perf_counter() - t0
    rays_per_s = batch * k / dt
    print(
        json.dumps(
            {
                "kernel": label,
                "S": s,
                "max_tile_rows": rows_budget,
                "rays_per_sec_level": round(rays_per_s, 1),
                "ms_per_call": round(dt / k * 1e3, 3),
            }
        )
    )
    return rays_per_s


def vanilla_maker(batch, s, rows_budget):
    from aon_tpu.models.mlp import NeRFMLP
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.fused_mlp_train import pack_vanilla_mlp_params_f32
    from aon_tpu.ops.train_fused_level import fused_level_train_grads

    g = np.random.default_rng(0)
    rays_o, rays_d, viewdirs, target = _rays(batch)
    t_vals = jnp.asarray(
        np.sort(g.uniform(2.0, 6.0, size=(batch, s)), axis=-1).astype(np.float32)
    )
    mlp = NeRFMLP()
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 63)), jnp.zeros((2, 27)))[
        "params"
    ]
    packed = pack_vanilla_mlp_params_f32(params)
    enc_consts = make_posenc_constants()

    def fn(c):
        err, _, grads = fused_level_train_grads(
            packed, enc_consts, t_vals + 1e-12 * c, rays_o, rays_d, viewdirs,
            target, True, max_tile_rows=rows_budget,
        )
        return err

    return (lambda c: fn(c)), ()


def art_maker(batch, s, rows_budget):
    from aon_tpu.models.articulated import ArticulatedNeRFMLP
    from aon_tpu.ops.fused_art import fold_latents
    from aon_tpu.ops.fused_mlp import make_posenc_constants
    from aon_tpu.ops.train_fused_level_art import fused_level_train_art_grads

    g = np.random.default_rng(0)
    rays_o, rays_d, viewdirs, target = _rays(batch)
    t_vals = jnp.asarray(
        np.sort(g.uniform(2.0, 6.0, size=(batch, s)), axis=-1).astype(np.float32)
    )
    latents = {
        "density": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "color": jnp.asarray(g.normal(size=(1, 128)).astype(np.float32)) * 0.1,
        "articulation": jnp.asarray(g.normal(size=(1, 32)).astype(np.float32)) * 0.1,
    }
    mlp = ArticulatedNeRFMLP()
    samples = jnp.zeros((2, 4, 3))
    venc = jnp.zeros((2, 27))
    params = mlp.init(jax.random.PRNGKey(0), samples, venc, latents)["params"]
    packed = fold_latents(params, latents)
    enc_consts = make_posenc_constants()
    lw = jnp.full((batch,), 1.0 / (batch * 3.0))
    m = jnp.zeros((batch,))

    def fn(c):
        photo, _, _, _ = fused_level_train_art_grads(
            packed, enc_consts, t_vals + 1e-12 * c, rays_o, rays_d, viewdirs,
            target, lw, m, False, max_tile_rows=rows_budget,
        )
        return photo

    return (lambda c: fn(c)), ()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rows", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--kernels", nargs="+", default=["vanilla", "art"])
    args = ap.parse_args()

    makers = {"vanilla": vanilla_maker, "art": art_maker}
    for name in args.kernels:
        for s in (65, 193):
            for rb in args.rows:
                bench(makers[name], name, args.batch, s, rb)


if __name__ == "__main__":
    main()

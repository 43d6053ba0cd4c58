"""AE device-side roofline: where does the gated AE step's time go?

The auto-encoder articulated system is the only one far from the 10x/chip
north star (BENCH_r04: 114.1k rays/s = 4.6x at the gated aabb24 contract vs
autodec 178.3k / vanilla 359.4k).  Vanilla has a committed roofline
(BASELINE.md "Roofline") proving its ceiling; this script produces the AE
equivalent by attributing the step time between the ResNet-34 encoder
(fwd + bwd, reference resnet_encoder.py:292-531) and the two NeRF levels
(the same ArticulatedNeRF body the auto-decoder runs), each timed with the
per-dispatch scalar-readback protocol (the axon relay acks early — see
bench.py _time_train_many).

Stages (all bf16, T=8 steps/dispatch, 4096-ray steps, 24+48 AABB contract):
  ae_full        -- the gated AE train_many dispatch (the bench.py contract)
  enc_fwd        -- 8x encoder forward alone (one jitted scan per dispatch)
  enc_fwd_bwd    -- 8x encoder forward+backward (vjp wrt encoder params)
  autodec_body   -- the auto-decoder train_many at the SAME contract: the
                    same ArticulatedNeRF two-level body with latent folding,
                    minus the encoder — the NeRF-body cost floor

Derived:
  encoder_share        = enc_fwd_bwd / ae_full
  rays_per_sec_if_enc_free = rays_per_dispatch / (t_full - t_enc_fwd_bwd)
  XLA cost-analysis FLOPs for each jitted callable (when the backend
  reports them) so the shares can be cross-checked against physics.

Usage (chip must be otherwise idle):
  python scripts/roofline_ae.py [--N_samples 24 --N_importance 48]
Writes results/roofline_ae.json and prints the table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _flops_of(jitted, *args):
    """XLA's own FLOP estimate for a compiled callable (None if the
    backend doesn't report cost analysis)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an["flops"])
    except Exception:
        return None


def _timed(fn, n, readback):
    fn()  # warm (trace cache + compile already done by caller's warmup)
    t0 = time.perf_counter()
    for _ in range(n):
        readback(fn())
    return (time.perf_counter() - t0) / n


def main() -> None:
    sys.path.insert(0, ".")
    import bench  # the repo-root bench module: synthetic batches + timing

    ap = argparse.ArgumentParser()
    ap.add_argument("--N_samples", type=int, default=24)
    ap.add_argument("--N_importance", type=int, default=48)
    ap.add_argument("--tight", default="aabb", choices=["aabb", "occ"])
    ap.add_argument("--dispatches", type=int, default=6)
    ap.add_argument("--out", default="results/roofline_ae.json")
    args = ap.parse_args()

    from aon_tpu.parallel import get_mesh, stack_step_batches
    from aon_tpu.train.systems import build_system, AutoDecoderSystem
    from aon_tpu.utils.config import Config

    T = 8  # steps per dispatch (the trainer/bench contract)
    batch = 4096
    n = args.dispatches
    rays_per_dispatch = batch * T
    mesh = get_mesh()
    report = {
        "contract": f"{args.N_samples}+{args.N_importance} {args.tight}, "
                    f"{batch}-ray steps, T={T}, bf16",
    }

    # ---- full gated AE step ------------------------------------------------
    cfg = Config(
        exp_type="vanilla_ae_art", ray_batch_size=batch, batch_size=batch,
        compute_dtype="bfloat16", img_wh=[320, 240],
        N_samples=args.N_samples, N_importance=args.N_importance,
    )
    system = build_system(cfg, near=2.0, far=6.0, white_bkgd=False)
    g = np.random.default_rng(2)
    hb = bench._synthetic_batch(batch, tight=args.tight, seed=2)
    hb["instance_mask"] = (g.uniform(size=batch) > 0.5).astype(np.float32)
    hb["src_imgs"] = g.normal(size=(1, 3, 240, 320)).astype(np.float32)
    hb["deg"] = np.float32(0.5)
    super_b = stack_step_batches([hb] * T, mesh, microbatch=cfg.microbatch_rays)
    key = jax.random.PRNGKey(1)
    state = system.init_state(jax.random.PRNGKey(0))
    for i in range(2):  # compile + warm
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, i))
        _ = float(m["train/loss"])

    def full_step():
        nonlocal state
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, 99))
        return m

    t_full = _timed(full_step, n, lambda m: float(m["train/loss"]))
    report["ae_full_ms_per_dispatch"] = 1e3 * t_full
    report["ae_full_rays_per_sec"] = rays_per_dispatch / t_full

    # ---- encoder forward only (T applications per dispatch) ----------------
    enc, js = system.encoder, system.joint_state
    params = state.params  # already on device with the step's placement

    src = jnp.asarray(hb["src_imgs"], jnp.bfloat16)

    @jax.jit
    def enc_fwd(params, src):
        def body(c, _):
            lat = enc.apply({"params": params["encoder"]}, src)
            ps = js.apply({"params": params["joint_state"]}, lat["articulation"])
            s = sum(jnp.sum(v.astype(jnp.float32)) for v in lat.values())
            return c + s + jnp.sum(ps.astype(jnp.float32)), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=T)
        return out

    _ = float(enc_fwd(params, src))
    t_enc_fwd = _timed(lambda: enc_fwd(params, src), n, float)
    report["enc_fwd_ms_per_dispatch"] = 1e3 * t_enc_fwd
    report["enc_fwd_flops_per_dispatch"] = _flops_of(enc_fwd, params, src)

    # ---- encoder forward + backward ----------------------------------------
    @jax.jit
    def enc_fwd_bwd(params, src):
        def loss(p):
            def body(c, _):
                lat = enc.apply({"params": p["encoder"]}, src)
                ps = js.apply({"params": p["joint_state"]}, lat["articulation"])
                s = sum(jnp.sum(v.astype(jnp.float32)) for v in lat.values())
                return c + s + jnp.sum(ps.astype(jnp.float32)), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=T)
            return out

        val, grads = jax.value_and_grad(loss)(params)
        return val + sum(
            jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in jax.tree.leaves(grads)
        ) * 0.0

    _ = float(enc_fwd_bwd(params, src))
    t_enc_bwd = _timed(lambda: enc_fwd_bwd(params, src), n, float)
    report["enc_fwd_bwd_ms_per_dispatch"] = 1e3 * t_enc_bwd
    report["enc_fwd_bwd_flops_per_dispatch"] = _flops_of(
        enc_fwd_bwd, params, src
    )

    # ---- auto-decoder body at the same contract (NeRF floor) ---------------
    cfg_ad = Config(
        ray_batch_size=batch, batch_size=batch, compute_dtype="bfloat16",
        N_samples=args.N_samples, N_importance=args.N_importance, N_max_objs=8,
    )
    sys_ad = AutoDecoderSystem(cfg_ad, near=2.0, far=6.0, white_bkgd=False, mesh=None)
    hb_ad = bench._synthetic_batch(batch, tight=args.tight, seed=1)
    hb_ad["instance_id"] = np.int32(0)
    hb_ad["articulation_id"] = np.int32(1)
    super_ad = stack_step_batches([hb_ad] * T, mesh, microbatch=cfg_ad.microbatch_rays)
    st_ad = sys_ad.init_state(jax.random.PRNGKey(0))
    for i in range(2):
        st_ad, m = sys_ad.train_many(st_ad, super_ad, jax.random.fold_in(key, i))
        _ = float(m["train/loss"])

    def ad_step():
        nonlocal st_ad
        st_ad, m = sys_ad.train_many(st_ad, super_ad, jax.random.fold_in(key, 99))
        return m

    t_ad = _timed(ad_step, n, lambda m: float(m["train/loss"]))
    report["autodec_body_ms_per_dispatch"] = 1e3 * t_ad
    report["autodec_body_rays_per_sec"] = rays_per_dispatch / t_ad

    # ---- derived ------------------------------------------------------------
    report["encoder_share_of_ae_step"] = t_enc_bwd / t_full
    report["nerf_body_share_estimate"] = t_ad / t_full
    t_res = max(t_full - t_enc_bwd, 1e-9)
    report["rays_per_sec_if_encoder_free"] = rays_per_dispatch / t_res
    report["vs_baseline_if_encoder_free"] = (
        report["rays_per_sec_if_encoder_free"] / bench.REFERENCE_RAYS_PER_SEC
    )
    report["_analysis"] = (
        "The AE step = the auto-decoder NeRF body + ResNet-34 fwd/bwd + "
        "masked-MSE/BCE epilogue. If removing the encoder entirely still "
        "lands below 250k rays/s (10x/chip), the AE ceiling is set by the "
        "NeRF body, which already rooflines near the autodec rate; the "
        "encoder share bounds what encoder optimizations can recover."
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

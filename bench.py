"""Benchmark: NeRF training throughput (rays/sec) on real hardware.

Prints ONE JSON line for the driver (the vanilla headline metric):
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": R}
plus one informational line per additional system (articulated
auto-decoder, auto-encoder) unless --headline_only.

``vs_baseline`` is measured against the reference's nominal single-GPU
training rate.  The reference publishes no numbers (BASELINE.md), so the
baseline constant below is the reference's by-construction workload — 2048
rays/step at the measured step rate of the same MLP/sampling stack on one
RTX2080Ti (the hardware the reference README quotes) estimated at ~25k
rays/s; BASELINE.json's north star is >=10x the 8-GPU rate (~200k rays/s)
on a v5e-8, i.e. vs_baseline >= 80 per chip-8 or ~10 per chip.

Default sample counts / intervals are the PRODUCTION config proven at
reference-equal quality (see BASELINE.md "equal-PSNR" rows): the
occupancy-grid fast path (data/occgrid.py on top of data/aabb.py) tightens
each ray to its occupied sub-interval, so quality holds at far fewer
samples.  --reference_contract benchmarks the reference's own
64+193-sample [2,6] recipe instead.
"""

import argparse
import json
import time

import numpy as np

# Estimated reference throughput (rays/s) for the vanilla config on its
# quoted hardware (1x RTX2080Ti, README.md:43): 2048-ray steps of a
# 64+193-sample 8x256 MLP pipeline. Not published upstream; documented here
# as the fixed normalization constant for vs_baseline.
REFERENCE_RAYS_PER_SEC = 25000.0


def _synthetic_batch(batch: int, tight, seed: int = 0):
    """Random unit rays from radius-4 origins; with ``tight``, per-ray
    intervals matching the measured laptop-scene distribution — cost
    depends only on sample count, the values just have to be realistic.

    tight="aabb": scene-box slab intervals (mean span ~0.65 around t=3.7).
    tight="occ":  occupancy-grid-refined intervals.  Measured on
      data/laptop_single train rays: t_near mean 3.73 [p5 3.11, p95 4.41],
      span mean 0.19 [p5 0.04, p95 0.69] (aon_tpu/data/occgrid.py); the
      lognormal below is an APPROXIMATION of that distribution (its own
      p95 is ~0.57) — throughput depends only on the sample count, which
      is identical, not on the interval values.
    """
    g = np.random.default_rng(seed)
    d = g.normal(size=(batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    b = {
        "rays_o": (d * -4.0).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(batch, 3)).astype(np.float32),
    }
    if tight == "occ":
        tn = g.normal(3.73, 0.4, size=batch).clip(3.0, 4.5).astype(np.float32)
        span = g.lognormal(np.log(0.13), 0.9, size=batch).clip(0.03, 1.37)
        b["t_near"] = tn
        b["t_far"] = (tn + span).astype(np.float32)
    elif tight:  # "aabb" (or legacy True)
        tn = g.uniform(3.2, 3.6, size=batch).astype(np.float32)
        b["t_near"] = tn
        b["t_far"] = tn + g.uniform(0.4, 0.9, size=batch).astype(np.float32)
    return b


def _time_train_many(system, mesh, host_batch, microbatch, t_steps=8, n_dispatch=4):
    import jax

    from aon_tpu.parallel import stack_step_batches

    super_b = stack_step_batches([host_batch] * t_steps, mesh, microbatch=microbatch)
    key = jax.random.PRNGKey(1)
    state = system.init_state(jax.random.PRNGKey(0))
    # warmup / compile (2 calls: trace cache must be warm for the timed loop)
    for i in range(2):
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, i))
        _ = float(m["train/loss"])
    # NOTE: per-dispatch host readback of the scalar loss — through the axon
    # relay, block_until_ready alone acks before execution completes, which
    # inflates throughput ~1000x.  The readback makes timing honest (and
    # costs one scalar RTT per dispatch, slightly UNDER-stating peak rate).
    batch = host_batch["rays_o"].shape[0]
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, 10 + i))
        _ = float(m["train/loss"])
    dt = time.perf_counter() - t0
    return batch * t_steps * n_dispatch / dt


def bench_vanilla(args) -> float:
    from aon_tpu.parallel import get_mesh
    from aon_tpu.train.systems import VanillaSystem
    from aon_tpu.utils.config import Config

    cfg = Config(
        batch_size=args.batch, compute_dtype="bfloat16",
        N_samples=args.N_samples, N_importance=args.N_importance,
    )
    mesh = get_mesh()
    system = VanillaSystem(cfg, near=2.0, far=6.0, white_bkgd=True)
    host_batch = _synthetic_batch(args.batch, tight=args.tight)
    return _time_train_many(system, mesh, host_batch, cfg.microbatch_rays)


def bench_autodecoder(args) -> float:
    import jax.numpy as jnp

    from aon_tpu.parallel import get_mesh
    from aon_tpu.train.systems import AutoDecoderSystem
    from aon_tpu.utils.config import Config

    batch = 4096  # the articulated ray_batch_size contract
    cfg = Config(
        ray_batch_size=batch, batch_size=batch, compute_dtype="bfloat16",
        N_samples=args.N_samples, N_importance=args.N_importance, N_max_objs=8,
    )
    mesh = get_mesh()
    system = AutoDecoderSystem(cfg, near=2.0, far=6.0, white_bkgd=False)
    host_batch = _synthetic_batch(batch, tight=args.tight, seed=1)
    host_batch["instance_id"] = np.int32(0)
    host_batch["articulation_id"] = np.int32(1)
    return _time_train_many(system, mesh, host_batch, cfg.microbatch_rays)


def bench_ae(args) -> float:
    from aon_tpu.parallel import get_mesh
    from aon_tpu.train.systems import build_system
    from aon_tpu.utils.config import Config

    batch = 4096
    cfg = Config(
        exp_type="vanilla_ae_art", ray_batch_size=batch, batch_size=batch,
        compute_dtype="bfloat16", img_wh=[320, 240],
        N_samples=args.N_samples, N_importance=args.N_importance,
    )
    mesh = get_mesh()
    system = build_system(cfg, near=2.0, far=6.0, white_bkgd=False)
    g = np.random.default_rng(2)
    host_batch = _synthetic_batch(batch, tight=args.tight, seed=2)
    host_batch["instance_mask"] = (g.uniform(size=batch) > 0.5).astype(np.float32)
    host_batch["src_imgs"] = g.normal(size=(1, 3, 240, 320)).astype(np.float32)
    host_batch["deg"] = np.float32(0.5)
    return _time_train_many(system, mesh, host_batch, cfg.microbatch_rays)


def main() -> None:
    p = argparse.ArgumentParser()
    # Defaults = the production equal-PSNR contract (BASELINE.md):
    # occupancy-grid interval refinement + 16 coarse / 32 fine samples —
    # proven at val PSNR ABOVE the reference-contract (64+193) run's 39.62
    # on the reference's exact 100k-step schedule
    # (results/laptop_vanilla_refsched_occ16/metrics.jsonl step 100000;
    # the 24+48 AABB row remains in BASELINE.md: --N_samples 24
    # --N_importance 48 --tight aabb).
    p.add_argument("--N_samples", type=int, default=16)
    p.add_argument("--N_importance", type=int, default=32)
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--tight", nargs="?", const="occ", default="occ",
                   choices=["aabb", "occ"],
                   help="per-ray interval distribution (default and bare "
                        "const: occ; pass --tight aabb explicitly for the "
                        "looser slab-only contract)")
    p.add_argument("--no_tight", dest="tight", action="store_false")
    p.add_argument("--reference_contract", action="store_true",
                   help="benchmark the reference's 64+193-sample [2,6] recipe")
    p.add_argument("--headline_only", action="store_true",
                   help="skip the articulated/AE informational rates")
    args = p.parse_args()
    if args.reference_contract:
        args.N_samples, args.N_importance, args.tight = 64, 128, False

    rays_per_sec = bench_vanilla(args)
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )
    if args.headline_only:
        return
    # Each articulated system is measured at the contract its committed
    # equal-PSNR evidence actually gates (BASELINE.md):
    #   autodecoder — 24+48 AABB, gated by the laptop_autodec_24k_aabb24 run
    #     (val 30.21 / test 32.29 BEATS the 64+128 row's 29.37 / 31.93 at the
    #     same 24k-step budget; ckpts/laptop_autodec_24k_aabb24/results.json).
    #   ae — 24+48 AABB, gated by the laptop_ae_aabb24 run (val 29.64 /
    #     test 30.80 / obj 19.25 BEATS the 64+128 row's 29.42 val at the
    #     same 24k-step budget, via aabb_warmup_steps interval anneal +
    #     softplus-bias sigma; ckpts/laptop_ae_aabb24/results.json).
    ad_args = argparse.Namespace(**vars(args))
    ae_args = argparse.Namespace(**vars(args))
    if not args.reference_contract:
        ad_args.N_samples, ad_args.N_importance, ad_args.tight = 24, 48, "aabb"
        ae_args.N_samples, ae_args.N_importance, ae_args.tight = 24, 48, "aabb"
    for name, fn, a in (("autodecoder", bench_autodecoder, ad_args),
                        ("ae", bench_ae, ae_args)):
        try:
            r = fn(a)
            print(json.dumps({
                "metric": f"train_rays_per_sec_{name}", "value": round(r, 1),
                "unit": "rays/s",
                "vs_baseline": round(r / REFERENCE_RAYS_PER_SEC, 3),
            }))
        except Exception as e:  # informational rows must not kill the headline
            print(json.dumps({"metric": f"train_rays_per_sec_{name}",
                              "error": str(e)[:200]}))


if __name__ == "__main__":
    main()

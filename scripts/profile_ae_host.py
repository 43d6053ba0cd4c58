"""Host-path profile for the articulated systems (ROADMAP item: explain the
real-run vs synthetic-batch throughput gap).

The trainer's step loop is: T x ``next(it)`` (host batch assembly, pure
numpy/PNG-cache) -> ``stack_step_batches`` (host stack + device_put) ->
``train_many`` (one fused device dispatch of T optimizer steps).  bench.py's
"synthetic" articulated rates time ONLY the dispatch on a pre-staged constant
batch, so the difference between the real-run rate and the synthetic rate is
by construction host work + H2D.  This script times each stage separately on
the REAL dataset/config so the gap is attributed, not guessed:

    python scripts/profile_ae_host.py --config configs/quality_laptop_ae_aabb24.json

Stages (rates in rays/s at the config's ray_batch_size):
  iterator   -- ``next(it)`` alone (host CPU: ray gather, src_imgs, masks)
  stage      -- stack_step_batches on pre-drawn batches (stack + device_put)
  dispatch   -- train_many on ONE pre-staged super-batch, re-dispatched
                (the bench.py synthetic contract, but with real data)
  end2end    -- the trainer's actual loop shape (iterate + stage + dispatch)

Reference host path this mirrors: the torch DataLoader worker pool feeding
DDP replicas (/root/reference/datasets/sapien_multi.py:370-390); on this
one-core host there is no worker pool to hide the iterator cost, which is
exactly why the articulated real-run rate can sit below the device rate.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from aon_tpu.utils.config import get_config
from aon_tpu.train.trainer import Trainer
from aon_tpu.parallel import stack_step_batches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dispatches", type=int, default=12,
                    help="timed dispatches per stage (after 2 warmups)")
    args, overrides = ap.parse_known_args()
    cfg = get_config(["--config", args.config] + overrides)

    tr = Trainer(cfg)
    t_disp = max(1, cfg.steps_per_dispatch)
    rays_per_step = cfg.ray_batch_size
    rays_per_dispatch = rays_per_step * t_disp
    it = tr._train_iterator()
    key = jax.random.fold_in(tr.base_key, 0)

    def inject(b, step):
        if cfg.bg_loss_warmup_steps > 0:
            b["bg_scale"] = np.float32(min(1.0, step / cfg.bg_loss_warmup_steps))
        if cfg.aabb_warmup_steps > 0:
            b["interval_ramp"] = np.float32(min(1.0, step / cfg.aabb_warmup_steps))

    def draw(step0):
        batches = [next(it) for _ in range(t_disp)]
        for j, b in enumerate(batches):
            inject(b, step0 + j)
        return batches

    n = args.dispatches
    report = {"config": args.config, "exp_type": cfg.exp_type,
              "steps_per_dispatch": t_disp, "ray_batch_size": rays_per_step}

    # -- iterator alone ----------------------------------------------------
    draw(0)  # warm the frame cache
    t0 = time.perf_counter()
    pre_drawn = [draw(i * t_disp) for i in range(n)]
    dt = time.perf_counter() - t0
    report["iterator_rays_per_sec"] = n * rays_per_dispatch / dt
    report["iterator_ms_per_dispatch"] = 1e3 * dt / n

    # -- staging (stack + device_put) on the pre-drawn batches -------------
    staged = stack_step_batches(pre_drawn[0], tr.mesh, microbatch=cfg.microbatch_rays)
    jax.block_until_ready(staged)
    t0 = time.perf_counter()
    for bs in pre_drawn:
        staged = stack_step_batches(bs, tr.mesh, microbatch=cfg.microbatch_rays)
        # Block per iteration: the axon relay acks async device_put early, and
        # overwriting ``staged`` would let earlier transfers complete during
        # later iterations (or leak into the next stage's timing).
        jax.block_until_ready(staged)
    dt = time.perf_counter() - t0
    report["stage_rays_per_sec"] = n * rays_per_dispatch / dt
    report["stage_ms_per_dispatch"] = 1e3 * dt / n

    # -- device dispatch on ONE pre-staged batch (synthetic contract) ------
    state = tr.state
    state, m = tr.system.train_many(state, staged, key)  # compile
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = tr.system.train_many(state, staged, key)
        # Per-dispatch forced scalar readback (bench_art.py protocol): the axon
        # relay acks dispatches early, so queueing n dispatches with a single
        # block at the end under-counts by the relay's queue depth and the
        # derived host_share becomes meaningless.
        _ = float(m["train/loss"])
    dt = time.perf_counter() - t0
    report["dispatch_rays_per_sec"] = n * rays_per_dispatch / dt
    report["dispatch_ms_per_dispatch"] = 1e3 * dt / n

    # -- end-to-end trainer loop shape -------------------------------------
    t0 = time.perf_counter()
    for i in range(n):
        bs = draw((n + i) * t_disp)
        sb = stack_step_batches(bs, tr.mesh, microbatch=cfg.microbatch_rays)
        state, m = tr.system.train_many(state, sb, key)
        _ = float(m["train/loss"])  # force readback, as the trainer does
    dt = time.perf_counter() - t0
    report["end2end_rays_per_sec"] = n * rays_per_dispatch / dt
    report["end2end_ms_per_dispatch"] = 1e3 * dt / n

    host_ms = report["iterator_ms_per_dispatch"] + report["stage_ms_per_dispatch"]
    dev_ms = report["dispatch_ms_per_dispatch"]
    report["host_share_if_serial"] = host_ms / (host_ms + dev_ms)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

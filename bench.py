"""Benchmark: vanilla NeRF training throughput (rays/sec) on real hardware.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": R}

``vs_baseline`` is measured against the reference's nominal single-GPU
training rate.  The reference publishes no numbers (BASELINE.md), so the
baseline constant below is the reference's by-construction workload — 2048
rays/step at the measured step rate of the same MLP/sampling stack on one
RTX2080Ti (the hardware the reference README quotes) estimated at ~25k
rays/s; BASELINE.json's north star is >=10x the 8-GPU rate (~200k rays/s)
on a v5e-8, i.e. vs_baseline >= 80 per chip-8 or ~10 per chip.
"""

import json
import time

import numpy as np

# Estimated reference throughput (rays/s) for the vanilla config on its
# quoted hardware (1x RTX2080Ti, README.md:43): 2048-ray steps of a
# 64+193-sample 8x256 MLP pipeline. Not published upstream; documented here
# as the fixed normalization constant for vs_baseline.
REFERENCE_RAYS_PER_SEC = 25000.0


def main() -> None:
    import jax

    from aon_tpu.parallel import get_mesh, shard_ray_batch
    from aon_tpu.train.systems import VanillaSystem
    from aon_tpu.utils.config import Config

    batch = 8192
    cfg = Config(batch_size=batch, compute_dtype="bfloat16")
    mesh = get_mesh()
    system = VanillaSystem(cfg, near=2.0, far=6.0, white_bkgd=True)
    state = system.init_state(jax.random.PRNGKey(0))

    g = np.random.default_rng(0)
    d = g.normal(size=(batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    host_batch = {
        "rays_o": (d * -4.0).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(batch, 3)).astype(np.float32),
    }
    sharded = shard_ray_batch(host_batch, mesh, microbatch=cfg.microbatch_rays)

    # production path: T steps scanned per dispatch (see train/microbatch.py)
    from aon_tpu.parallel import stack_step_batches

    T = 8
    super_b = stack_step_batches([host_batch] * T, mesh, microbatch=cfg.microbatch_rays)

    # warmup / compile (2 calls: trace cache must be warm for the timed loop)
    key = jax.random.PRNGKey(1)
    for i in range(2):
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, i))
        _ = float(m["train/loss"])

    # NOTE: per-dispatch host readback of the scalar loss — through the axon
    # relay, block_until_ready alone acks before execution completes, which
    # inflates throughput ~1000x.  The readback makes timing honest (and
    # costs one scalar RTT per dispatch, slightly UNDER-stating peak rate).
    n_dispatch = 4
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, 10 + i))
        _ = float(m["train/loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = batch * T * n_dispatch / dt
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


if __name__ == "__main__":
    main()

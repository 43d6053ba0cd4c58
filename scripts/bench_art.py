"""Benchmark: ARTICULATED (auto-decoder) training throughput on real
hardware — the latent-conditioned deformation NeRF hot path
(reference model_autodecoder.py + sapien_multi 4096-ray items).

Usage: python scripts/bench_art.py [--batch 4096] [--fused v3|v2]
Prints one JSON line {"metric": "art_train_rays_per_sec", ...}.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--fused", default="v3", choices=["v3", "v2"])
    ap.add_argument("--steps_per_dispatch", type=int, default=8)
    args = ap.parse_args()

    import jax

    from aon_tpu.parallel import get_mesh, stack_step_batches
    from aon_tpu.train.systems import AutoDecoderSystem
    from aon_tpu.utils.config import Config

    batch = args.batch
    cfg = Config(
        exp_type="vanilla_autodecoder",
        batch_size=batch,
        compute_dtype="bfloat16",
        fused_train=args.fused,
    )
    mesh = get_mesh()
    system = AutoDecoderSystem(cfg, near=2.0, far=6.0, white_bkgd=False)
    state = system.init_state(jax.random.PRNGKey(0))

    g = np.random.default_rng(0)
    d = g.normal(size=(batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    host_batch = {
        "rays_o": (d * -4.0).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(batch, 3)).astype(np.float32),
        "instance_id": np.array(0),
        "articulation_id": np.array(1),
    }

    T = args.steps_per_dispatch
    super_b = stack_step_batches(
        [host_batch] * T, mesh, microbatch=cfg.microbatch_rays
    )

    key = jax.random.PRNGKey(1)
    for i in range(2):
        state, m = system.train_many(state, super_b, jax.random.fold_in(key, i))
        _ = float(m["train/loss"])  # forced readback (axon relay acks early)

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
                "metric": "art_train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "fused": args.fused,
            }
        )
    )


if __name__ == "__main__":
    main()

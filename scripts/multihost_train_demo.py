"""Multi-process data-parallel TRAIN validation (no hardware needed).

The reference's primary training mode is multi-process DDP — one process per
GPU with NCCL gradient all-reduce (``/root/reference/run.py:109,129,151``).
The TPU-native analogue is ``jax.distributed.initialize`` + ONE jitted train
step over a global mesh spanning all processes' devices: each process feeds
its local ray shard (``host_local_array_to_global_array``), XLA inserts the
gradient reductions, and every process holds identical replicated params.

This demo runs N local CPU processes on any of the three systems and writes
the final loss + a params digest; parity with the single-process run (same
global batch, same key) proves the cross-process train path end-to-end:

    # golden
    python scripts/multihost_train_demo.py --system ae --out /tmp/t_single.npz
    # 2-process
    python scripts/multihost_train_demo.py --system ae --num_processes 2 --process_id 0 --out /tmp/t_p0.npz &
    python scripts/multihost_train_demo.py --system ae --num_processes 2 --process_id 1 --out /tmp/t_p1.npz

Per-system cross-process risk surface (the reference's primary mode is
multi-process DDP for exactly the articulated systems, run.py:129,151):
  vanilla      -- MLP grads reduced across processes from sharded ray loss
  autodecoder  -- latent TABLE grads (code_library embeddings) reduced across
                  processes (model_autodecoder.py:604-606: one optimizer over
                  model + embeddings)
  ae           -- ResNet-34 encoder + deg-embedding + joint-state grads
                  reduced across processes; whole-batch masked-MSE denominator
                  must span all processes' rays (model_ae_art.py:380-387)

Driven by tests/test_multihost.py::test_multiprocess_train_matches_single.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# deterministic reductions so 1-proc and 2-proc runs agree tightly
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--coordinator", default="localhost:19244")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--system", default="vanilla",
                    choices=["vanilla", "autodecoder", "ae"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aon_tpu.train.systems import build_system
    from aon_tpu.utils.config import Config

    exp_type = {
        "vanilla": "vanilla",
        "autodecoder": "vanilla_autodecoder",
        "ae": "vanilla_ae_art",
    }[args.system]
    cfg = Config(
        exp_type=exp_type,
        N_samples=4,
        N_importance=4,
        compute_dtype="float32",
        use_pallas=False,
        N_max_objs=4,
        img_wh=(48, 48),  # AE encoder input size (keeps ResNet-34 cheap on CPU)
    )
    system = build_system(cfg, near=2.0, far=6.0, white_bkgd=(args.system == "vanilla"))

    devices = np.asarray(jax.devices())  # global device list, process-major
    mesh = Mesh(devices, ("data",))

    # identical fixed-seed params on every process -> a replicated global tree
    state = system.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params=multihost_utils.host_local_array_to_global_array(
            jax.tree.map(np.asarray, state.params), mesh, P()
        ),
        opt_state=multihost_utils.host_local_array_to_global_array(
            jax.tree.map(np.asarray, state.opt_state), mesh, P()
        ),
        step=multihost_utils.host_local_array_to_global_array(
            np.asarray(0, np.int32), mesh, P()
        ),
    )

    # the same GLOBAL batch on every process; each feeds its contiguous shard
    g = np.random.default_rng(0)
    B = args.batch
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    full = {
        "rays_o": (-4.0 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(B, 3)).astype(np.float32),
    }
    shared = {}  # replicated (non-ray) entries
    if args.system == "autodecoder":
        # exercises the latent-TABLE gradient reduction: every process's ray
        # loss back-propagates into the same code_library embedding rows
        shared["instance_id"] = np.asarray(1, np.int32)
        shared["articulation_id"] = np.asarray(2, np.int32)
    elif args.system == "ae":
        w, h = cfg.img_wh
        shared["src_imgs"] = g.normal(size=(1, 3, h, w)).astype(np.float32)
        shared["deg"] = np.asarray(0.7, np.float32)  # ~40 deg articulation
        full["instance_mask"] = (g.uniform(size=(B,)) > 0.5).astype(np.float32)
    pid, pc = jax.process_index(), jax.process_count()
    per = B // pc
    local = {k: v[pid * per : (pid + 1) * per] for k, v in full.items()}
    batch = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data")
    )
    batch.update(
        multihost_utils.host_local_array_to_global_array(shared, mesh, P())
    )

    key = jax.random.PRNGKey(7)
    loss = None
    for i in range(args.steps):
        state, metrics = system.train_step(state, batch, jax.random.fold_in(key, i))
        loss = metrics["train/loss"]

    # every process reads its addressable replica of the replicated outputs
    loss = float(jax.device_get(loss.addressable_data(0)))
    digest = float(
        sum(
            float(jnp.sum(jnp.abs(x.addressable_data(0))))
            for x in jax.tree.leaves(state.params)
        )
    )
    np.savez(args.out, loss=loss, params_digest=digest, processes=pc)
    print(f"p{pid}: loss={loss:.6f} params_digest={digest:.4f} processes={pc}")


if __name__ == "__main__":
    main()

"""Device mesh + sharding helpers (the TPU replacement for Lightning DDP).

The reference's only parallelism is data-parallel rays over NCCL
(``run.py:109,129,151``).  Here the equivalent is a 1-D ``jax.sharding.Mesh``
over all local/global devices with the ray batch sharded on axis ``"data"``
and params replicated; XLA inserts the gradient ``psum`` over ICI when the
jitted train step consumes a sharded batch and produces replicated grads.

Multi-host (DCN) runs initialize ``jax.distributed`` first (see
``maybe_initialize_distributed``); the same mesh code then spans all
processes' devices.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

# Batch entries with a leading per-ray axis (shardable over DATA_AXIS).
# Everything else (deg, instance_id, src_imgs, ...) is replicated.  The
# classification is BY KEY, not by shape: a shape heuristic misfiles e.g.
# (1, 3, H, W) src_imgs on a 1-device mesh (1 % 1 == 0 looks "shardable").
RAY_KEYS = (
    "rays_o", "rays_d", "viewdirs", "target", "instance_mask", "radii",
    "ray_ids", "t_near", "t_far", "hit", "loss_w",
)


def _is_ray_entry(k: str, v: np.ndarray, n_dev: int) -> bool:
    if k not in RAY_KEYS:
        return False
    if v.ndim < 1 or v.shape[0] % n_dev != 0 or v.shape[0] < n_dev:
        raise ValueError(
            f"ray entry '{k}' has batch axis {v.shape} not shardable over "
            f"{n_dev} devices"
        )
    return True


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX when launched under a cluster env.

    No-op for single-process runs (the common case on one TPU VM).
    """
    if os.environ.get("AON_DISTRIBUTED", "0") == "1" and jax.process_count() == 1:
        jax.distributed.initialize()


def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all) with axis name "data"."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad axis 0 up to a device-divisible length by repeating the last row.

    Fixed shapes are mandatory under jit; eval frames (e.g. 640*480 = 307200
    rays) must pad to a chip-divisible count before sharding.
    """
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(x, pad_width, mode="edge")


def stack_step_batches(
    batches, mesh: Mesh, microbatch: Optional[int] = None
) -> Dict[str, jax.Array]:
    """Stack T host batches into one superbatch for multi-step dispatch.

    Ray entries become (T, k, m, ...) sharded P(None, None, "data"); shared
    entries become (T, ...) replicated.  The train_many step scans axis 0.
    """
    import numpy as _np

    n_dev = mesh.devices.size
    micro_sharding = NamedSharding(mesh, P(None, None, DATA_AXIS))
    rep = replicated_sharding(mesh)
    out = {}
    for k in batches[0]:
        vs = _np.stack([_np.asarray(b[k]) for b in batches])
        v0 = vs[0]
        if _is_ray_entry(k, v0, n_dev):
            n = v0.shape[0]
            m = min(microbatch or n, n)
            if n % m != 0:
                raise ValueError(f"batch axis {n} not divisible by microbatch {m} ({k})")
            vs = vs.reshape(len(batches), n // m, m, *v0.shape[1:])
            out[k] = jax.device_put(vs, micro_sharding)
        else:
            out[k] = jax.device_put(vs, rep)
    return out


def shard_ray_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, microbatch: Optional[int] = None
) -> Dict[str, jax.Array]:
    """Device-put a host batch with rays sharded over the mesh.

    Scalar / per-batch entries (deg, instance_id, src_imgs, ...) are
    replicated; everything with a leading ray axis is sharded.

    When ``microbatch`` is given, ray entries are reshaped host-side to
    ``(k, microbatch, ...)`` and sharded ``P(None, "data")`` — each
    microbatch row spans all chips, so a ``lax.scan`` over axis 0 inside
    the train step (see train/microbatch.py) stays data-parallel.
    """
    rs = ray_sharding(mesh)
    rep = replicated_sharding(mesh)
    micro_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    n_dev = mesh.devices.size
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        is_ray = _is_ray_entry(k, v, n_dev)
        if is_ray and microbatch is not None:
            n = v.shape[0]
            m = min(microbatch, n)
            if n % m != 0:
                raise ValueError(f"batch axis {n} not divisible by microbatch {m} ({k})")
            out[k] = jax.device_put(v.reshape(n // m, m, *v.shape[1:]), micro_sharding)
        elif is_ray:
            out[k] = jax.device_put(v, rs)
        else:
            out[k] = jax.device_put(v, rep)
    return out

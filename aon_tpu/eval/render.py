"""Full-frame sharded rendering.

Replaces the reference's host-side chunk loops
(``model.py:295-348``, ``model_autodecoder.py:479-541``): rays are processed
in fixed-shape chunks (one jit compilation), each chunk sharded across the
mesh "data" axis so all chips render in parallel; the padded tail is
dropped after concatenation.  A 640x480 frame is 307,200 rays = a handful
of chunk calls.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from aon_tpu.parallel import pad_to_multiple, ray_sharding

import jax


def render_frame(
    render_chunk: Callable,
    frame: Dict[str, np.ndarray],
    mesh,
    chunk: int,
    **extra,
) -> Dict[str, np.ndarray]:
    """Render all rays of one frame.

    Args:
      render_chunk: jitted fn(rays_dict, **extra) -> dict of per-ray outputs.
      frame: host dict with rays_o/rays_d/viewdirs (N, 3) [+ target etc.].
      chunk: nominal rays per call (rounded up to a lane/device multiple).
    """
    n_dev = mesh.devices.size
    n = frame["rays_o"].shape[0]
    # chunk must divide evenly across devices and 8-sublane tiles
    mult = n_dev * 8
    chunk = max(mult, (chunk + mult - 1) // mult * mult)

    rays_full = {
        k: pad_to_multiple(np.asarray(frame[k]), chunk)
        for k in ("rays_o", "rays_d", "viewdirs")
    }
    n_pad = rays_full["rays_o"].shape[0]
    rs = ray_sharding(mesh)

    outs: Dict[str, list] = {}
    for i in range(0, n_pad, chunk):
        rays = {
            k: jax.device_put(v[i : i + chunk], rs) for k, v in rays_full.items()
        }
        res = render_chunk(rays, **extra)
        for k, v in res.items():
            outs.setdefault(k, []).append(np.asarray(v))
    return {k: np.concatenate(v, 0)[:n] for k, v in outs.items()}

"""Full-frame sharded rendering.

Replaces the reference's host-side chunk loops
(``model.py:295-348``, ``model_autodecoder.py:479-541``): rays are processed
in fixed-shape chunks (one jit compilation), each chunk sharded across the
mesh "data" axis so all chips render in parallel; the padded tail is
dropped after concatenation.  A 640x480 frame is 307,200 rays = a handful
of chunk calls.

AABB fast path (``data/aabb.py``): when the frame carries a per-ray ``hit``
mask and a ``miss_fill`` dict is given, only hit rays go through the model
— the model is empty outside the scene AABB, so missed rays ARE the
background.  On the measured laptop scene that skips >80% of the frame.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from aon_tpu.parallel import pad_to_multiple, ray_sharding

import jax

# per-ray frame entries forwarded to the renderer when present
_RAY_INPUT_KEYS = ("rays_o", "rays_d", "viewdirs", "t_near", "t_far")


def _render_rays(
    render_chunk: Callable, rays_in: Dict[str, np.ndarray], mesh, chunk: int, **extra
) -> Dict[str, np.ndarray]:
    n_dev = mesh.devices.size
    n = rays_in["rays_o"].shape[0]
    # chunk must divide evenly across devices and 8-sublane tiles
    mult = n_dev * 8
    chunk = max(mult, (chunk + mult - 1) // mult * mult)

    rays_full = {k: pad_to_multiple(np.asarray(v), chunk) for k, v in rays_in.items()}
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
    return {
        k: (np.concatenate(v, 0)[:n] if v[0].ndim >= 1 and v[0].shape[0] == chunk
            else np.concatenate([np.atleast_1d(x) for x in v], 0))
        for k, v in outs.items()
    }


def render_frame(
    render_chunk: Callable,
    frame: Dict[str, np.ndarray],
    mesh,
    chunk: int,
    miss_fill: Optional[Dict[str, float]] = None,
    **extra,
) -> Dict[str, np.ndarray]:
    """Render all rays of one frame.

    Args:
      render_chunk: jitted fn(rays_dict, **extra) -> dict of per-ray outputs.
      frame: host dict with rays_o/rays_d/viewdirs (N, 3) [+ t_near/t_far/hit].
      chunk: nominal rays per call (rounded up to a lane/device multiple).
      miss_fill: per-output fill value for rays with ``frame["hit"] == False``;
        enables the AABB compaction path (only hit rays are rendered).
    """
    rays_in = {k: np.asarray(frame[k]) for k in _RAY_INPUT_KEYS if k in frame}
    n = rays_in["rays_o"].shape[0]

    if miss_fill is None or "hit" not in frame:
        return _render_rays(render_chunk, rays_in, mesh, chunk, **extra)

    sel = np.flatnonzero(np.asarray(frame["hit"]))
    proto = _render_rays(
        render_chunk, {k: v[sel] for k, v in rays_in.items()}, mesh, chunk, **extra
    ) if len(sel) else {}
    outs: Dict[str, np.ndarray] = {}
    for k, v in proto.items():
        if v.ndim >= 1 and v.shape[0] == len(sel):  # per-ray output: scatter
            # outputs without an explicit miss value fill with NaN, not 0:
            # a silent 0-fill shrinks whole-frame means by the hit fraction
            # (this bit val/state_error_rad — pred_state is per-ray-constant)
            default = np.nan if np.issubdtype(v.dtype, np.floating) else 0
            full = np.full((n, *v.shape[1:]), miss_fill.get(k, default), v.dtype)
            full[sel] = v
            outs[k] = full
        else:  # per-frame output (e.g. pred_state): pass through
            outs[k] = v
    if not outs:  # frame entirely misses the box
        outs = {
            k: np.full((n, 3) if k == "comp_rgb" else (n,), f, np.float32)
            for k, f in miss_fill.items()
        }
    return outs

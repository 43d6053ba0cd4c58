"""Camera/ray generation (host-side numpy; datasets feed fixed-shape batches).

Conventions match the reference (``/root/reference/datasets/ray_utils.py``):

* ``get_ray_directions`` (ray_utils.py:71-90): pinhole directions WITHOUT
  +0.5 pixel centering, x right / y up / z backwards:
  ``[(i - W/2)/f, -(j - H/2)/f, -1]``.
* ``get_rays`` (ray_utils.py:118-159): world-space origins and directions.
  NOTE (PSNR-relevant parity quirk): the reference normalizes ``viewdirs``
  IN PLACE on a tensor aliased with ``rays_d`` (ray_utils.py:146-147), so
  both returned direction fields are unit-norm.  We reproduce that contract
  explicitly: ``rays_d`` and ``viewdirs`` returned here are both normalized.
  Mip-style ``radii`` are computed from the UNnormalized neighbor-pixel
  deltas (ray_utils.py:139-143), also matching the reference.
* ``create_spheric_poses`` (datasets/sapien_multi.py:29-72): 40-pose
  spherical test path at phi=-30deg (the articulated test loader consumes
  the first 19).
* ``ray_box_intersection``: vectorized slab test replacing the reference's
  numba kernels (ray_utils.py:15-65) — same semantics including the
  "origin inside box returns no-hit" caveat.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def get_ray_directions(H: int, W: int, focal: float) -> np.ndarray:
    """Per-pixel ray directions in camera coords, shape (H, W, 3)."""
    j, i = np.meshgrid(
        np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij"
    )
    directions = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], axis=-1
    )
    return directions.astype(np.float32)


def get_rays(
    directions: np.ndarray,
    c2w: np.ndarray,
    output_view_dirs: bool = False,
    output_radii: bool = False,
):
    """World-space rays for one camera.

    Args:
      directions: (H, W, 3) camera-frame directions from get_ray_directions.
      c2w: (3, 4) camera-to-world matrix.

    Returns (flattened to (H*W, ...)):
      output_view_dirs=False: (rays_o, rays_d_normalized)
      output_view_dirs=True:  (rays_o, viewdirs, rays_d, [radii]) where BOTH
      viewdirs and rays_d are normalized (see module docstring for why).
    """
    c2w = np.asarray(c2w, dtype=np.float32)
    rays_d_raw = directions @ c2w[:, :3].T  # (H, W, 3), unnormalized
    rays_o = np.broadcast_to(c2w[:, 3], rays_d_raw.shape)

    radii = None
    if output_radii:
        dx = np.sqrt(np.sum((rays_d_raw[:-1, :, :] - rays_d_raw[1:, :, :]) ** 2, axis=-1))
        dx = np.concatenate([dx, dx[-2:-1, :]], axis=0)
        radii = (dx[..., None] * 2.0 / np.sqrt(12.0)).reshape(-1).astype(np.float32)

    norm = np.linalg.norm(rays_d_raw, axis=-1, keepdims=True)
    unit = (rays_d_raw / norm).astype(np.float32)
    rays_o = np.ascontiguousarray(rays_o.reshape(-1, 3), dtype=np.float32)

    if output_view_dirs:
        viewdirs = unit.reshape(-1, 3)
        rays_d = viewdirs.copy()  # reference aliasing: rays_d is ALSO normalized
        if output_radii:
            return rays_o, viewdirs, rays_d, radii
        return rays_o, viewdirs, rays_d
    else:
        return rays_o, unit.reshape(-1, 3)


def get_ndc_rays(
    H: int, W: int, focal: float, near: float, rays_o: np.ndarray, rays_d: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """World -> NDC ray transform (reference ray_utils.py:187-228)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return np.stack([o0, o1, o2], -1), np.stack([d0, d1, d2], -1)


def create_spheric_poses(radius: float = 4.0, n_poses: int = 40) -> np.ndarray:
    """Spherical camera path (reference datasets/sapien_multi.py:29-72).

    Returns (n_poses, 4, 4) c2w matrices at phi = -30 degrees, theta swept
    over [-180, 180).
    """

    def trans_t(t):
        m = np.eye(4, dtype=np.float64)
        m[2, 3] = t
        return m

    def rot_phi(phi):
        m = np.eye(4, dtype=np.float64)
        m[1, 1] = np.cos(phi)
        m[1, 2] = -np.sin(phi)
        m[2, 1] = np.sin(phi)
        m[2, 2] = np.cos(phi)
        return m

    def rot_theta(th):
        m = np.eye(4, dtype=np.float64)
        m[0, 0] = np.cos(th)
        m[0, 2] = -np.sin(th)
        m[2, 0] = np.sin(th)
        m[2, 2] = np.cos(th)
        return m

    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float64
    )

    def pose_spherical(theta_deg, phi_deg, r):
        c2w = trans_t(r)
        c2w = rot_phi(phi_deg / 180.0 * np.pi) @ c2w
        c2w = rot_theta(theta_deg / 180.0 * np.pi) @ c2w
        return flip @ c2w

    angles = np.linspace(-180.0, 180.0, n_poses + 1)[:-1]
    poses = np.stack([pose_spherical(a, -30.0, radius) for a in angles], axis=0)
    return poses.astype(np.float32)


def ray_box_intersection(
    bounds: np.ndarray, rays_o: np.ndarray, rays_d: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ray/AABB slab test (replaces reference numba kernels).

    Args:
      bounds: (2, 3) [min_corner, max_corner].
      rays_o, rays_d: (N, 3).

    Returns (hit (N,) bool, t_near (N,), t_far (N,)); misses (including
    origins inside the box, matching reference ray_utils.py:62-64) report
    hit=False with t values of 0.
    """
    rays_d = np.where(rays_d == 0, 1.0e-14, rays_d)
    invdir = 1.0 / rays_d
    lo = (bounds[0] - rays_o) * invdir
    hi = (bounds[1] - rays_o) * invdir
    tmin_axis = np.minimum(lo, hi)
    tmax_axis = np.maximum(lo, hi)
    tmin = tmin_axis.max(axis=-1)
    tmax = tmax_axis.min(axis=-1)
    hit = (tmin <= tmax) & (tmin >= 0) & (tmax >= 0)
    tnear = np.where(hit, tmin, 0.0)
    tfar = np.where(hit, tmax, 0.0)
    return hit, tnear, tfar


def effective_intervals(batch, near, far):
    """Per-ray sampling interval, with optional tightening anneal.

    Returns ``(t_near, t_far)`` for a train batch: the AABB/occ-tightened
    per-ray bounds when present (``use_aabb``/``use_occgrid``), else the
    global scalars.  When the trainer additionally injects the shared scalar
    ``interval_ramp`` (``Config.aabb_warmup_steps``), the tightened bounds
    are lerped from the global ``[near, far]`` (ramp=0) to fully tightened
    (ramp=1).

    Why: tightening from step 0 traps the auto-encoder system in an opaque
    box-shaped blob — every sample lands inside the scene AABB, the masked
    MSE (reference model_ae_art.py:380-387) builds density that the
    acc-as-logits opacity BCE (model_ae_art.py:646-663) can no longer melt,
    because interior samples are transmittance-shadowed (dacc/dsigma_i ~ T_i
    ~ 0 once the box saturates).  Starting at the global interval reproduces
    the untightened run's fog-free establishment, then annealing
    concentrates samples only after free space has been carved.
    """
    t_near = batch.get("t_near", near)
    t_far = batch.get("t_far", far)
    ramp = batch.get("interval_ramp")
    if ramp is not None:
        t_near = near + ramp * (t_near - near)
        t_far = far + ramp * (t_far - far)
    return t_near, t_far

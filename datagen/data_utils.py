"""Data-generation utilities: camera pose sampling, look-at extrinsics,
frame capture, transforms.json writing.

Contracts from reference ``datagen/data_utils.py``:
  * random sphere poses: radius 4 +/- 0.5, z clamped positive
    (data_utils.py:66-80);
  * look-at extrinsics toward the origin with +z up (data_utils.py:105-115);
  * per-frame RGBA with alpha zeroed outside the segmentation mask
    (data_utils.py:135-138), uint16 depth = -position.z * 1000
    (data_utils.py:89-95);
  * ``transforms.json = {focal/camera_angle_x, frames: {r_i: model_matrix}}``
    (data_utils.py:199-241).

The pose/extrinsic math is pure numpy (tested without SAPIEN); only the
capture functions need a live SAPIEN scene.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def sample_sphere_points(
    n: int, radius: float = 4.0, jitter: float = 0.5, seed: Optional[int] = None
) -> np.ndarray:
    """n random points on a sphere shell of radius +/- jitter, z > 0."""
    g = np.random.default_rng(seed)
    pts = g.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts[:, 2] = np.abs(pts[:, 2])  # camera above the ground plane
    r = radius + g.uniform(-jitter, jitter, size=(n, 1))
    return (pts * r).astype(np.float64)


def look_at_c2w(eye: np.ndarray, target: np.ndarray = None, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera-to-world (4, 4) looking from eye at target, OpenGL convention
    (x right, y up, -z forward) — matches the ray conventions in
    aon_tpu/core/rays.py."""
    eye = np.asarray(eye, np.float64)
    target = np.zeros(3) if target is None else np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    if abs(fwd @ up) > 0.999:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


def depth_to_uint16(position_z: np.ndarray) -> np.ndarray:
    """SAPIEN position buffer z (negative forward) -> uint16 millimeters
    (reference data_utils.py:89-95)."""
    return np.clip(-position_z * 1000.0, 0, 65535).astype(np.uint16)


def mask_rgba(rgba: np.ndarray, seg_mask: np.ndarray) -> np.ndarray:
    """Zero alpha outside the segmentation mask (data_utils.py:135-138)."""
    out = rgba.copy()
    out[..., 3] = np.where(seg_mask, out[..., 3], 0)
    return out


def write_transforms(
    path: str, frames: Dict[str, np.ndarray], focal: Optional[float] = None,
    camera_angle_x: Optional[float] = None,
) -> None:
    meta: Dict = {"frames": {k: np.asarray(v).tolist() for k, v in frames.items()}}
    if focal is not None:
        meta["focal"] = float(focal)
    if camera_angle_x is not None:
        meta["camera_angle_x"] = float(camera_angle_x)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(meta, fh, indent=2)


def save_pose_set(path: str, poses: np.ndarray) -> None:
    np.save(path, np.asarray(poses))


def load_pose_set(path: str) -> np.ndarray:
    return np.load(path)

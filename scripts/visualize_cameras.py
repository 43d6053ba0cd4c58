"""Camera-pose visualizer for SAPIEN-layout datasets (matplotlib, headless).

Replaces the reference's offline open3d debuggers
(``visualize_nerf/visualize_cameras_sapien.py`` and friends, ~9.3k LoC of
per-dataset scripts) with one dataset-agnostic tool: reads any
``transforms.json`` tree, plots camera frusta + look directions in 3D, and
saves a PNG (no display needed).

Usage:
  python scripts/visualize_cameras.py DATA_ROOT [--split train] [--out cams.png]
  python scripts/visualize_cameras.py MULTI_ROOT --instance obj_a --degree 0 ...
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def load_poses(root: str, split: str, instance: str = None, degree: int = None):
    if instance is not None:
        base = os.path.join(root, instance, "train", f"{degree}_degree")
    else:
        base = os.path.join(root, split)
    with open(os.path.join(base, "transforms.json")) as fh:
        meta = json.load(fh)
    poses = np.stack([np.array(m, np.float32) for m in meta["frames"].values()])
    return poses


def plot_cameras(poses: np.ndarray, out: str, axis_len: float = 0.5):
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    centers = poses[:, :3, 3]
    ax.scatter(*centers.T, c="k", s=12, label="camera centers")
    colors = ["r", "g", "b"]  # x right, y up, z backward
    for pose in poses:
        o = pose[:3, 3]
        for i, c in enumerate(colors):
            d = pose[:3, i] * axis_len
            ax.plot([o[0], o[0] + d[0]], [o[1], o[1] + d[1]], [o[2], o[2] + d[2]], c, lw=0.8)
        fwd = -pose[:3, 2] * axis_len * 2
        ax.plot([o[0], o[0] + fwd[0]], [o[1], o[1] + fwd[1]], [o[2], o[2] + fwd[2]],
                "c--", lw=0.6)
    ax.scatter([0], [0], [0], c="orange", s=80, marker="*", label="object origin")
    lim = np.abs(centers).max() * 1.2
    for setter in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        setter(-lim, lim)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    ax.legend()
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out} ({len(poses)} cameras)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--split", default="train")
    ap.add_argument("--instance", default=None)
    ap.add_argument("--degree", type=int, default=0)
    ap.add_argument("--out", default="cameras.png")
    args = ap.parse_args()
    poses = load_poses(args.root, args.split, args.instance, args.degree)
    plot_cameras(poses, args.out)


if __name__ == "__main__":
    main()

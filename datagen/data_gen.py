"""SAPIEN dataset generation (offline, CPU-side — not a TPU workload).

Preserves the reference's public surface (``datagen/data_gen.py:6-32``):

    python datagen/data_gen.py --config config/data_gen_random_pose.json

JSON config keys (validated like the reference): ``urdf_file``,
``output_dir``, ``resolution`` [w, h]; optional ``render_pose_path``
(replay-from-saved-poses mode, data_gen.py:244-288 analogue), ``splits``
(default {train: 100, test: 50, val: 50}), ``joint_degrees`` (articulated
sweep, writes ``{deg}_degree`` subtrees), ``seed``.

Camera: fovy 35 degrees, near 0.1 far 100, random sphere poses radius
4 +/- 0.5 looking at the object (data_gen.py:57-67, 79-83).

The SAPIEN engine import is gated: this image does not ship the ``sapien``
pip package, so invoking rendering raises a clear error; the pose math and
transforms.json layout are importable and tested regardless
(see datagen/data_utils.py and tests/test_datagen.py).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from typing import Dict, Optional

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datagen.data_utils import (  # noqa: E402
    look_at_c2w,
    mask_rgba,
    sample_sphere_points,
    write_transforms,
)

FOVY_DEG = 35.0
NEAR, FAR = 0.1, 100.0
DEFAULT_SPLITS = {"train": 100, "test": 50, "val": 50}


def parse_config(path: str) -> Dict:
    with open(path) as fh:
        cfg = json.load(fh)
    required = ["urdf_file", "output_dir"]
    missing = [k for k in required if k not in cfg]
    if missing:
        raise ValueError(
            f"Required argument(s) {', '.join(missing)} not found in the JSON configuration"
        )
    cfg.setdefault("resolution", [640, 480])
    cfg.setdefault("splits", DEFAULT_SPLITS)
    cfg.setdefault("seed", 0)
    return cfg


def focal_from_fovy(height: int, fovy_deg: float = FOVY_DEG) -> float:
    return 0.5 * height / math.tan(0.5 * math.radians(fovy_deg))


def _cax_for_loader(width: int, fovy_deg: float = FOVY_DEG) -> float:
    """camera_angle_x value whose round-trip through the multi loader's
    quirky focal formula — 0.5*h/tan(cax/2) * (w/320), reference
    sapien_multi.py:115-116 — yields the true render focal at this width.
    Identity (cax = fovy) at the reference's native w=320."""
    return 2.0 * math.atan(math.tan(0.5 * math.radians(fovy_deg)) * width / 320.0)


def generate_poses(cfg: Dict) -> Dict[str, np.ndarray]:
    """Per-split (n, 4, 4) c2w pose arrays (random-sphere or replayed)."""
    if cfg.get("render_pose_path"):
        poses = np.load(cfg["render_pose_path"])
        return {"render": poses}
    out = {}
    seed = cfg["seed"]
    for split, n in cfg["splits"].items():
        pts = sample_sphere_points(n, seed=seed)
        out[split] = np.stack([look_at_c2w(p) for p in pts])
        seed += 1
    return out


def render_with_sapien(cfg: Dict) -> None:
    """Offscreen URDF rendering.

    Backends (config key ``backend``):
      * ``"sapien"`` (default): the real SAPIEN engine (external C++ pkg);
      * ``"soft"``: the built-in software ray tracer (datagen/softsim.py),
        which implements the same API slice — the loop below is identical
        either way, so the render path has real runtime coverage even on
        images without the sapien package.
    """
    backend = cfg.get("backend", "sapien")
    if backend == "soft":
        from datagen import softsim as sapien
    else:
        try:
            import sapien.core as sapien
        except ImportError as e:
            raise RuntimeError(
                "The 'sapien' package is not installed in this image. Either "
                "install sapien on a CPU machine and re-run, or set "
                '"backend": "soft" in the config to use the built-in '
                "software ray tracer (URDF box geometry)."
            ) from e

    w, h = cfg["resolution"]
    engine = sapien.Engine()
    renderer = sapien.SapienRenderer(offscreen_only=True)
    engine.set_renderer(renderer)
    scene = engine.create_scene()
    scene.set_timestep(1 / 100.0)
    scene.set_ambient_light([0.5, 0.5, 0.5])
    scene.add_directional_light([0, 1, -1], [0.9, 0.9, 0.9])

    loader = scene.create_urdf_loader()
    loader.fix_root_link = True
    asset = loader.load_kinematic(cfg["urdf_file"])
    if asset is None:
        raise RuntimeError(f"failed to load URDF: {cfg['urdf_file']}")

    joint_degrees = cfg.get("joint_degrees", [None])
    poses_by_split = generate_poses(cfg)

    cam = scene.add_camera("cam", width=w, height=h, fovy=math.radians(FOVY_DEG),
                           near=NEAR, far=FAR)
    focal = cam.fy if hasattr(cam, "fy") else focal_from_fovy(h)

    def render_one(c2w):
        cam.set_pose(sapien.Pose.from_transformation_matrix(c2w))
        scene.step()
        scene.update_render()
        cam.take_picture()
        rgba = (cam.get_float_texture("Color") * 255).astype(np.uint8)
        seg = cam.get_uint32_texture("Segmentation")[..., 1]
        position = cam.get_float_texture("Position")
        return mask_rgba(rgba, seg > 0), seg, position

    def write_frame(base, name, rgba, seg, position):
        from PIL import Image

        from datagen.data_utils import depth_to_uint16

        Image.fromarray(rgba, "RGBA").save(os.path.join(base, "rgb", f"{name}.png"))
        Image.fromarray((seg > 0).astype(np.uint8) * 255, "L").save(
            os.path.join(base, "seg", f"{name}.png")
        )
        Image.fromarray(depth_to_uint16(position[..., 2]), "I;16").save(
            os.path.join(base, "depth", f"{name}.png")
        )

    for deg in joint_degrees:
        pose_deg = deg if deg is not None else cfg.get("qpos_deg")
        if pose_deg is not None and asset.dof > 0:
            qpos = np.zeros(asset.dof)
            qpos[0] = math.radians(pose_deg)
            asset.set_qpos(qpos)
        for split, poses in poses_by_split.items():
            if deg is None:
                base = os.path.join(cfg["output_dir"], split)
            else:
                base = os.path.join(cfg["output_dir"], split, f"{deg}_degree")
            os.makedirs(os.path.join(base, "rgb"), exist_ok=True)
            os.makedirs(os.path.join(base, "seg"), exist_ok=True)
            os.makedirs(os.path.join(base, "depth"), exist_ok=True)
            frames = {}
            for i, c2w in enumerate(poses):
                rgba, seg, position = render_one(c2w)
                name = f"r_{i}"
                write_frame(base, name, rgba, seg, position)
                frames[name] = c2w
            if deg is None:
                # single-scene loaders use the literal focal unrescaled
                write_transforms(os.path.join(base, "transforms.json"), frames, focal=focal)
            else:
                # sapien_multi derives focal as 0.5*h/tan(cax/2) * (w/320)
                # (the reference quirk, sapien_multi.py:115-116) — invert
                # that formula so the loader recovers the TRUE render focal
                # at ANY generation resolution (reduces to cax=fovy at
                # w=320, so the committed 320x240 digests are unchanged)
                write_transforms(
                    os.path.join(base, "transforms.json"), frames,
                    camera_angle_x=_cax_for_loader(w),
                )

    # Ground-truthed articulation sweep ("test_spheric"): the reference's
    # test split renders spheric poses with INTERPOLATED articulations but
    # scores them against train-split 0_degree images at UNRELATED poses —
    # the true-pose line is commented out upstream
    # (/root/reference/datasets/sapien_multi.py:333), so its test PSNR is
    # pose-mismatched by construction.  Here datagen can render the real
    # thing: frame i at create_spheric_poses(radius=4)[i] with the joint at
    # max_degree * i/(n-1) (5-degree steps for n=19), giving the sweep an
    # honest GT.  Loaded by sapien_multi.test_frame when present.
    ts = cfg.get("test_spheric")
    if ts and asset.dof > 0:
        from aon_tpu.core.rays import create_spheric_poses

        n = int(ts.get("n_frames", 19))
        max_deg = float(ts.get("max_degree", 90.0))
        spheric = create_spheric_poses(radius=4.0)
        base = os.path.join(cfg["output_dir"], "test_spheric")
        for sub in ("rgb", "seg", "depth"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        frames = {}
        degs = {}
        for i in range(n):
            qpos = np.zeros(asset.dof)
            deg_i = max_deg * i / max(1, n - 1)
            qpos[0] = math.radians(deg_i)
            asset.set_qpos(qpos)
            c2w = spheric[i]
            rgba, seg, position = render_one(c2w)
            name = f"r_{i}"
            write_frame(base, name, rgba, seg, position)
            frames[name] = c2w
            degs[name] = deg_i
        write_transforms(
            os.path.join(base, "transforms.json"), frames,
            camera_angle_x=_cax_for_loader(w),
        )
        # record the per-frame articulation next to the poses
        with open(os.path.join(base, "transforms.json")) as fh:
            meta = json.load(fh)
        meta["joint_degrees"] = degs
        with open(os.path.join(base, "transforms.json"), "w") as fh:
            json.dump(meta, fh, indent=2)
    print(f"wrote dataset under {cfg['output_dir']}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument(
        "--poses_only", action="store_true",
        help="only write per-split pose .npy + transforms.json (no SAPIEN needed)",
    )
    args = ap.parse_args()
    cfg = parse_config(args.config)

    if args.poses_only:
        for split, poses in generate_poses(cfg).items():
            base = os.path.join(cfg["output_dir"], split)
            os.makedirs(base, exist_ok=True)
            np.save(os.path.join(base, "poses.npy"), poses)
            frames = {f"r_{i}": poses[i] for i in range(len(poses))}
            focal = focal_from_fovy(cfg["resolution"][1])
            write_transforms(os.path.join(base, "transforms.json"), frames, focal=focal)
        print(f"wrote poses under {cfg['output_dir']}")
        return
    render_with_sapien(cfg)


if __name__ == "__main__":
    main()

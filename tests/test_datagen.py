"""Datagen tests: pose math and output layout (SAPIEN-free paths)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from datagen import data_utils  # noqa: E402
from datagen.data_gen import focal_from_fovy, generate_poses, parse_config  # noqa: E402


def test_sample_sphere_points_radius_and_hemisphere():
    pts = data_utils.sample_sphere_points(200, radius=4.0, jitter=0.5, seed=0)
    r = np.linalg.norm(pts, axis=-1)
    assert (r >= 3.5 - 1e-6).all() and (r <= 4.5 + 1e-6).all()
    assert (pts[:, 2] >= 0).all()  # cameras above ground


def test_look_at_c2w_orthonormal_and_facing():
    eye = np.array([3.0, 1.0, 2.0])
    c2w = data_utils.look_at_c2w(eye)
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(c2w[:3, 3], eye)
    # -z column points from eye toward origin
    fwd = -R[:, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-8)


def test_depth_and_mask_helpers():
    z = np.array([[-1.0, -2.5], [0.5, -70.0]])
    d = data_utils.depth_to_uint16(z)
    assert d.dtype == np.uint16
    assert d[0, 0] == 1000 and d[0, 1] == 2500 and d[1, 0] == 0

    rgba = np.full((2, 2, 4), 200, np.uint8)
    seg = np.array([[True, False], [False, True]])
    out = data_utils.mask_rgba(rgba, seg)
    assert out[0, 0, 3] == 200 and out[0, 1, 3] == 0


def test_parse_config_validation(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"urdf_file": "x.urdf"}))
    with pytest.raises(ValueError, match="output_dir"):
        parse_config(str(bad))

    good = tmp_path / "good.json"
    good.write_text(json.dumps({"urdf_file": "x.urdf", "output_dir": str(tmp_path)}))
    cfg = parse_config(str(good))
    assert cfg["resolution"] == [640, 480]
    assert cfg["splits"] == {"train": 100, "test": 50, "val": 50}


def test_generate_poses_splits_and_replay(tmp_path):
    cfg = {
        "urdf_file": "x.urdf", "output_dir": str(tmp_path),
        "splits": {"train": 5, "val": 2}, "seed": 0, "resolution": [64, 48],
    }
    poses = generate_poses(cfg)
    assert poses["train"].shape == (5, 4, 4)
    assert poses["val"].shape == (2, 4, 4)
    # replay mode
    np.save(tmp_path / "saved.npy", poses["train"])
    cfg["render_pose_path"] = str(tmp_path / "saved.npy")
    replayed = generate_poses(cfg)
    np.testing.assert_array_equal(replayed["render"], poses["train"])


def test_poses_only_cli(tmp_path):
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "urdf_file": "nonexistent.urdf",
        "output_dir": str(tmp_path / "out"),
        "resolution": [64, 48],
        "splits": {"train": 3},
    }))
    r = subprocess.run(
        [sys.executable, str(REPO / "datagen/data_gen.py"), "--config", str(cfg_path),
         "--poses_only"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    meta = json.loads((tmp_path / "out/train/transforms.json").read_text())
    assert len(meta["frames"]) == 3
    np.testing.assert_allclose(
        meta["focal"], focal_from_fovy(48), rtol=1e-6
    )

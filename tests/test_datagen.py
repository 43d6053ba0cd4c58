"""Datagen tests: pose math and output layout (SAPIEN-free paths)."""

import json
import math
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


def test_render_loop_with_mocked_sapien(tmp_path, monkeypatch):
    """Exercises the full render_with_sapien path (reference
    data_utils.py:117-242 analogue) with a fake sapien module: texture ->
    rgb/seg/depth PNG bytes + transforms.json, per joint degree and split."""
    import sys
    import types

    import numpy as np
    from PIL import Image

    W, H = 16, 12

    class FakePose:
        def __init__(self, m):
            self.m = m

        @staticmethod
        def from_transformation_matrix(m):
            return FakePose(m)

    class FakeCamera:
        fy = 19.77

        def set_pose(self, pose):
            self.pose = pose

        def take_picture(self):
            pass

        def get_float_texture(self, name):
            if name == "Color":
                rgba = np.zeros((H, W, 4), np.float32)
                rgba[..., 0] = 0.5
                rgba[..., 3] = 1.0
                return rgba
            assert name == "Position"
            pos = np.zeros((H, W, 4), np.float32)
            pos[..., 2] = -3.25  # 3.25 m in front of the camera
            return pos

        def get_uint32_texture(self, name):
            assert name == "Segmentation"
            seg = np.zeros((H, W, 2), np.uint32)
            seg[4:8, 6:10, 1] = 7  # actor id 7 blob
            return seg

    class FakeScene:
        def set_timestep(self, dt): pass
        def set_ambient_light(self, c): pass
        def add_directional_light(self, d, c): pass
        def create_urdf_loader(self):
            return types.SimpleNamespace(
                fix_root_link=True,
                load_kinematic=lambda path: types.SimpleNamespace(
                    dof=1, set_qpos=lambda q: None
                ),
            )
        def add_camera(self, name, width, height, fovy, near, far):
            assert (width, height) == (W, H)
            return FakeCamera()
        def step(self): pass
        def update_render(self): pass

    class FakeEngine:
        def set_renderer(self, r): pass
        def create_scene(self): return FakeScene()

    fake_core = types.SimpleNamespace(
        Engine=FakeEngine,
        SapienRenderer=lambda offscreen_only: object(),
        Pose=FakePose,
    )
    fake_pkg = types.ModuleType("sapien")
    fake_pkg.core = fake_core
    monkeypatch.setitem(sys.modules, "sapien", fake_pkg)
    monkeypatch.setitem(sys.modules, "sapien.core", fake_core)

    from datagen.data_gen import render_with_sapien

    cfg = {
        "urdf_file": "fake.urdf",
        "output_dir": str(tmp_path / "out"),
        "resolution": [W, H],
        "splits": {"train": 2, "val": 1},
        "joint_degrees": [0, 30],
        "seed": 0,
    }
    render_with_sapien(cfg)

    for split, n in (("train", 2), ("val", 1)):
        for deg in (0, 30):
            base = tmp_path / "out" / split / f"{deg}_degree"
            meta = json.loads((base / "transforms.json").read_text())
            # articulated sweeps store the camera_angle_x whose round-trip
            # through the loader's quirky focal formula —
            # 0.5*h/tan(0.5*cax) * (w/320), sapien_multi.py:115 — recovers
            # the TRUE render focal at ANY generation width (identity
            # cax=fovy only at w=320)
            cax = meta["camera_angle_x"]
            assert cax == pytest.approx(
                2.0 * math.atan(math.tan(0.5 * math.radians(35.0)) * W / 320.0)
            )
            loader_focal = 0.5 * H / math.tan(0.5 * cax) * (W / 320.0)
            render_focal = 0.5 * H / math.tan(0.5 * math.radians(35.0))
            assert loader_focal == pytest.approx(render_focal)
            assert set(meta["frames"]) == {f"r_{i}" for i in range(n)}
            rgba = np.asarray(Image.open(base / "rgb" / "r_0.png"))
            assert rgba.shape == (H, W, 4)
            # alpha zeroed outside the seg mask, kept inside
            assert rgba[0, 0, 3] == 0 and rgba[5, 7, 3] == 255
            seg = np.asarray(Image.open(base / "seg" / "r_0.png"))
            assert seg[5, 7] == 255 and seg[0, 0] == 0
            depth = np.asarray(Image.open(base / "depth" / "r_0.png"))
            assert depth.dtype == np.int32 or depth.dtype == np.uint16
            assert int(depth[0, 0]) == 3250  # -z * 1000 mm


def test_soft_backend_test_spheric_split_and_honest_gt(tmp_path):
    """"test_spheric" datagen split: frame i rendered AT the spheric pose i
    with the joint at max_degree*i/(n-1), plus per-frame joint_degrees in
    transforms.json; SapienDatasetMulti.test_frame then scores the sweep
    against this honest GT instead of the reference's pose-mismatched
    train-0_degree images (reference sapien_multi.py:333, true-pose line
    commented out upstream)."""
    from aon_tpu.data import SapienDatasetMulti
    from datagen.data_gen import render_with_sapien

    root = tmp_path / "multi"
    inst = root / "obj_0"
    cfg = {
        "urdf_file": str(REPO / "datagen/assets/laptop.urdf"),
        "output_dir": str(inst),
        "resolution": [32, 24],
        "splits": {"train": 2},
        "joint_degrees": [0, 90],
        "backend": "soft",
        "seed": 5,
        "test_spheric": {"n_frames": 3, "max_degree": 90},
    }
    render_with_sapien(cfg)

    meta = json.load(open(inst / "test_spheric" / "transforms.json"))
    assert len(meta["frames"]) == 3
    np.testing.assert_allclose(
        [meta["joint_degrees"][f"r_{i}"] for i in range(3)], [0.0, 45.0, 90.0]
    )

    ds = SapienDatasetMulti(
        str(root), split="test_val", img_wh=(32, 24), white_back=True,
        eval_inference="render",
    )
    t = ds.test_frame(1)
    # GT comes from the test_spheric image, not a train frame
    from PIL import Image

    img = np.asarray(Image.open(inst / "test_spheric" / "rgb" / "r_1.png").convert("RGB"))
    seg = np.asarray(Image.open(inst / "test_spheric" / "seg" / "r_1.png")) > 0
    expected = np.full_like(img, 255)
    expected[seg] = img[seg]
    np.testing.assert_allclose(
        t["target"].reshape(24, 32, 3), expected.astype(np.float32) / 255.0, atol=1e-6
    )
    # rays follow the stored spheric pose
    c2w = np.array(meta["frames"]["r_1"], dtype=np.float32)
    np.testing.assert_allclose(t["rays_o"][0], c2w[:3, 3], atol=1e-5)


def test_manifest_digest_and_verify(tmp_path, monkeypatch, capsys):
    """datagen/manifest.py: stable digest, write/verify roundtrip, edit detection."""
    import datagen.manifest as M

    root = tmp_path / "data" / "toy"
    (root / "train" / "rgb").mkdir(parents=True)
    (root / "train" / "rgb" / "r_0.png").write_bytes(b"aaa")
    (root / "transforms.json").write_text('{"focal": 100}')

    d1 = M.dataset_digest(str(root))
    assert d1["files"] == 2
    assert M.dataset_digest(str(root)) == d1  # deterministic

    manifest = tmp_path / "MANIFEST.json"
    monkeypatch.setattr(M, "MANIFEST", str(manifest))

    monkeypatch.setattr(
        "sys.argv", ["manifest.py", "--write", "--data_dir", str(tmp_path / "data")]
    )
    assert M.main() == 0 and manifest.exists()

    monkeypatch.setattr(
        "sys.argv", ["manifest.py", "--data_dir", str(tmp_path / "data")]
    )
    assert M.main() == 0
    assert "ok" in capsys.readouterr().out

    (root / "train" / "rgb" / "r_0.png").write_bytes(b"bbb")  # mutate
    assert M.main() == 1
    assert "MISMATCH" in capsys.readouterr().out

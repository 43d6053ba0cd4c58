"""Software SAPIEN backend (datagen/softsim.py): URDF kinematics and the
rendered buffer contracts the datagen loop relies on."""

import json
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from datagen import softsim  # noqa: E402

LAPTOP = str(REPO / "datagen" / "assets" / "laptop.urdf")


def _scene_with_laptop():
    engine = softsim.Engine()
    engine.set_renderer(softsim.SapienRenderer(offscreen_only=True))
    scene = engine.create_scene()
    scene.set_ambient_light([0.4, 0.4, 0.4])
    scene.add_directional_light([0, 1, -1], [0.8, 0.8, 0.8])
    loader = scene.create_urdf_loader()
    asset = loader.load_kinematic(LAPTOP)
    return scene, asset


def test_urdf_load_and_dof():
    _, asset = _scene_with_laptop()
    assert asset.dof == 1  # one revolute hinge
    assert len(asset.boxes) == 4  # body + keyboard + shell + screen


def test_fk_moves_lid_only():
    _, asset = _scene_with_laptop()
    base_before = [b.world.copy() for b in asset.boxes[:2]]
    lid_before = [b.world.copy() for b in asset.boxes[2:]]
    asset.set_qpos([math.radians(60)])
    for b, w in zip(asset.boxes[:2], base_before):
        np.testing.assert_allclose(b.world, w)  # base links unmoved
    for b, w in zip(asset.boxes[2:], lid_before):
        assert not np.allclose(b.world, w)  # lid links rotated


def test_lid_rises_with_angle():
    _, asset = _scene_with_laptop()
    asset.set_qpos([0.0])
    closed_z = asset.boxes[2].world[:3, 3][2]
    asset.set_qpos([math.radians(90)])
    open_z = asset.boxes[2].world[:3, 3][2]
    assert open_z > closed_z + 0.2  # lid center lifts by ~its half-length


def test_render_buffers_contract():
    from datagen.data_utils import look_at_c2w

    scene, asset = _scene_with_laptop()
    asset.set_qpos([math.radians(45)])
    cam = scene.add_camera("cam", width=64, height=48,
                           fovy=math.radians(35), near=0.1, far=100.0)
    cam.set_pose(softsim.Pose.from_transformation_matrix(look_at_c2w([3.0, -2.0, 2.0])))
    cam.take_picture()

    color = cam.get_float_texture("Color")
    seg = cam.get_uint32_texture("Segmentation")
    pos = cam.get_float_texture("Position")
    assert color.shape == (48, 64, 4) and color.dtype == np.float32
    assert seg.shape == (48, 64, 4) and seg.dtype == np.uint32
    assert pos.shape == (48, 64, 4)

    hit = seg[..., 1] > 0
    assert 0.01 < hit.mean() < 0.9  # object visible, not filling the frame
    assert set(np.unique(seg[..., 1])) >= {0, 1, 2}  # background + both links
    # colors lit and in range
    assert color[hit][:, :3].max() <= 1.0 and color[hit][:, :3].max() > 0.05
    # camera-frame z negative forward, plausible distance (camera ~4.1 away)
    z = pos[..., 2][hit]
    assert (z < 0).all() and 2.0 < (-z).mean() < 6.0
    assert (pos[..., 2][~hit] == 0).all()  # background position zeroed


def test_end_to_end_soft_backend(tmp_path):
    from datagen.data_gen import render_with_sapien

    cfg = {
        "urdf_file": LAPTOP,
        "output_dir": str(tmp_path / "out"),
        "resolution": [32, 24],
        "splits": {"train": 2},
        "joint_degrees": [0, 40],
        "backend": "soft",
        "seed": 3,
    }
    render_with_sapien(cfg)
    for deg in (0, 40):
        base = tmp_path / "out" / "train" / f"{deg}_degree"
        meta = json.loads((base / "transforms.json").read_text())
        assert meta["camera_angle_x"] > 0 and len(meta["frames"]) == 2
        from PIL import Image

        rgba = np.asarray(Image.open(base / "rgb" / "r_0.png"))
        assert rgba.shape == (24, 32, 4)
        assert (rgba[..., 3] > 0).any() and (rgba[..., 3] == 0).any()

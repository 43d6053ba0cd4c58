"""Dataset tests on a synthesized mini SAPIEN-layout tree (SURVEY.md §4)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def fixture_single(tmp_path_factory):
    root = tmp_path_factory.mktemp("sapien_single")
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_fixture_dataset.py"), str(root),
         "--n", "3", "--wh", "64", "48"],
        check=True,
    )
    return root


@pytest.fixture(scope="session")
def fixture_multi(tmp_path_factory):
    root = tmp_path_factory.mktemp("sapien_multi")
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_fixture_dataset.py"), str(root),
         "--multi", "--n", "3", "--wh", "64", "48"],
        check=True,
    )
    return root


def test_sapien_train_buffers(fixture_single):
    from aon_tpu.data import SapienDataset

    ds = SapienDataset(str(fixture_single), split="train", img_wh=(64, 48), white_back=True)
    assert ds.near == 2.0 and ds.far == 6.0
    n = 3 * 64 * 48
    assert ds.all_rays_o.shape == (n, 3)
    assert ds.all_viewdirs.shape == (n, 3)
    assert ds.all_rgbs.shape == (n, 3)
    # directions normalized (parity contract)
    np.testing.assert_allclose(np.linalg.norm(ds.all_viewdirs, axis=-1), 1.0, atol=1e-5)
    # RGBA blended to white: background rays are exactly white
    assert (ds.all_rgbs.max(axis=0) <= 1.0).all()
    assert (ds.all_rgbs == 1.0).all(axis=-1).mean() > 0.5  # mostly white bg

    # focal: camera_angle_x convention rescaled by w/320
    import json

    meta = json.load(open(fixture_single / "train" / "transforms.json"))
    expected_focal = 0.5 * 48 / np.tan(0.5 * meta["camera_angle_x"]) * (64 / 320)
    np.testing.assert_allclose(ds.focal, expected_focal, rtol=1e-6)


def test_sapien_ray_batches_fixed_shape(fixture_single):
    from aon_tpu.data import SapienDataset

    ds = SapienDataset(str(fixture_single), split="train", img_wh=(64, 48), white_back=True)
    it = ds.ray_batches(256, seed=0)
    b1 = next(it)
    b2 = next(it)
    for k in ("rays_o", "rays_d", "viewdirs", "target"):
        assert b1[k].shape == (256, 3)
    assert not np.allclose(b1["rays_o"], b2["rays_o"])  # reshuffled
    # deterministic under the same seed
    b1b = next(ds.ray_batches(256, seed=0))
    np.testing.assert_array_equal(b1["rays_o"], b1b["rays_o"])


def test_sapien_full_frame(fixture_single):
    from aon_tpu.data import SapienDataset

    ds = SapienDataset(str(fixture_single), split="val", img_wh=(64, 48), white_back=True)
    frame = ds.full_frame(0)
    n = 64 * 48
    assert frame["rays_o"].shape == (n, 3)
    assert frame["target"].shape == (n, 3)
    assert frame["instance_mask"].shape == (n,)
    assert frame["instance_mask"].dtype == bool
    assert 0 < frame["instance_mask"].sum() < n  # sphere covers part of frame


def test_sapien_multi_train_batches(fixture_multi):
    from aon_tpu.data import SapienDatasetMulti

    ds = SapienDatasetMulti(
        str(fixture_multi), split="train", img_wh=(64, 48), white_back=True,
        ray_batch_size=512,
    )
    assert len(ds.ids) == 2
    b = next(ds.train_batches(seed=0))
    assert b["rays_o"].shape == (512, 3)
    assert b["target"].shape == (512, 3)
    assert b["instance_mask"].shape == (512, 1)
    assert b["src_imgs"].shape == (3, 48, 64)
    assert 0 <= b["articulation_id"] < 10
    assert 0 <= b["instance_id"] < 2
    # deg = radians of 10*articulation_id
    np.testing.assert_allclose(b["deg"], np.deg2rad(10 * int(b["articulation_id"])), rtol=1e-6)
    # src_imgs normalized to [-1, 1]
    assert b["src_imgs"].min() >= -1.0 - 1e-6 and b["src_imgs"].max() <= 1.0 + 1e-6


def test_sapien_multi_val_and_test_frames(fixture_multi):
    from aon_tpu.data import SapienDatasetMulti

    ds = SapienDatasetMulti(
        str(fixture_multi), split="val", img_wh=(64, 48), white_back=True
    )
    f = ds.val_frame(seed=1)
    assert f["rays_o"].shape == (64 * 48, 3)

    ds_test = SapienDatasetMulti(
        str(fixture_multi), split="test_val", img_wh=(64, 48), white_back=True,
        eval_inference="render",
    )
    assert len(ds_test) == 19
    assert ds_test.poses_test.shape == (40, 4, 4)
    t = ds_test.test_frame(3)
    assert int(t["articulation_id"]) == 3
    assert t["rays_o"].shape == (64 * 48, 3)


def test_sapien_multi_frame_cache_key_wraps(fixture_multi):
    """Cache keys must use the WRAPPED file index: the reference draws
    image_id in [0, 59) while _read_frame wraps with image_id % len(files).
    Raw-id keys alias ~4x more entries than there are frames, overflow the
    cap, and re-run the (expensive, occ-grid) interval march on most draws."""
    from aon_tpu.data import SapienDatasetMulti

    ds = SapienDatasetMulti(
        str(fixture_multi), split="train", img_wh=(64, 48), white_back=True,
        ray_batch_size=512,
    )
    inst = ds.ids[0]
    deg = ds._degree_dirs(inst)[0]
    n = len(os.listdir(os.path.join(str(fixture_multi), inst, "train", deg, "rgb")))
    ds._read_frame_cached(inst, deg, 0)
    assert len(ds._frame_cache) == 1
    _, f_wrapped = ds._read_frame_cached(inst, deg, n)  # same file as id 0
    assert len(ds._frame_cache) == 1  # hit, no new entry
    f0 = ds._frame_cache[(inst, deg, 0)]
    assert f_wrapped is f0
    # a genuinely different image adds exactly one entry
    if n > 1:
        ds._read_frame_cached(inst, deg, 1)
        assert len(ds._frame_cache) == 2


def test_train_derived_cache_and_need_src_imgs(fixture_multi):
    """Per-frame derived arrays (f32 rgbs/src/mask, hit index) are computed
    once per frame, not per 4096-ray batch (the per-batch recompute was the
    AE real-run host bound — BASELINE.md round 3), and src_imgs is only
    built when the system consumes it (AE; reference model_ae_art.py:361)."""
    from aon_tpu.data import SapienDatasetMulti

    ds = SapienDatasetMulti(
        str(fixture_multi), split="train", img_wh=(64, 48), white_back=True,
        ray_batch_size=128, need_src_imgs=False,
    )
    it = ds.train_batches(seed=0)
    b = next(it)
    assert "src_imgs" not in b
    assert len(ds._derived_cache) == len(ds._frame_cache) == 1
    for _ in range(20):
        b = next(it)
        assert "src_imgs" not in b
    # derived entries track frames, not batches
    assert len(ds._derived_cache) == len(ds._frame_cache) <= 21

    ds_ae = SapienDatasetMulti(
        str(fixture_multi), split="train", img_wh=(64, 48), white_back=True,
        ray_batch_size=128, need_src_imgs=True,
    )
    it_ae = ds_ae.train_batches(seed=0)
    b1, b2 = next(it_ae), next(it_ae)
    assert b1["src_imgs"].shape == (3, 48, 64)
    # same frame drawn twice yields the SAME cached src array (no recompute)
    key = next(iter(ds_ae._derived_cache))
    assert ds_ae._derived_cache[key]["src"] is not None
    # val path keeps src for the AE and its grid metadata intact
    v = ds_ae.val_frame(seed=0)
    assert v["src_imgs"].shape == (3, 48, 64)

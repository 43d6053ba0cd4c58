"""Metric + artifact tests."""

import json
import os

import numpy as np
import pytest

from aon_tpu.eval import metrics as M
from aon_tpu.eval.artifacts import store_depth_img, store_image, store_video, write_stats
from aon_tpu.utils.viz import val_grid


def test_psnr_known_value():
    a = np.full((8, 8, 3), 0.5, np.float32)
    b = np.full((8, 8, 3), 0.6, np.float32)
    np.testing.assert_allclose(M.psnr(a, b), 20.0, rtol=1e-4)
    assert M.psnr(a, a) > 80


def test_psnr_masked_selects_pixels(rng):
    pred = np.zeros((4, 4, 3), np.float32)
    gt = np.zeros((4, 4, 3), np.float32)
    gt[0, 0] = 1.0  # error only in one pixel
    mask_hit = np.zeros((4, 4), bool)
    mask_hit[0, 0] = True
    mask_miss = ~mask_hit
    assert M.psnr_masked(pred, gt, mask_hit) == pytest.approx(0.0, abs=1e-4)
    assert M.psnr_masked(pred, gt, mask_miss) > 80
    assert np.isnan(M.psnr_masked(pred, gt, np.zeros((4, 4), bool)))


def test_ssim_properties(rng):
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert M.ssim(img, img) == pytest.approx(1.0, abs=1e-4)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape).astype(np.float32), 0, 1)
    s_noisy = M.ssim(img, noisy)
    assert 0 < s_noisy < 0.95
    # more noise -> lower ssim
    noisier = np.clip(img + rng.normal(0, 0.5, img.shape).astype(np.float32), 0, 1)
    assert M.ssim(img, noisier) < s_noisy


def test_lpips_gated_returns_none_without_weights(monkeypatch):
    import aon_tpu.eval.lpips as L

    L.lpips_fn.cache_clear()
    monkeypatch.delenv("AON_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "_weights_path", lambda: None)
    assert M.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None
    L.lpips_fn.cache_clear()


def _random_lpips_npz(path: str, seed: int = 0) -> None:
    """Correctly-shaped random LPIPS weights (the converter's npz layout:
    conv{i}_w HWIO, conv{i}_b, lin{i}_w (1,1,C,1))."""
    from aon_tpu.eval.lpips import _TAPS, _VGG_CFG

    g = np.random.default_rng(seed)
    params = {}
    cin, conv_idx, tap_channels = 3, 0, []
    for item in _VGG_CFG:
        if item == "M":
            continue
        params[f"conv{conv_idx}_w"] = g.normal(
            0, 0.05, size=(3, 3, cin, item)
        ).astype(np.float32)
        params[f"conv{conv_idx}_b"] = np.zeros((item,), np.float32)
        if conv_idx in _TAPS:
            tap_channels.append(item)
        cin = item
        conv_idx += 1
    for i, c in enumerate(tap_channels):
        params[f"lin{i}_w"] = np.abs(g.normal(0, 0.1, size=(1, 1, c, 1))).astype(
            np.float32
        )
    np.savez(path, **params)


def test_lpips_pipeline_with_injected_weights(tmp_path, monkeypatch, rng):
    """Drop a random-weight npz into place -> the eval pipeline must emit a
    FINITE LPIPS (results.json plumbing included), so the day the real VGG
    file appears nothing else is untested (weights/README.md)."""
    import aon_tpu.eval.lpips as L

    npz = tmp_path / "lpips_vgg.npz"
    _random_lpips_npz(str(npz))
    monkeypatch.setenv("AON_LPIPS_WEIGHTS", str(npz))
    L.lpips_fn.cache_clear()
    try:
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        d_ab = M.lpips(a, b)
        d_aa = M.lpips(a, a)
        assert d_ab is not None and np.isfinite(d_ab) and d_ab > 0
        assert d_aa == pytest.approx(0.0, abs=1e-6)
        # results.json plumbing: stats dict carries the finite value
        stats = M.summarize("LPIPS", [d_ab, d_aa])
        out = tmp_path / "results.json"
        write_stats(str(out), M.summarize("PSNR", [30.0]), M.summarize("SSIM", [0.9]),
                    stats, M.summarize("PSNR_obj", [20.0]))
        data = json.loads(out.read_text())
        assert np.isfinite(data["LPIPS"]["mean"])
    finally:
        L.lpips_fn.cache_clear()


def test_summarize_skips_none_and_nan():
    s = M.summarize("PSNR", [10.0, None, float("nan"), 20.0])
    assert s["mean"] == pytest.approx(15.0)
    assert s["test"] == pytest.approx(15.0)


def test_artifact_writers(tmp_path, rng):
    rgbs = [rng.uniform(size=(12, 16, 3)).astype(np.float32) for _ in range(3)]
    paths = store_image(str(tmp_path), rgbs, "image")
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    assert paths[0].endswith("image000.jpg")

    depths = [rng.uniform(2, 6, size=(12, 16)).astype(np.float32) for _ in range(2)]
    dpaths = store_depth_img(str(tmp_path), depths)
    assert len(dpaths) == 2 and all(os.path.exists(p) for p in dpaths)

    store_video(str(tmp_path), rgbs)  # may fall back to frames; must not raise

    write_stats(
        str(tmp_path / "results.json"),
        {"name": "PSNR", "mean": 30.0, "test": 30.0},
        None,
        {"name": "LPIPS", "mean": None, "test": None},
    )
    data = json.loads((tmp_path / "results.json").read_text())
    assert data["PSNR"]["test"] == 30.0
    assert data["LPIPS"]["test"] is None


def test_val_grid_panels(rng):
    w, h = 16, 12
    n = h * w
    grid = val_grid(
        (w, h),
        rng.uniform(size=(n, 3)),
        rng.uniform(size=(n, 3)),
        rng.uniform(2, 6, size=(n,)),
        rng.uniform(size=(n,)),
    )
    assert grid.shape == (h, w * 4, 3)
    grid2 = val_grid((w, h), rng.uniform(size=(n, 3)), rng.uniform(size=(n, 3)))
    assert grid2.shape == (h, w * 2, 3)


def test_synthetic_lpips_weights_label_and_execute(tmp_path):
    """scripts/make_synthetic_lpips_weights.py output loads through the full
    LPIPS path (kind == "synthetic", finite distance, zero for identical
    images) so eval artifacts carry the provenance label."""
    import os
    import subprocess
    import sys

    from aon_tpu.eval import lpips as L

    npz = tmp_path / "lpips_vgg.synthetic.npz"
    r = subprocess.run(
        [sys.executable, "scripts/make_synthetic_lpips_weights.py",
         "--out", str(npz)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    os.environ["AON_LPIPS_WEIGHTS"] = str(npz)
    L.lpips_fn.cache_clear()
    try:
        assert L.lpips_weights_kind() == "synthetic"
        fn = L.lpips_fn()
        assert fn is not None
        g = np.random.default_rng(0)
        a = g.uniform(size=(32, 32, 3)).astype(np.float32)
        b = g.uniform(size=(32, 32, 3)).astype(np.float32)
        d = fn(a, b)
        assert np.isfinite(d) and d > 0
        assert fn(a, a) == 0.0
    finally:
        del os.environ["AON_LPIPS_WEIGHTS"]
        L.lpips_fn.cache_clear()
    assert L.lpips_weights_kind() in (None, "pretrained")

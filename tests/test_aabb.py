"""Scene-AABB interval tightening (data/aabb.py) end to end.

The fixture scene is a unit sphere at the origin rendered from radius-4
cameras, so the true AABB is [-1, 1]^3 and every geometry statement below
is checkable analytically.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def fixture_single(tmp_path_factory):
    root = tmp_path_factory.mktemp("aabb_single")
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_fixture_dataset.py"), str(root),
         "--n", "6", "--wh", "64", "48"],
        check=True,
    )
    return root


@pytest.fixture(scope="session")
def fixture_multi(tmp_path_factory):
    root = tmp_path_factory.mktemp("aabb_multi")
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_fixture_dataset.py"), str(root),
         "--multi", "--n", "3", "--wh", "64", "48"],
        check=True,
    )
    return root


def test_sample_along_rays_per_ray_matches_scalar(rng):
    import jax
    import jax.numpy as jnp

    from aon_tpu.core.sampling import sample_along_rays

    d = rng.normal(size=(8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (-4.0 * d).astype(np.float32)
    key = jax.random.PRNGKey(0)

    t_s, c_s = sample_along_rays(key, jnp.asarray(o), jnp.asarray(d), 16, 2.0, 6.0,
                                 randomized=True)
    t_a, c_a = sample_along_rays(
        key, jnp.asarray(o), jnp.asarray(d), 16,
        jnp.full((8,), 2.0), jnp.full((8,), 6.0), randomized=True,
    )
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_a), atol=1e-6)

    # genuinely per-ray intervals: every sample stays inside its own bounds
    tn = rng.uniform(2.0, 3.0, size=(8,)).astype(np.float32)
    tf = rng.uniform(4.0, 5.0, size=(8,)).astype(np.float32)
    t_p, _ = sample_along_rays(key, jnp.asarray(o), jnp.asarray(d), 16,
                               jnp.asarray(tn), jnp.asarray(tf), randomized=True)
    t_p = np.asarray(t_p)
    assert (t_p >= tn[:, None] - 1e-5).all() and (t_p <= tf[:, None] + 1e-5).all()
    # deterministic ladder hits the interval endpoints exactly
    t_d, _ = sample_along_rays(None, jnp.asarray(o), jnp.asarray(d), 16,
                               jnp.asarray(tn), jnp.asarray(tf), randomized=False)
    t_d = np.asarray(t_d)
    np.testing.assert_allclose(t_d[:, 0], tn, atol=1e-6)
    np.testing.assert_allclose(t_d[:, -1], tf, atol=1e-6)


def test_scene_aabb_bounds_sphere(fixture_single):
    from aon_tpu.data.aabb import scene_aabb

    bounds = scene_aabb([str(fixture_single / "train")], (64, 48), pad=0.05)
    assert bounds is not None
    # unit sphere: the box must contain it and not be wildly bigger
    assert (bounds[0] <= -0.8).all() and (bounds[1] >= 0.8).all()
    assert (bounds[0] >= -1.2).all() and (bounds[1] <= 1.2).all()
    # cache round-trip returns the identical box
    again = scene_aabb([str(fixture_single / "train")], (64, 48), pad=0.05)
    np.testing.assert_array_equal(bounds, again)


def test_scene_aabb_missing_depth_returns_none(tmp_path):
    from aon_tpu.data.aabb import scene_aabb

    assert scene_aabb([str(tmp_path)], (64, 48)) is None


def test_sapien_dataset_aabb_filtering(fixture_single):
    from aon_tpu.data.sapien import SapienDataset

    ds_all = SapienDataset(str(fixture_single), split="train", img_wh=(64, 48),
                           white_back=True)
    ds = SapienDataset(str(fixture_single), split="train", img_wh=(64, 48),
                       white_back=True, use_aabb=True)
    assert ds.scene_bounds is not None
    # no foreground ray may be dropped, and plenty of background must be
    assert ds.aabb_dropped_fg_frac == 0.0
    assert len(ds.all_rays_o) < len(ds_all.all_rays_o)
    assert ds.hit_fraction < 0.6
    # every kept interval is sane and tight
    assert (ds.all_tfar > ds.all_tnear).all()
    assert ds.all_tnear.min() > 1.0  # camera radius 4, box radius ~1.05
    assert (ds.all_tfar - ds.all_tnear).max() < 3.0

    batch = next(ds.ray_batches(32, seed=0))
    assert batch["t_near"].shape == (32,) and batch["t_far"].shape == (32,)


def test_sapien_full_frame_carries_intervals(fixture_single):
    from aon_tpu.data.sapien import SapienDataset

    ds = SapienDataset(str(fixture_single), split="val", img_wh=(64, 48),
                       white_back=True, use_aabb=True)
    frame = ds.full_frame(0)
    n = frame["rays_o"].shape[0]
    assert frame["hit"].shape == (n,)
    assert frame["t_near"].shape == (n,)
    # every foreground pixel must be a hit ray
    fg = np.asarray(frame["instance_mask"])
    assert (frame["hit"][fg]).all()


def test_sapien_multi_aabb(fixture_multi):
    from aon_tpu.data.sapien_multi import SapienDatasetMulti

    ds = SapienDatasetMulti(str(fixture_multi), split="train", img_wh=(64, 48),
                            white_back=False, use_aabb=True, ray_batch_size=64)
    assert ds.scene_bounds is not None
    batch = next(ds.train_batches(seed=0))
    assert batch["t_near"].shape == (64,)
    assert (batch["t_far"] > batch["t_near"]).all()
    # hit-only sampling: all drawn rays intersect the box
    val = ds.val_frame(seed=0)
    assert "hit" in val and val["hit"].shape[0] == 64 * 48
    fg = val["instance_mask"].reshape(-1) > 0
    assert val["hit"][fg].all()


def test_render_frame_compaction_matches_direct(eight_devices):
    """Compacted (hit-only) rendering must reproduce the direct render on
    hit rays and the fill value on misses."""
    import jax.numpy as jnp

    from aon_tpu.eval.render import render_frame
    from aon_tpu.parallel import get_mesh

    mesh = get_mesh(8)
    n = 160
    g = np.random.default_rng(0)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    frame = {
        "rays_o": (-4.0 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "t_near": g.uniform(2, 3, size=n).astype(np.float32),
        "t_far": g.uniform(4, 5, size=n).astype(np.float32),
        "hit": g.uniform(size=n) > 0.6,
    }

    def chunk_fn(rays):
        mid = 0.5 * (rays["t_near"] + rays["t_far"])
        return {
            "comp_rgb": rays["rays_o"] + mid[:, None] * rays["rays_d"],
            "acc": jnp.ones_like(mid),
        }

    direct = render_frame(chunk_fn, frame, mesh, chunk=64)
    compact = render_frame(chunk_fn, frame, mesh, chunk=64,
                           miss_fill={"comp_rgb": 1.0, "acc": 0.0})
    hit = frame["hit"]
    np.testing.assert_allclose(compact["comp_rgb"][hit], direct["comp_rgb"][hit],
                               atol=1e-6)
    assert (compact["comp_rgb"][~hit] == 1.0).all()
    assert (compact["acc"][~hit] == 0.0).all()


def test_vanilla_train_step_with_aabb(fixture_single, eight_devices):
    """End-to-end: AABB batches through the (flax, CPU) vanilla train step
    and an AABB-compacted full-frame render."""
    import jax

    from aon_tpu.data.sapien import SapienDataset
    from aon_tpu.eval.render import render_frame
    from aon_tpu.parallel import get_mesh, shard_ray_batch
    from aon_tpu.train.systems import VanillaSystem
    from aon_tpu.utils.config import Config

    # 2-dev mesh: end-to-end train+render is execution-bound (see
    # test_train.py note); 8-dev coverage lives in the parity tests.
    mesh = get_mesh(2)
    ds = SapienDataset(str(fixture_single), split="train", img_wh=(64, 48),
                       white_back=True, use_aabb=True)
    cfg = Config(N_samples=8, N_importance=8, batch_size=64,
                 compute_dtype="float32", use_pallas=False)
    system = VanillaSystem(cfg, near=ds.near, far=ds.far, white_bkgd=True, mesh=mesh)
    state = system.init_state(jax.random.PRNGKey(0))

    it = ds.ray_batches(cfg.batch_size, seed=0)
    for i in range(2):
        sharded = shard_ray_batch(next(it), mesh)
        state, metrics = system.train_step(state, sharded, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["train/loss"]))

    val = SapienDataset(str(fixture_single), split="val", img_wh=(64, 48),
                        white_back=True, use_aabb=True)
    frame = val.full_frame(0)
    out = render_frame(
        lambda rays: system.render_chunk(state.params, rays),
        frame, mesh, chunk=256, miss_fill={"comp_rgb": 1.0, "acc": 0.0, "depth": 0.0},
    )
    assert np.isfinite(out["comp_rgb"]).all()
    # miss rays ARE the background
    assert (out["comp_rgb"][~frame["hit"]] == 1.0).all()


def test_effective_intervals_anneal():
    """interval_ramp lerps tightened bounds from global (0) to tight (1)."""
    import numpy as np

    from aon_tpu.core.rays import effective_intervals

    tn = np.array([3.0, 2.5], np.float32)
    tf = np.array([4.0, 5.5], np.float32)
    # no tightened bounds in the batch: globals pass through untouched
    assert effective_intervals({}, 2.0, 6.0) == (2.0, 6.0)
    assert effective_intervals({"interval_ramp": np.float32(0.3)}, 2.0, 6.0) == (2.0, 6.0)
    # no ramp: tightened bounds pass through
    got = effective_intervals({"t_near": tn, "t_far": tf}, 2.0, 6.0)
    np.testing.assert_array_equal(got[0], tn)
    np.testing.assert_array_equal(got[1], tf)
    # ramp endpoints and midpoint
    b = {"t_near": tn, "t_far": tf, "interval_ramp": np.float32(0.0)}
    got = effective_intervals(b, 2.0, 6.0)
    np.testing.assert_allclose(got[0], [2.0, 2.0])
    np.testing.assert_allclose(got[1], [6.0, 6.0])
    b["interval_ramp"] = np.float32(1.0)
    got = effective_intervals(b, 2.0, 6.0)
    np.testing.assert_allclose(got[0], tn)
    np.testing.assert_allclose(got[1], tf)
    b["interval_ramp"] = np.float32(0.5)
    got = effective_intervals(b, 2.0, 6.0)
    np.testing.assert_allclose(got[0], [2.5, 2.25])
    np.testing.assert_allclose(got[1], [5.0, 5.75])

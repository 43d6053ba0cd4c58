"""Native C++ helper tests: parity with the numpy fallbacks."""

import numpy as np
import pytest

import aon_tpu.native as nat


requires_native = pytest.mark.skipif(not nat.available(), reason="libaon_native.so not built")


def test_fallbacks_work_without_lib(monkeypatch, rng):
    """All entry points must work (numpy path) even with the lib disabled."""
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_load_failed", True)
    ro = rng.normal(size=(100, 3)).astype(np.float32)
    vd = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.uniform(size=(100, 3)).astype(np.float32)
    idx = rng.integers(0, 100, size=32)
    a, b, c = nat.ray_batch_gather(ro, vd, rgb, idx)
    np.testing.assert_array_equal(a, ro[idx])
    rgba = (rng.uniform(size=(5, 4)) * 255).astype(np.uint8)
    out = nat.rgba_blend_white(rgba)
    assert out.shape == (5, 3)


@requires_native
def test_gather_matches_numpy(rng):
    n = 10000
    ro = rng.normal(size=(n, 3)).astype(np.float32)
    vd = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n, 3)).astype(np.float32)
    idx = rng.integers(0, n, size=4096)
    a, b, c = nat.ray_batch_gather(ro, vd, rgb, idx)
    np.testing.assert_array_equal(a, ro[idx])
    np.testing.assert_array_equal(b, vd[idx])
    np.testing.assert_array_equal(c, rgb[idx])


@requires_native
def test_aabb_matches_reference_impl(rng):
    from aon_tpu.core.rays import ray_box_intersection

    bounds = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
    o = rng.normal(size=(1000, 3)).astype(np.float32) * 3
    d = rng.normal(size=(1000, 3)).astype(np.float32)
    hit_n, tn_n, tf_n = nat.aabb_intersect(bounds, o, d)
    hit_p, tn_p, tf_p = ray_box_intersection(bounds, o, d)
    np.testing.assert_array_equal(hit_n, hit_p)
    np.testing.assert_allclose(tn_n, tn_p, atol=1e-4)
    np.testing.assert_allclose(tf_n, tf_p, atol=1e-4)


@requires_native
def test_blend_matches_numpy(rng):
    rgba = (rng.uniform(size=(64, 48, 4)) * 255).astype(np.uint8)
    out = nat.rgba_blend_white(rgba)
    f = rgba.astype(np.float32) / 255.0
    expected = f[..., :3] * f[..., 3:] + (1 - f[..., 3:])
    np.testing.assert_allclose(out, expected, atol=1e-6)
    assert out.shape == (64, 48, 3)


@requires_native
def test_generate_rays_matches_core(rng):
    from aon_tpu.core.rays import get_ray_directions, get_rays

    dirs = get_ray_directions(24, 32, 20.0)
    c2w = np.concatenate([np.eye(3), [[1.0], [2.0], [3.0]]], axis=1).astype(np.float32)
    o_ref, vd_ref, _, _ = get_rays(dirs, c2w, output_view_dirs=True, output_radii=True)
    o_nat, vd_nat = nat.generate_rays(dirs, c2w)
    np.testing.assert_allclose(o_nat, o_ref, atol=1e-6)
    np.testing.assert_allclose(vd_nat, vd_ref, atol=1e-5)

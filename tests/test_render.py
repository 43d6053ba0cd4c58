"""Sharded full-frame renderer tests (virtual 8-device mesh)."""

import jax.numpy as jnp
import numpy as np

from aon_tpu.eval.render import render_frame
from aon_tpu.parallel import get_mesh, pad_to_multiple


def test_pad_to_multiple_edge_mode(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    p = pad_to_multiple(x, 8)
    assert p.shape == (16, 3)
    np.testing.assert_array_equal(p[10:], np.broadcast_to(x[-1], (6, 3)))
    np.testing.assert_array_equal(pad_to_multiple(x, 5), x)  # already divisible


def test_render_frame_chunks_and_unpads(eight_devices, rng):
    mesh = get_mesh(8)
    n = 1000  # deliberately ragged vs chunk and device count

    frame = {
        "rays_o": rng.normal(size=(n, 3)).astype(np.float32),
        "rays_d": rng.normal(size=(n, 3)).astype(np.float32),
        "viewdirs": rng.normal(size=(n, 3)).astype(np.float32),
    }

    calls = []

    def render_chunk(rays):
        calls.append(rays["rays_o"].shape[0])
        return {"comp_rgb": jnp.asarray(rays["rays_o"]) * 2.0,
                "acc": jnp.sum(jnp.asarray(rays["rays_d"]), axis=-1)}

    out = render_frame(render_chunk, frame, mesh, chunk=256)
    assert out["comp_rgb"].shape == (n, 3)
    assert out["acc"].shape == (n,)
    np.testing.assert_allclose(out["comp_rgb"], frame["rays_o"] * 2.0, rtol=1e-6)
    # fixed-shape chunks: every call sees the same (device-divisible) size
    assert len(set(calls)) == 1
    assert calls[0] % (8 * 8) == 0


def test_render_frame_miss_fill_nan_for_unlisted_outputs(eight_devices, rng):
    """AABB compaction: outputs WITHOUT an explicit miss value fill with NaN
    on missed rays — a silent 0-fill shrank whole-frame means by the hit
    fraction (the val/state_error_rad bug: pred_state is per-ray-constant,
    so np.mean over a zero-filled frame scaled the prediction by hit_frac).
    nanmean over the filled output must recover the constant exactly."""
    mesh = get_mesh(8)
    n = 512
    frame = {
        "rays_o": rng.normal(size=(n, 3)).astype(np.float32),
        "rays_d": rng.normal(size=(n, 3)).astype(np.float32),
        "viewdirs": rng.normal(size=(n, 3)).astype(np.float32),
        "hit": (rng.uniform(size=n) < 0.25),  # ~hit_frac 0.25
    }
    frame["hit"][:8] = True  # at least a few hits

    PRED = 0.7853982  # the per-frame scalar every chunk reports

    def render_chunk(rays):
        m = rays["rays_o"].shape[0]
        return {
            "comp_rgb": jnp.zeros((m, 3)) + 0.5,
            "acc": jnp.ones((m,)),
            "pred_state": jnp.full((m,), PRED),
        }

    out = render_frame(
        render_chunk, frame, mesh, chunk=256,
        miss_fill={"comp_rgb": 0.0, "acc": 0.0, "depth": 0.0},
    )
    hit = frame["hit"]
    # listed outputs use their fill value on misses
    np.testing.assert_array_equal(out["acc"][~hit], 0.0)
    np.testing.assert_array_equal(out["comp_rgb"][hit], 0.5)
    # unlisted per-ray output: NaN on misses, exact on hits
    assert np.isnan(out["pred_state"][~hit]).all()
    np.testing.assert_allclose(out["pred_state"][hit], PRED, rtol=1e-6)
    np.testing.assert_allclose(np.nanmean(out["pred_state"]), PRED, rtol=1e-6)

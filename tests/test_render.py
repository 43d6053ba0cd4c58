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

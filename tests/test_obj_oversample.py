"""Object-pixel ray oversampling: unbiased importance weights + plumbing.

data/sapien_multi._draw_pixels draws a fraction f of each train batch from
object (seg>0) pixels and attaches loss_w = (1/N)/p_i so the weighted MSE
stays an unbiased estimator of the uniform-pixel mean; the autodecoder loss
paths consume loss_w as mean-1 per-ray weights.
"""

import os

os.environ.setdefault("AON_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp
import numpy as np

from aon_tpu.data.sapien_multi import SapienDatasetMulti


class _Draw(SapienDatasetMulti):
    """Bare instance exposing _draw_pixels without touching disk."""

    def __init__(self, ray_batch_size, obj_ray_oversample):
        self.ray_batch_size = ray_batch_size
        self.obj_ray_oversample = obj_ray_oversample


def test_draw_pixels_weights_are_unbiased():
    g = np.random.default_rng(0)
    h, w = 24, 32
    n = h * w
    seg = np.zeros((h, w), bool)
    seg[3:6, 4:10] = True  # 18 object pixels of 768 (~2.3%, scissors-like)
    ds = _Draw(ray_batch_size=4096, obj_ray_oversample=0.5)

    pix, lw = ds._draw_pixels(g, None, seg, n)
    assert pix.shape == lw.shape == (4096,)
    obj_frac = seg.reshape(-1)[pix].mean()
    assert obj_frac > 0.45  # ~50% + the uniform stream's small contribution

    # unbiasedness: E[(1/B) sum lw_i x_{pix_i}] == mean(x) for any pixel
    # function x; check on a fixed random x with many draws
    x = np.random.default_rng(1).normal(size=n)
    est = []
    for i in range(64):
        pix, lw = ds._draw_pixels(np.random.default_rng(100 + i), None, seg, n)
        est.append(np.mean(lw * x[pix]))
    se = np.std(est) / np.sqrt(len(est))
    assert abs(np.mean(est) - x.mean()) < 4 * se + 1e-3

    # restricted candidate set (AABB hit rays) keeps the estimator unbiased
    # for the mean over the CANDIDATES
    cand = np.flatnonzero(np.random.default_rng(2).uniform(size=n) < 0.3)
    est = []
    for i in range(64):
        pix, lw = ds._draw_pixels(np.random.default_rng(200 + i), cand, seg, n)
        assert np.isin(pix, cand).all()
        est.append(np.mean(lw * x[pix]))
    se = np.std(est) / np.sqrt(len(est))
    assert abs(np.mean(est) - x[cand].mean()) < 4 * se + 1e-3


def test_draw_pixels_off_matches_reference_contract():
    g = np.random.default_rng(0)
    seg = np.zeros((8, 8), bool)
    ds = _Draw(ray_batch_size=64, obj_ray_oversample=0.0)
    pix, lw = ds._draw_pixels(g, None, seg, 64)
    assert lw is None and pix.shape == (64,)
    # no object pixels: oversampling degrades to uniform, no weights
    ds = _Draw(ray_batch_size=64, obj_ray_oversample=0.5)
    pix, lw = ds._draw_pixels(g, None, seg, 64)
    assert lw is None


def test_fused_autodecoder_step_consumes_loss_w():
    """Constant loss_w = c must scale the photometric loss by exactly c
    (reg term unchanged) — proves the weights reach the kernel."""
    from aon_tpu.models.articulated import ArticulatedNeRFMLP
    from aon_tpu.models.code_library import CodeLibraryArticulated
    from aon_tpu.ops.train_fused_level_art import make_fused_autodecoder_step_fn

    g = np.random.default_rng(1)
    B = 16
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(-4.0 * d),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(g.uniform(size=(B, 3)).astype(np.float32)),
        "ray_ids": jnp.arange(B),
        "instance_id": jnp.array(0),
        "articulation_id": jnp.array(1),
    }
    key = jax.random.PRNGKey(0)
    mlp = ArticulatedNeRFMLP()
    lib = CodeLibraryArticulated(n_max_objs=2, n_obj_code_length=128)
    latents0 = {
        "density": jnp.zeros((1, 128)),
        "color": jnp.zeros((1, 128)),
        "articulation": jnp.zeros((1, 32)),
    }
    params = {
        "model": {
            "coarse_mlp": mlp.init(key, jnp.zeros((2, 4, 3)), jnp.zeros((2, 27)), latents0)["params"],
            "fine_mlp": mlp.init(jax.random.fold_in(key, 1), jnp.zeros((2, 4, 3)), jnp.zeros((2, 27)), latents0)["params"],
        },
        "code_library": lib.init(jax.random.fold_in(key, 2), jnp.array(0), jnp.array(0))["params"],
    }
    step_fn = make_fused_autodecoder_step_fn(lib.apply, 2.0, 6.0, False, num_coarse=8, num_fine=8)
    _, aux1, _ = step_fn(params, batch, key)
    batch2 = dict(batch, loss_w=jnp.full((B,), 2.0))
    _, aux2, _ = step_fn(params, batch2, key)
    np.testing.assert_allclose(
        float(aux2["loss0"]), 2.0 * float(aux1["loss0"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(aux2["loss1"]), 2.0 * float(aux1["loss1"]), rtol=1e-5
    )
    np.testing.assert_allclose(float(aux2["reg"]), float(aux1["reg"]), rtol=1e-6)

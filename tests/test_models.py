"""Model structure tests: param shapes vs the reference architecture,
forward output shapes/ranges, overfit sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aon_tpu.core import sampling
from aon_tpu.models import (
    ArticulatedNeRF,
    CodeLibraryArticulated,
    JointStateDecoder,
    NeRFMLP,
    VanillaNeRF,
    interpolate_articulations,
)


def _rays(B=8, seed=0):
    g = np.random.default_rng(seed)
    o = g.normal(size=(B, 3)).astype(np.float32)
    d = g.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(o),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
    }


def test_nerf_mlp_param_shapes_match_reference():
    """Reference model.py:39-93: 8x256 trunk, skip re-concat makes layer 5's
    input 256+63, bottleneck 256->256, density 256->1, view branch
    (256+27)->128, rgb 128->3."""
    mlp = NeRFMLP()
    params = mlp.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 5, 63)), jnp.zeros((2, 27))
    )["params"]
    assert params["pts_0"]["kernel"].shape == (63, 256)
    for i in range(1, 8):
        expected_in = 256 + 63 if i == 5 else 256
        assert params[f"pts_{i}"]["kernel"].shape == (expected_in, 256), i
    assert params["density"]["kernel"].shape == (256, 1)
    assert params["bottleneck"]["kernel"].shape == (256, 256)
    assert params["views_0"]["kernel"].shape == (256 + 27, 128)
    assert params["rgb"]["kernel"].shape == (128, 3)


def test_vanilla_nerf_forward_shapes_and_ranges():
    model = VanillaNeRF()
    rays = _rays(B=4)
    key = jax.random.PRNGKey(0)
    params = model.init(key, rays, key, True, True, 2.0, 6.0)
    out = model.apply(params, rays, key, True, True, 2.0, 6.0)
    assert len(out) == 2
    for comp_rgb, acc, depth in out:
        assert comp_rgb.shape == (4, 3)
        assert acc.shape == (4,) and depth.shape == (4,)
        assert np.asarray(acc).min() >= -1e-5 and np.asarray(acc).max() <= 1 + 1e-4
    # white background + tiny random density => color near white
    assert np.asarray(out[1][0]).mean() > 0.3


def test_vanilla_nerf_deterministic_eval():
    model = VanillaNeRF()
    rays = _rays(B=4)
    key = jax.random.PRNGKey(0)
    params = model.init(key, rays, key, True, True, 2.0, 6.0)
    a = model.apply(params, rays, None, False, True, 2.0, 6.0)
    b = model.apply(params, rays, None, False, True, 2.0, 6.0)
    np.testing.assert_array_equal(np.asarray(a[1][0]), np.asarray(b[1][0]))


def test_vanilla_nerf_overfits_constant_target():
    """A few gradient steps on a constant target must reduce the loss —
    catches dead gradients through the composite/resample path."""
    import optax

    model = VanillaNeRF(num_coarse_samples=16, num_fine_samples=16)
    rays = _rays(B=32)
    target = jnp.full((32, 3), 0.25)
    key = jax.random.PRNGKey(0)
    params = model.init(key, rays, key, True, False, 2.0, 6.0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, k):
        out = model.apply(p, rays, k, True, False, 2.0, 6.0)
        return jnp.mean((out[0][0] - target) ** 2) + jnp.mean((out[1][0] - target) ** 2)

    @jax.jit
    def step(p, s, k):
        l, g = jax.value_and_grad(loss_fn)(p, k)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_articulated_mlp_param_shapes():
    """Reference model_autodecoder.py:60-169: deformation input 3+128+32,
    trunk input 63+128 with skip, view branch 256+27+128."""
    mlp_model = ArticulatedNeRF()
    rays = _rays(B=2)
    latents = {
        "density": jnp.zeros((1, 128)),
        "color": jnp.zeros((1, 128)),
        "articulation": jnp.zeros((1, 32)),
    }
    variables = mlp_model.init(
        jax.random.PRNGKey(0), rays, latents, None, False, True, 2.0, 6.0
    )
    p = variables["params"]["coarse_mlp"]
    assert p["deform_0"]["kernel"].shape == (3 + 128 + 32, 128)
    assert p["deform_3"]["kernel"].shape == (128, 128)
    assert p["deform_out"]["kernel"].shape == (128, 3)
    assert p["pts_0"]["kernel"].shape == (63 + 128, 256)
    assert p["pts_5"]["kernel"].shape == (256 + 63 + 128, 256)
    assert p["views_0"]["kernel"].shape == (256 + 27 + 128, 128)
    assert p["views_3"]["kernel"].shape == (128, 128)
    assert p["rgb"]["kernel"].shape == (128, 3)


def test_articulated_forward_and_rgb_padding_range():
    model = ArticulatedNeRF()  # autodecoder contract: softplus+bias, padding
    rays = _rays(B=4)
    latents = {
        "density": jnp.ones((1, 128)) * 0.1,
        "color": jnp.ones((1, 128)) * 0.1,
        "articulation": jnp.ones((1, 32)) * 0.1,
    }
    key = jax.random.PRNGKey(1)
    variables = model.init(key, rays, latents, key, True, False, 2.0, 6.0)
    out = model.apply(variables, rays, latents, key, True, False, 2.0, 6.0)
    assert len(out) == 2 and out[0][0].shape == (4, 3)
    # padded sigmoid can exceed [0,1] by rgb_padding
    assert np.asarray(out[1][0]).min() >= -0.002 - 1e-5


def test_articulation_latents_change_output():
    model = ArticulatedNeRF()
    rays = _rays(B=4)
    lat1 = {
        "density": jnp.ones((1, 128)),
        "color": jnp.ones((1, 128)),
        "articulation": jnp.zeros((1, 32)),
    }
    lat2 = dict(lat1, articulation=jnp.ones((1, 32)) * 2.0)
    key = jax.random.PRNGKey(2)
    variables = model.init(key, rays, lat1, None, False, False, 2.0, 6.0)
    o1 = model.apply(variables, rays, lat1, None, False, False, 2.0, 6.0)
    o2 = model.apply(variables, rays, lat2, None, False, False, 2.0, 6.0)
    assert not np.allclose(np.asarray(o1[1][0]), np.asarray(o2[1][0]))


def test_code_library_shapes_and_interpolation():
    lib = CodeLibraryArticulated(n_max_objs=5)
    variables = lib.init(jax.random.PRNGKey(0), jnp.array(0), jnp.array(0))
    out = lib.apply(variables, jnp.array(2), jnp.array(3))
    assert out["density"].shape == (1, 128)
    assert out["color"].shape == (1, 128)
    assert out["articulation"].shape == (1, 32)

    tbl = variables["params"]["embedding_instance_articulation"]["embedding"]
    interp = interpolate_articulations(tbl)
    assert interp.shape == (19, 32)
    np.testing.assert_allclose(np.asarray(interp[0]), np.asarray(tbl[0]))
    np.testing.assert_allclose(np.asarray(interp[2]), np.asarray(tbl[1]))
    np.testing.assert_allclose(
        np.asarray(interp[1]), np.asarray(0.5 * (tbl[0] + tbl[1])), rtol=1e-6
    )
    # test-time lookup goes through the interpolated table
    out_test = lib.apply(variables, jnp.array(0), jnp.array(1), is_test=True)
    np.testing.assert_allclose(
        np.asarray(out_test["articulation"][0]), np.asarray(interp[1]), rtol=1e-6
    )


def test_joint_state_decoder_shapes():
    dec = JointStateDecoder()
    variables = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
    p = variables["params"]
    assert p["fc1"]["kernel"].shape == (32, 64)
    assert p["fc2"]["kernel"].shape == (64, 32)
    assert p["fc_joint_state"]["kernel"].shape == (32, 1)
    out = dec.apply(variables, jnp.zeros((4, 32)))
    assert out.shape == (4, 1)


def test_bf16_compute_path():
    """bf16 compute dtype must produce outputs close to fp32 (TPU mode)."""
    rays = _rays(B=8)
    key = jax.random.PRNGKey(0)
    m32 = VanillaNeRF(num_coarse_samples=16, num_fine_samples=16)
    m16 = VanillaNeRF(num_coarse_samples=16, num_fine_samples=16, dtype=jnp.bfloat16)
    params = m32.init(key, rays, None, False, True, 2.0, 6.0)
    o32 = m32.apply(params, rays, None, False, True, 2.0, 6.0)
    o16 = m16.apply(params, rays, None, False, True, 2.0, 6.0)
    assert o16[1][0].dtype == jnp.float32  # heads stay fp32
    np.testing.assert_allclose(
        np.asarray(o32[1][0]), np.asarray(o16[1][0]), atol=0.06
    )

"""Ray-generation tests: pinhole conventions, normalization contract, radii,
spheric poses, AABB slab test."""

import numpy as np

from aon_tpu.core import rays


def test_ray_directions_center_pixel_no_half_offset():
    H, W, f = 4, 6, 10.0
    d = rays.get_ray_directions(H, W, f)
    assert d.shape == (H, W, 3)
    # pixel (j=H/2, i=W/2) maps exactly to the optical axis (no +0.5 offset)
    np.testing.assert_allclose(d[H // 2, W // 2], [0.0, 0.0, -1.0], atol=1e-7)
    # x grows to the right, y decreases downward (y-up camera)
    assert d[0, W - 1, 0] > 0 and d[0, 0, 0] < 0
    assert d[0, 0, 1] > 0 and d[H - 1, 0, 1] < 0


def test_get_rays_identity_pose_and_normalization_contract():
    H, W, f = 8, 8, 20.0
    d = rays.get_ray_directions(H, W, f)
    c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], axis=1).astype(
        np.float32
    )
    o, viewdirs, rd, radii = rays.get_rays(d, c2w, output_view_dirs=True, output_radii=True)
    assert o.shape == (64, 3) and viewdirs.shape == (64, 3) and radii.shape == (64,)
    np.testing.assert_allclose(o[0], [1.0, 2.0, 3.0], atol=1e-6)
    # parity contract: BOTH direction outputs are unit-norm (reference
    # normalizes in place through an alias, ray_utils.py:145-147)
    np.testing.assert_allclose(np.linalg.norm(viewdirs, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(viewdirs, rd, atol=1e-7)
    assert (radii > 0).all()


def test_radii_from_unnormalized_deltas():
    H, W, f = 4, 4, 2.0
    d = rays.get_ray_directions(H, W, f)
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)
    _, _, _, radii = rays.get_rays(d, c2w, output_view_dirs=True, output_radii=True)
    raw = d.reshape(H, W, 3)
    dx = np.sqrt(((raw[:-1] - raw[1:]) ** 2).sum(-1))
    dx = np.concatenate([dx, dx[-2:-1]], axis=0)
    expected = (dx[..., None] * 2 / np.sqrt(12.0)).reshape(-1)
    np.testing.assert_allclose(radii, expected, rtol=1e-5)


def test_spheric_poses_radius_and_count():
    poses = rays.create_spheric_poses(radius=4.0)
    assert poses.shape == (40, 4, 4)
    centers = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 4.0, rtol=1e-5)
    # rotations are orthonormal
    R = poses[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (40, 1, 1)), atol=1e-5)


def test_ndc_rays_bounds():
    H, W, f = 8, 8, 10.0
    d = rays.get_ray_directions(H, W, f)
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)
    o, rd = rays.get_rays(d, c2w)
    o_ndc, d_ndc = rays.get_ndc_rays(H, W, f, 1.0, o, rd)
    # after the shift, origins sit on the near plane: o2 = 1 + 2*near/oz
    assert o_ndc.shape == o.shape and d_ndc.shape == rd.shape
    np.testing.assert_allclose(d_ndc[:, 2], 1.0 - o_ndc[:, 2], atol=1e-5)


def test_ray_box_intersection_hits_and_misses():
    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rays_o = np.array(
        [
            [0.0, 0.0, 5.0],  # outside, pointing in -> hit
            [0.0, 0.0, 5.0],  # outside, pointing away -> miss
            [0.0, 0.0, 0.0],  # origin inside -> reference semantics: miss
            [5.0, 5.0, 5.0],  # diagonal miss
        ]
    )
    rays_d = np.array(
        [
            [0.0, 0.0, -1.0],
            [0.0, 0.0, 1.0],
            [0.0, 0.0, -1.0],
            [1.0, 0.0, 0.0],
        ]
    )
    hit, tnear, tfar = rays.ray_box_intersection(bounds, rays_o, rays_d)
    assert hit.tolist() == [True, False, False, False]
    np.testing.assert_allclose(tnear[0], 4.0, atol=1e-6)
    np.testing.assert_allclose(tfar[0], 6.0, atol=1e-6)

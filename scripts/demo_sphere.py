"""Render an analytic solid sphere through the aon_tpu core pipeline.

End-to-end smoke/verify driver for the library surface: ray generation ->
stratified coarse sampling -> compositing -> inverse-CDF fine resampling ->
compositing -> PNG.  No learned model involved, so any regression here is in
the math, not the weights.

Usage: JAX_PLATFORMS=cpu python scripts/demo_sphere.py --out /tmp/sphere.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from aon_tpu.core import img2mse, mse2psnr, sample_along_rays, sample_pdf, volumetric_rendering
from aon_tpu.core.rays import create_spheric_poses, get_ray_directions, get_rays


def field(pts):
    inside = (jnp.linalg.norm(pts, axis=-1, keepdims=True) < 1.0).astype(jnp.float32)
    sigma = 50.0 * inside
    rgb = jnp.concatenate([inside, 0.2 * inside, 0.2 * inside], -1)
    return rgb, sigma


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/aon_sphere.png")
    ap.add_argument("--hw", nargs=2, type=int, default=[120, 160])
    args = ap.parse_args()
    H, W = args.hw

    poses = create_spheric_poses(radius=4.0)
    dirs = get_ray_directions(H, W, focal=150.0 * W / 160)
    o, vd, rd, radii = get_rays(dirs, poses[0][:3, :4], output_view_dirs=True, output_radii=True)
    o, rd = jnp.asarray(o), jnp.asarray(rd)

    key = jax.random.PRNGKey(0)
    t, pts = sample_along_rays(key, o, rd, 64, 2.0, 6.0, randomized=True)
    rgb, sigma = field(pts)
    comp, acc, weights, depth = volumetric_rendering(rgb, sigma, t, rd, white_bkgd=True)

    t_mids = 0.5 * (t[..., 1:] + t[..., :-1])
    t2, pts2 = sample_pdf(key, t_mids, weights[..., 1:-1], o, rd, t, 128, randomized=True)
    rgb2, sigma2 = field(pts2)
    comp2, acc2, w2, depth2 = volumetric_rendering(rgb2, sigma2, t2, rd, white_bkgd=True)

    img = np.clip(np.asarray(comp2).reshape(H, W, 3), 0, 1)
    accv = np.asarray(acc2).reshape(H, W)
    print("acc range", accv.min(), accv.max(), "mean", accv.mean())
    print("coarse-vs-fine psnr:", float(mse2psnr(img2mse(comp, comp2))))

    from PIL import Image

    Image.fromarray((img * 255).astype(np.uint8)).save(args.out)
    print("saved", args.out)

    tz, _ = sample_pdf(
        key, t_mids, jnp.zeros_like(weights[..., 1:-1]), o, rd, t, 128, randomized=False
    )
    tz = np.asarray(tz)
    assert np.isfinite(tz).all() and (np.diff(tz, axis=-1) >= 0).all()
    print("probe zero-weight sample_pdf: finite+sorted OK")


if __name__ == "__main__":
    main()

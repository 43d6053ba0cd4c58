"""Extract explicit geometry (density grid, point cloud, surface mesh) from a
trained checkpoint.

The reference ships a family of offline geometry debuggers
(``visualize_nerf/vis_voxel_grid.py`` views mesh files in pyvista;
``viz_utils.py`` scatter-plots points) but nothing that pulls geometry OUT of
a trained NeRF.  This closes that loop natively: query the fine-level density
field on a regular grid over the scene AABB and emit

* ``density_grid.npz`` — raw float sigma grid + bounds (for downstream tools),
* ``points.ply``       — occupied-voxel point cloud, colored by the radiance
                         field at a fixed viewdir (opens in meshlab/open3d),
* ``mesh.obj``         — watertight boundary-face surface mesh (the occupied/
                         empty interface; no external marching-cubes dep).

Works for all three systems: vanilla (fine NeRFMLP), auto-decoder
(latent-conditioned fine ArticulatedNeRFMLP at any instance/articulation id,
including the odd interpolated ids from the 2N-1 midpoint table), and the
auto-encoder (latents encoded from a train frame's source image).

Occupancy threshold: ``--threshold auto`` marks a voxel occupied when a ray
crossing a 4-voxel span of it would reach alpha > 0.5, i.e.
``sigma > ln(2) / (4 * voxel_size)`` — resolution-independent, no hand
tuning.  (A 1-voxel crossing rule proved too strict for thin articulated
geometry: on the trained scissors at 160^3 it kept only the densest blade
cores; the 4-voxel rule recovers the full blades.)

Usage:
  python scripts/extract_geometry.py --config configs/quality_laptop_autodec_24k_aabb24.json \
      [--ckpt last.ckpt] [--resolution 160] [--instance 0] [--articulation 4] \
      [--threshold auto] [--out geometry]
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS"):
    # the image's sitecustomize force-registers the TPU backend; the
    # programmatic override wins (same trick as run.py) — lets
    # `JAX_PLATFORMS=cpu` extract on host while the chip trains
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def density_color_fn(trainer, args):
    """Build a jitted (points (N,3)) -> (sigma (N,), rgb (N,3)) closure for
    the trained system (fine level only — it is the one supervised at the
    final sample density)."""
    import jax
    import jax.numpy as jnp

    from aon_tpu.core import sampling

    cfg = trainer.cfg
    params = trainer.state.params
    system = trainer.system
    viewdir = np.array(args.viewdir, dtype=np.float32)
    viewdir /= max(np.linalg.norm(viewdir), 1e-8)

    if cfg.exp_type == "vanilla":
        if jax.default_backend() != "cpu":
            # ride the hardware-proven fused eval kernel (see the
            # articulated branch below for why the unfused apply can't)
            from aon_tpu.ops import (
                fused_nerf_mlp_xyz,
                make_posenc_constants,
                pack_vanilla_mlp_params,
            )

            packed = pack_vanilla_mlp_params(params["model"]["fine_mlp"])
            enc_consts = make_posenc_constants()

            @jax.jit
            def query(pts):
                n = pts.shape[0]
                S = 128
                pos = pts.reshape(n // S, S, 3)
                vdir = jnp.broadcast_to(jnp.asarray(viewdir)[None], (n // S, 3))
                raw_rgb, raw_sigma = fused_nerf_mlp_xyz(packed, enc_consts, pos, vdir)
                return (
                    jax.nn.relu(raw_sigma.reshape(n)),
                    jax.nn.sigmoid(raw_rgb.reshape(n, 3)),
                )

            return query

        from aon_tpu.models.mlp import NeRFMLP

        mlp = NeRFMLP(dtype=system.model.dtype)
        mlp_params = {"params": params["model"]["fine_mlp"]}

        @jax.jit
        def query(pts):
            # (N,3) -> (B,S,3): the MLPs are compiled/tested at multi-sample
            # ray shapes; per-point S=1 shapes SIGILL the TPU compiler
            n = pts.shape[0]
            S = 128
            p = pts.reshape(n // S, S, 3)
            enc = sampling.pos_enc(p, system.model.min_deg_point, system.model.max_deg_point)
            vdir = jnp.broadcast_to(jnp.asarray(viewdir)[None], (n // S, 3))
            venc = sampling.pos_enc(vdir, 0, system.model.deg_view)
            raw_rgb, raw_sigma = mlp.apply(mlp_params, enc, venc)
            return (
                jax.nn.relu(raw_sigma.reshape(n)),
                jax.nn.sigmoid(raw_rgb.reshape(n, 3)),
            )

        return query

    # articulated systems: latents + fine ArticulatedNeRFMLP
    from aon_tpu.models.articulated import ArticulatedNeRFMLP

    model = system.model
    mlp = ArticulatedNeRFMLP(
        min_deg_point=model.min_deg_point,
        max_deg_point=model.max_deg_point,
        enc_after=model.enc_after,
        use_deg_embedding=model.use_deg_embedding,
        dtype=model.dtype,
    )
    mlp_params = {"params": params["model"]["fine_mlp"]}

    if cfg.exp_type == "vanilla_autodecoder":
        latents = system.code_library.apply(
            {"params": params["code_library"]},
            jnp.array(args.instance, dtype=jnp.int32),
            jnp.array(args.articulation, dtype=jnp.int32),
            is_test=args.interpolated,
        )
    elif cfg.exp_type == "vanilla_ae_art":
        # encode a source frame at the requested articulation (train degrees
        # are 10*articulation, reference sapien_multi.py:11-14)
        ds = trainer.test_dataset
        instance_dir = ds.ids[args.instance % len(ds.ids)]
        deg_dirs = ds._degree_dirs(instance_dir)
        deg_dir = deg_dirs[args.articulation % len(deg_dirs)]
        img = ds._read_frame(instance_dir, deg_dir, args.image_id)[3]
        src = ((np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5).transpose(2, 0, 1)
        deg_rad = np.deg2rad(float(deg_dir.split("_")[0]))
        latents, _pred_state = system._encode(
            params, jnp.asarray(src)[None],
            jnp.asarray([deg_rad], dtype=jnp.float32),
        )
    else:
        raise SystemExit(f"unsupported exp_type {cfg.exp_type!r}")

    sigma_act = getattr(model, "sigma_activation", "softplus_bias")
    density_bias = getattr(model, "density_bias", -1.0)
    rgb_padding = getattr(model, "rgb_padding", 0.0)

    if jax.default_backend() != "cpu":
        # the Pallas fused eval kernel is the hardware-proven articulated
        # path (the unfused flax apply SIGILLs the relay's XLA TPU compile
        # on this graph); grid points ride it as (B, S, 3) "samples"
        from aon_tpu.ops.fused_art import fused_art_mlp_eval

        @jax.jit
        def query(pts):
            n = pts.shape[0]
            S = 128
            B = n // S
            pos = pts.reshape(B, S, 3)
            vdir = jnp.broadcast_to(jnp.asarray(viewdir)[None], (B, 3))
            raw_rgb, raw_sigma = fused_art_mlp_eval(
                mlp_params["params"], latents, pos, vdir, tile=min(1024, B)
            )
            sigma, rgb = _art_activations(
                raw_sigma, raw_rgb, sigma_act, density_bias, rgb_padding
            )
            return sigma.reshape(n), rgb.reshape(n, 3)

        return query

    @jax.jit
    def query(pts):
        n = pts.shape[0]
        S = 128
        pos = pts.reshape(n // S, S, 3)
        vdir = jnp.broadcast_to(jnp.asarray(viewdir)[None], (n // S, 3))
        venc = sampling.pos_enc(vdir, 0, model.deg_view)
        if not model.enc_after:
            pos = sampling.pos_enc(pos, model.min_deg_point, model.max_deg_point)
        raw_rgb, raw_sigma = mlp.apply(mlp_params, pos, venc, latents)
        sigma, rgb = _art_activations(
            raw_sigma, raw_rgb, sigma_act, density_bias, rgb_padding
        )
        return sigma.reshape(n), rgb.reshape(n, 3)

    return query


def _art_activations(raw_sigma, raw_rgb, sigma_act, density_bias, rgb_padding):
    import jax
    import jax.numpy as jnp

    if sigma_act == "softplus_bias":
        sigma = jax.nn.softplus(raw_sigma + density_bias)
    else:
        sigma = jax.nn.relu(raw_sigma)
    rgb = jax.nn.sigmoid(raw_rgb)
    if rgb_padding > 0:
        rgb = jnp.clip(rgb * (1 + 2 * rgb_padding) - rgb_padding, 0.0, 1.0)
    return sigma, rgb


def write_ply(path, pts, colors):
    with open(path, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        c = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        for p, q in zip(pts, c):
            fh.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {q[0]} {q[1]} {q[2]}\n")


def boundary_mesh(occ, lo, voxel):
    """Boundary-face surface mesh of a bool grid: one quad per occupied-voxel
    face whose neighbor is empty.  Vertices deduplicated on the corner
    lattice; quads split into triangles.  Returns (verts (V,3), tris (T,3))."""
    corner_id = {}
    verts = []
    tris = []

    def vid(i, j, k):
        key = (i, j, k)
        n = corner_id.get(key)
        if n is None:
            n = len(verts)
            corner_id[key] = n
            verts.append(lo + voxel * np.array([i, j, k], dtype=np.float64))
        return n

    # face corner offsets per (axis, direction): CCW as seen from outside
    FACES = {
        (0, 1): [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
        (0, 0): [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
        (1, 1): [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],
        (1, 0): [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
        (2, 1): [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
        (2, 0): [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
    }
    padded = np.zeros(tuple(s + 2 for s in occ.shape), dtype=bool)
    padded[1:-1, 1:-1, 1:-1] = occ
    for (axis, sign), corners in FACES.items():
        shift = np.roll(np.array([1 if sign else -1, 0, 0]), axis)
        nb = np.roll(padded, -shift, axis=(0, 1, 2))[1:-1, 1:-1, 1:-1]
        ii, jj, kk = np.nonzero(occ & ~nb)
        for i, j, k in zip(ii, jj, kk):
            q = [vid(i + c[0], j + c[1], k + c[2]) for c in corners]
            tris.append((q[0], q[1], q[2]))
            tris.append((q[0], q[2], q[3]))
    return np.asarray(verts), np.asarray(tris, dtype=np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="required unless --from_grid")
    ap.add_argument("--ckpt", default="last.ckpt")
    ap.add_argument("--resolution", type=int, default=160)
    ap.add_argument("--threshold", default="auto", help='"auto" (= ln2/(4*voxel)) or a float sigma')
    ap.add_argument("--instance", type=int, default=0)
    ap.add_argument("--articulation", type=int, default=0)
    ap.add_argument("--interpolated", action="store_true",
                    help="index the interpolated 2N-1 latent table (odd ids = midpoints)")
    ap.add_argument("--image_id", type=int, default=0, help="source frame for the AE encoder")
    ap.add_argument("--viewdir", type=float, nargs=3, default=(0.0, 0.0, -1.0))
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--bounds", type=float, nargs=6, default=None,
                    help="xmin ymin zmin xmax ymax zmax (overrides the dataset AABB)")
    ap.add_argument("--out", default="geometry")
    ap.add_argument("--from_grid", default=None,
                    help="re-threshold a saved density_grid.npz (no model query; "
                         "colors fall back to density-shaded gray)")
    args = ap.parse_args()

    if args.from_grid:
        z = np.load(args.from_grid)
        sig_grid, bounds, voxel = z["sigma"], z["bounds"], float(z["voxel"])
        R = sig_grid.shape[0]
        lo = bounds[0]
        thr = (
            np.log(2.0) / (4.0 * voxel)
            if args.threshold == "auto"
            else float(args.threshold)
        )
        occ = sig_grid > thr
        out_dir = os.path.dirname(os.path.abspath(args.from_grid))
        axes = [np.linspace(lo[d] + 0.5 * voxel, lo[d] + (R - 0.5) * voxel, R) for d in range(3)]
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        shade = np.clip(sig_grid[occ] / max(float(sig_grid.max()), 1e-6), 0.2, 1.0)
        write_ply(os.path.join(out_dir, "points.ply"), grid[occ],
                  np.repeat(shade[:, None], 3, axis=1))
        verts, tris = boundary_mesh(occ, lo, voxel)
        with open(os.path.join(out_dir, "mesh.obj"), "w") as fh:
            for v in verts:
                fh.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
            for t in tris:
                fh.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
        print(
            f"occupied {int(occ.sum())}/{R ** 3} voxels (sigma>{thr:.2f}); "
            f"mesh {len(verts)} verts / {len(tris)} tris -> {out_dir}",
            flush=True,
        )
        return

    from aon_tpu.train.trainer import Trainer
    from aon_tpu.utils.config import get_config

    cfg = get_config(["--config", args.config])
    cfg.run_eval = True
    cfg.render_name = args.out
    trainer = Trainer(cfg)
    trainer.state = trainer._replicate(trainer.ckpt.restore(trainer.state, args.ckpt))

    # bounds: CLI > dataset AABB > depth-map AABB recomputed from the data
    if args.bounds is not None:
        bounds = np.asarray(args.bounds, dtype=np.float64).reshape(2, 3)
    elif getattr(trainer.test_dataset, "scene_bounds", None) is not None:
        bounds = np.asarray(trainer.test_dataset.scene_bounds, dtype=np.float64)
    else:
        from aon_tpu.data.aabb import scene_aabb

        ds = trainer.test_dataset
        dirs = []
        if hasattr(ds, "ids"):  # multi-instance layout
            for inst in ds.ids:
                base = os.path.join(ds.root_dir, inst, "train")
                dirs += [f.path for f in os.scandir(base) if f.is_dir()]
        else:
            dirs = [os.path.join(ds.root_dir, "train")]
        bounds = scene_aabb(dirs, ds.img_wh)
        if bounds is None:
            raise SystemExit("no depth data for AABB; pass --bounds explicitly")

    R = args.resolution
    lo, hi = bounds[0], bounds[1]
    voxel = float(np.max(hi - lo) / R)
    axes = [np.linspace(lo[d] + 0.5 * voxel, lo[d] + (R - 0.5) * voxel, R) for d in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

    if args.config is None:
        raise SystemExit("--config is required unless --from_grid is given")
    if args.chunk % 128:
        raise SystemExit("--chunk must be a multiple of 128 (points are blocked (B,128,3))")
    query = density_color_fn(trainer, args)
    n = grid.shape[0]
    sigma = np.empty(n, dtype=np.float32)
    rgb = np.empty((n, 3), dtype=np.float32)
    pad_to = ((n + args.chunk - 1) // args.chunk) * args.chunk
    pts_padded = np.zeros((pad_to, 3), dtype=np.float32)
    pts_padded[:n] = grid
    for s in range(0, pad_to, args.chunk):
        sg, cg = query(pts_padded[s : s + args.chunk])
        e = min(s + args.chunk, n)
        sigma[s:e] = np.asarray(sg)[: e - s]
        rgb[s:e] = np.asarray(cg)[: e - s]
        print(f"queried {e}/{n} grid points", flush=True)

    thr = np.log(2.0) / (4.0 * voxel) if args.threshold == "auto" else float(args.threshold)
    sig_grid = sigma.reshape(R, R, R)
    occ = sig_grid > thr

    out_dir = os.path.join("ckpts", cfg.exp_name, args.out)
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(out_dir, "density_grid.npz"),
        sigma=sig_grid, bounds=bounds, voxel=voxel, threshold=thr,
    )
    centers = grid.reshape(R, R, R, 3)[occ]
    write_ply(os.path.join(out_dir, "points.ply"), centers, rgb.reshape(R, R, R, 3)[occ])
    verts, tris = boundary_mesh(occ, lo, voxel)
    with open(os.path.join(out_dir, "mesh.obj"), "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
        for t in tris:
            fh.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
    print(
        f"occupied {int(occ.sum())}/{R ** 3} voxels (sigma>{thr:.2f}); "
        f"mesh {len(verts)} verts / {len(tris)} tris -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    main()

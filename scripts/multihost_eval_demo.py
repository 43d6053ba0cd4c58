"""Multi-process eval-gather validation (no hardware needed).

Launch N local CPU processes, each rendering a contiguous block of one
frame's rays with identical fixed-seed params, then assembling the full
frame via ``alter_gather_cat`` (the reference interface.py:31-51 analogue).
Every process writes the assembled frame; a single-process run writes the
golden frame for comparison.

    # golden
    python scripts/multihost_eval_demo.py --out /tmp/f_single.npz
    # 2-process
    python scripts/multihost_eval_demo.py --num_processes 2 --process_id 0 --out /tmp/f_p0.npz &
    python scripts/multihost_eval_demo.py --num_processes 2 --process_id 1 --out /tmp/f_p1.npz

Driven by tests/test_multihost.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--coordinator", default="localhost:19233")
    ap.add_argument("--wh", type=int, nargs=2, default=[32, 24])
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from aon_tpu.core.rays import create_spheric_poses, get_ray_directions, get_rays
    from aon_tpu.parallel.mesh import pad_to_multiple
    from aon_tpu.parallel.multihost import alter_gather_cat, process_ray_slice
    from aon_tpu.train.systems import VanillaSystem
    from aon_tpu.utils.config import Config

    w, h = args.wh
    cfg = Config(
        N_samples=4, N_importance=4, compute_dtype="float32", use_pallas=False,
        img_wh=[w, h],
    )
    system = VanillaSystem(cfg, near=2.0, far=6.0, white_bkgd=True)
    # identical fixed-seed params on every process
    params = system.init_state(jax.random.PRNGKey(0)).params

    focal = 0.7 * w
    directions = get_ray_directions(h, w, focal)
    c2w = np.asarray(create_spheric_poses(radius=4.0)[0], dtype=np.float32)[:3, :4]
    rays_o, viewdirs, rays_d, _ = get_rays(
        directions, c2w, output_view_dirs=True, output_radii=True
    )

    n = rays_o.shape[0]
    start, stop = process_ray_slice(n, args.process_id, args.num_processes)
    per = stop - start
    rays = {
        "rays_o": pad_to_multiple(np.asarray(rays_o), args.num_processes * args.chunk),
        "rays_d": pad_to_multiple(np.asarray(rays_d), args.num_processes * args.chunk),
        "viewdirs": pad_to_multiple(np.asarray(viewdirs), args.num_processes * args.chunk),
    }
    per_pad = -(-per // args.chunk) * args.chunk

    chunks = []
    for i in range(start, start + per_pad, args.chunk):
        chunk_rays = {
            k: jax.numpy.asarray(v[i : i + args.chunk]) for k, v in rays.items()
        }
        res = system.render_chunk(params, chunk_rays)
        chunks.append({k: np.asarray(v) for k, v in res.items()})
    # trim this process's padding tail so gathered blocks tile exactly
    local = {
        k: np.concatenate([c[k] for c in chunks], 0)[:per]
        for k in chunks[0]
    }

    frame = alter_gather_cat([local], (w, h))
    np.savez(args.out, **frame)
    print(f"p{args.process_id}: wrote {args.out} "
          f"(rays [{start}:{stop}) of {n}, processes={jax.process_count()})")


if __name__ == "__main__":
    main()

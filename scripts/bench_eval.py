"""Eval render latency benchmark: one full 640x480 frame on real hardware.

Two modes:

* default (no args): the REFERENCE-CONTRACT path — synthetic random rays,
  64+193 samples over the global [2, 6] interval, no AABB.  Prints one JSON
  line per chunk size: {"chunk": N, "frame_ms": M, "frames_per_sec": F}.

* ``--config configs/quality_...json``: the PRODUCTION path — a real val
  frame from the config's dataset through the exact trainer eval pipeline
  (``trainer._render_full`` logic: AABB per-ray intervals + hit-ray
  compaction when ``use_aabb``, config sample counts, config chunking).
  Prints {"mode": "production", "frame_ms": ..., "hit_frac": ...}.

Timing forces a host readback of the full frame (render_frame returns
numpy; the axon relay acks block_until_ready early — see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from aon_tpu.parallel import get_mesh
from aon_tpu.train.systems import VanillaSystem
from aon_tpu.utils.config import Config, get_config


def bench_reference_contract(chunks=(30720, 61440, 153600, 307200)) -> None:
    w, h = 640, 480
    mesh = get_mesh()
    cfg = Config(compute_dtype="bfloat16")
    system = VanillaSystem(cfg, near=2.0, far=6.0, white_bkgd=True)
    state = system.init_state(jax.random.PRNGKey(0))

    g = np.random.default_rng(0)
    d = g.normal(size=(w * h, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    frame = {
        "rays_o": (-4.0 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
    }

    import jax.numpy as jnp

    for chunk in chunks:
        rays = {k: jnp.asarray(v) for k, v in frame.items()}
        n = w * h

        def render_frame():
            outs = []
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                piece = {k: v[lo:hi] for k, v in rays.items()}
                if hi - lo < chunk:  # pad to static shape
                    pad = chunk - (hi - lo)
                    piece = {k: jnp.pad(v, ((0, pad), (0, 0)), mode="edge") for k, v in piece.items()}
                outs.append(system.render_chunk(state.params, piece)["comp_rgb"])
            return outs

        outs = render_frame()  # compile
        _ = float(outs[-1][0, 0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            outs = render_frame()
            _ = float(outs[-1][0, 0])  # forced readback
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "chunk": chunk, "frame_ms": round(dt * 1e3, 1),
            "frames_per_sec": round(1.0 / dt, 2),
        }), flush=True)


def bench_production(cfg: Config) -> None:
    """The trainer's real eval path on the config's dataset (random params:
    with AABB compaction the latency depends on scene geometry, not fit)."""
    from aon_tpu.data import dataset_dict
    from aon_tpu.eval.render import render_frame
    from aon_tpu.train.systems import build_system

    mesh = get_mesh()
    ds = dataset_dict[cfg.dataset_name](
        split="val", root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh),
        white_back=cfg.white_back, use_aabb=cfg.use_aabb, aabb_pad=cfg.aabb_pad,
        use_occgrid=cfg.use_occgrid, occgrid_res=cfg.occgrid_res,
        occgrid_dilate=cfg.occgrid_dilate,
    )
    if not hasattr(ds, "full_frame"):
        raise SystemExit(
            "--config production mode drives single-scene (sapien) datasets; "
            "articulated eval frames are 320x240 (reference README.md:105) — "
            "far below the 640x480 latency budget this benchmark measures"
        )
    system = build_system(cfg, ds.near, ds.far, cfg.white_back, mesh=mesh)
    state = system.init_state(jax.random.PRNGKey(0))
    frame = ds.full_frame(0)
    n = frame["rays_o"].shape[0]
    hit_frac = float(np.mean(frame["hit"])) if "hit" in frame else 1.0

    chunk = min(cfg.chunk, 61440) if jax.default_backend() == "tpu" else cfg.chunk
    miss_fill = None
    if "hit" in frame:
        bg = 1.0 if cfg.white_back else 0.0
        miss_fill = {"comp_rgb": bg, "acc": 0.0, "depth": 0.0}

    def chunk_fn(rays, **ex):
        return system.render_chunk(state.params, rays, **ex)

    def run():
        return render_frame(chunk_fn, frame, mesh, chunk, miss_fill=miss_fill)

    out = run()  # compile
    assert out["comp_rgb"].shape[0] == n
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
        _ = float(out["comp_rgb"][0, 0])  # render_frame returns host numpy
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "mode": "production", "config": cfg.config,
        "img_wh": list(cfg.img_wh), "samples": [cfg.N_samples, cfg.N_importance],
        "use_aabb": bool(cfg.use_aabb), "hit_frac": round(hit_frac, 4),
        "chunk": chunk, "frame_ms": round(dt * 1e3, 1),
        "frames_per_sec": round(1.0 / dt, 2),
    }), flush=True)


def main() -> None:
    if any(a.startswith("--config") for a in sys.argv[1:]):
        bench_production(get_config())
    elif any(a.startswith("--chunks") for a in sys.argv[1:]):
        i = sys.argv.index("--chunks")
        bench_reference_contract(tuple(int(c) for c in sys.argv[i + 1].split(",")))
    else:
        bench_reference_contract()


if __name__ == "__main__":
    main()

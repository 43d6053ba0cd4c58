"""Eval render latency benchmark: one full 640x480 frame on real hardware.

Prints one JSON line per chunk size:
  {"chunk": N, "frame_ms": M, "frames_per_sec": F}

Timing forces a host readback of a scalar derived from the frame (the axon
relay acks block_until_ready early — see BASELINE.md timing notes).
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
from aon_tpu.utils.config import Config


def main() -> None:
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

    for chunk in (30720, 61440):
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


if __name__ == "__main__":
    main()

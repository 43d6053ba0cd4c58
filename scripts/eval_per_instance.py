"""Per-instance test sweep for multi-instance (N_max_objs > 1) scenes.

The reference's test path evaluates ONE seeded instance per sweep
(``sapien_multi.py`` test split picks a random ``val_idx``); for the
latent-capacity evidence (e.g. the 4-instance laptop scene) we want the
19-frame spheric sweep scored separately for EVERY instance in the code
library.  Writes ``ckpts/<exp_name>/per_instance.json``::

    {"instances": [{"instance": 0, "PSNR": ..., "PSNR_obj": ..., "SSIM": ...,
                    "each": [...]}, ...],
     "interp": {"learned_mean": ..., "interp_mean": ...}}

Usage:
    python scripts/eval_per_instance.py --config configs/quality_laptop4_autodec.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from aon_tpu.eval import metrics as M
from aon_tpu.train.trainer import Trainer
from aon_tpu.utils.config import get_config


def main() -> None:
    cfg = get_config()
    cfg.run_eval = True
    trainer = Trainer(cfg)
    trainer.state = trainer._replicate(
        trainer.ckpt.restore(trainer.state, cfg.ckpt_path)
    )
    ds = trainer.test_dataset
    n_inst = len(ds.ids)
    n_frames = len(ds)
    w, h = cfg.img_wh
    rows = []
    for inst in range(n_inst):
        psnrs, objs, ssims = [], [], []
        for i in range(n_frames):
            frame = ds.test_frame(i, seed=cfg.seed, instance=inst)
            ret = trainer._render_full(trainer.state.params, frame, is_test=True)
            pred = ret["comp_rgb"].reshape(h, w, 3)
            tgt = np.asarray(frame["target"]).reshape(h, w, 3)
            msk = np.asarray(frame["instance_mask"]).reshape(h, w)
            psnrs.append(M.psnr(pred, tgt))
            objs.append(M.psnr_masked(pred, tgt, msk))
            ssims.append(M.ssim(pred, tgt))
        rows.append(
            {
                "instance": inst,
                "id": ds.ids[inst],
                "PSNR": float(np.mean(psnrs)),
                "PSNR_obj": float(np.nanmean(objs)),
                "SSIM": float(np.mean(ssims)),
                "each": [float(v) for v in psnrs],
            }
        )
        print(
            f"instance {inst} ({ds.ids[inst]}): PSNR {rows[-1]['PSNR']:.2f} "
            f"obj {rows[-1]['PSNR_obj']:.2f} SSIM {rows[-1]['SSIM']:.4f}",
            flush=True,
        )
    # interpolation smoothness: frames at even idx use LEARNED articulation
    # latents (trained degrees 0,10,..,90 at 5 deg/frame), odd idx the 2N-1
    # midpoint-interpolated codes (code_library.py test interpolation)
    all_each = np.array([r["each"] for r in rows])
    out = {
        "instances": rows,
        "interp": {
            "learned_mean": float(all_each[:, ::2].mean()),
            "interp_mean": float(all_each[:, 1::2].mean()),
            "adjacent_abs_dpsnr_mean": float(np.abs(np.diff(all_each, axis=1)).mean()),
        },
    }
    path = os.path.join("ckpts", cfg.exp_name, "per_instance.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

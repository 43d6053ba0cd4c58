"""Metric sinks: stdout + JSONL (always), wandb (if importable).

Reference metric names preserved (SURVEY.md §5): train/psnr0, train/psnr1,
train/loss, train/loss/reg, train/lr, val/psnr, val/psnr_obj,
test/{psnr,ssim,lpips,psnr_obj}, val/state_error_rad.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricLogger:
    def __init__(self, logdir: str, stdout_every: int = 50):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self.stdout_every = stdout_every
        self._t0 = time.time()
        self._wandb = None
        if os.environ.get("WANDB_PROJECT"):
            try:
                import wandb

                wandb.init(project=os.environ["WANDB_PROJECT"])
                self._wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, float], force_stdout: bool = False) -> None:
        rec = {"step": int(step), "time": time.time() - self._t0}
        for k, v in metrics.items():
            try:
                rec[k] = float(np.asarray(v))
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(rec, step=step)
        if force_stdout or (self.stdout_every and step % self.stdout_every == 0):
            msg = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k != "time"
            )
            print(f"[{rec['time']:8.1f}s] {msg}", flush=True)

    def log_image(self, step: int, tag: str, image: np.ndarray, logdir: str) -> str:
        from PIL import Image

        imgdir = os.path.join(logdir, "val_images")
        os.makedirs(imgdir, exist_ok=True)
        path = os.path.join(imgdir, f"{tag.replace('/', '_')}_{step}.png")
        Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8)).save(path)
        if self._wandb is not None:
            self._wandb.log({tag: self._wandb.Image(path)}, step=step)
        return path

    def close(self):
        self._fh.close()

"""Generate a SYNTHETIC (random-weight) LPIPS VGG16 .npz for plumbing tests.

This image has no network egress, so the real torchvision VGG16 weights
cannot be downloaded (see weights/README.md).  This script writes an .npz
with the exact key/shape layout `scripts/convert_lpips_weights.py` produces
— random conv filters, non-negative 1x1 lin heads — plus a `__synthetic__`
marker so every eval artifact computed with it is labeled
``"lpips_weights": "synthetic"`` in results.json (aon_tpu/eval/lpips.py
reads the marker).  The resulting LPIPS VALUES are meaningless as a
perceptual metric; the point is to execute the full LPIPS path end-to-end
(load -> VGG taps -> unit-normalize -> lin heads -> results.json) in a
committed artifact.

    python scripts/make_synthetic_lpips_weights.py --out weights/lpips_vgg.synthetic.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aon_tpu.eval.lpips import _TAPS, _VGG_CFG  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg.synthetic.npz")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    g = np.random.default_rng(args.seed)
    params = {"__synthetic__": np.array(True)}
    cin, conv_idx, tap_channels = 3, 0, []
    for item in _VGG_CFG:
        if item == "M":
            continue
        # He-scaled random filters keep activations in a sane range through
        # 13 conv layers (pure-random N(0,1) filters overflow float32)
        std = np.sqrt(2.0 / (9 * cin))
        params[f"conv{conv_idx}_w"] = g.normal(0, std, (3, 3, cin, item)).astype(np.float32)
        params[f"conv{conv_idx}_b"] = np.zeros(item, np.float32)
        if conv_idx in _TAPS:
            tap_channels.append(item)
        cin = item
        conv_idx += 1
    for i, c in enumerate(tap_channels):
        params[f"lin{i}_w"] = np.abs(g.normal(0, 1.0 / c, (1, 1, c, 1))).astype(np.float32)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **params)
    print(f"wrote SYNTHETIC lpips weights to {args.out} "
          f"({conv_idx} convs, {len(tap_channels)} lin heads)")


if __name__ == "__main__":
    main()

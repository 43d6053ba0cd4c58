"""Thin-geometry GT-resolution ceiling analysis.

Question (VERDICT round 3, item 5): is the scissors auto-decoder's low
object-PSNR (~16 dB vs laptop's ~19.5) model-limited or limited by the
320x240 ground truth itself?

Method: re-render the SAME test_spheric frames at 640x480 with the same
datagen config/seed, area-downsample 2x2 to 320x240 (the antialiased
"ideal" image a continuous radiance field could at best reproduce), and
score it against the committed point-sampled 320x240 GT on object pixels.
Rasterization aliasing is pose-dependent high-frequency noise a smooth 3D
field cannot reproduce, so

    PSNR_obj(antialiased ideal, point-sampled GT)

is an effective ceiling for any NeRF's object-PSNR on that GT.  Also
reports the object's edge-pixel fraction (pixels whose 3x3 neighborhood
leaves the seg mask) — thin blades are nearly ALL edge.

Usage:
    python scripts/analyze_gt_ceiling.py \
        --lo data/scissors_multi/scissors_0/test_spheric \
        --hi /tmp/scissors_hi/scissors_0/test_spheric \
        --out results/scissors_gt_ceiling/analysis.json
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_rgb(path):
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float64) / 255.0


def load_seg(path):
    a = np.asarray(Image.open(path))
    if a.ndim == 3:
        a = a[..., 0]
    return a > 0


def downsample2(img):
    h, w = img.shape[:2]
    return img.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))


def psnr(a, b, m):
    mse = float(np.mean(((a - b) ** 2)[m]))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def edge_fraction(seg):
    from scipy import ndimage  # available in image

    er = ndimage.binary_erosion(seg, np.ones((3, 3)))
    n = seg.sum()
    return float((seg & ~er).sum() / max(n, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lo", required=True, help="320x240 test_spheric dir")
    p.add_argument("--hi", required=True, help="640x480 test_spheric dir")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    frames = sorted(os.listdir(os.path.join(args.lo, "rgb")))
    rows = []
    for f in frames:
        lo = load_rgb(os.path.join(args.lo, "rgb", f))
        seg = load_seg(os.path.join(args.lo, "seg", f))
        hi = load_rgb(os.path.join(args.hi, "rgb", f))
        ideal = downsample2(hi)
        m3 = np.repeat(seg[..., None], 3, axis=-1)
        rows.append(
            {
                "frame": f,
                "psnr_obj_ceiling": psnr(ideal, lo, m3),
                "psnr_full": psnr(ideal, lo, np.ones_like(m3, bool)),
                "obj_pixels": int(seg.sum()),
                "edge_fraction": edge_fraction(seg),
            }
        )
        print(rows[-1], flush=True)

    out = {
        "method": "area-downsampled 640x480 re-render (antialiased ideal) vs "
        "point-sampled 320x240 GT, object pixels only",
        "frames": rows,
        "psnr_obj_ceiling_mean": float(np.mean([r["psnr_obj_ceiling"] for r in rows])),
        "psnr_full_mean": float(np.mean([r["psnr_full"] for r in rows])),
        "obj_pixels_mean": float(np.mean([r["obj_pixels"] for r in rows])),
        "edge_fraction_mean": float(np.mean([r["edge_fraction"] for r in rows])),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"\nobject-PSNR ceiling {out['psnr_obj_ceiling_mean']:.2f} dB, "
        f"edge fraction {out['edge_fraction_mean']:.2f}, "
        f"mean object pixels {out['obj_pixels_mean']:.0f} -> {args.out}"
    )


if __name__ == "__main__":
    main()

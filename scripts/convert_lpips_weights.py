"""One-time torch->numpy conversion of LPIPS VGG16 weights.

Run on a machine WITH torchvision + lpips weights available:

    python scripts/convert_lpips_weights.py weights/lpips_vgg.npz

Produces an .npz with conv{i}_w (HWIO), conv{i}_b, lin{i}_w (1,1,C,1)
consumed by aon_tpu/eval/lpips.py.  Golden-check: compare a few image pairs
against piqa/lpips on the source machine before shipping the file.
"""

import sys

import numpy as np


def main(out_path: str):
    try:
        import torch
        import torchvision
    except ImportError:
        sys.exit("torchvision not available in this image; run elsewhere and copy the npz")

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    params = {}
    conv_idx = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            w = layer.weight.detach().numpy()  # (O, I, kh, kw)
            params[f"conv{conv_idx}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            params[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
            conv_idx += 1

    # LPIPS linear heads: require the `lpips` package weights
    try:
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        for i, lin in enumerate(net.lins):
            w = lin.model[1].weight.detach().numpy()  # (1, C, 1, 1)
            params[f"lin{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # (1,1,C,1)
    except ImportError:
        # fall back to uniform weighting (documented approximation)
        taps = [64, 128, 256, 512, 512]
        for i, c in enumerate(taps):
            params[f"lin{i}_w"] = np.full((1, 1, c, 1), 1.0 / c, np.float32)
        print("WARNING: lpips package missing; wrote uniform linear heads")

    np.savez(out_path, **params)
    print(f"wrote {out_path} with {len(params)} arrays")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/lpips_vgg.npz")

"""One-time torch->numpy conversion of ResNet-34 backbone weights for
``ImgEncoderMultiHeadArt`` (aon_tpu/models/resnet.py).

The reference initializes its encoder from torchvision's ImageNet resnet34
(``models/resnet_encoder.py:311``) and then swaps every BatchNorm2d for an
affine-free InstanceNorm2d (``resnet_encoder.py:23-48``) — which discards ALL
batch-norm parameters.  The portable weight set is therefore exactly the conv
kernels; this script extracts them into an .npz keyed by flax param paths.

Usage, on a machine with torchvision + network access:

    python scripts/convert_resnet_weights.py weights/resnet34.npz

or from a saved state_dict (``torch.save(model.state_dict(), "sd.pt")``):

    python scripts/convert_resnet_weights.py weights/resnet34.npz --state_dict sd.pt

Load the result with ``ImgEncoderMultiHeadArt.params_from_npz`` — the shared
trunk takes conv1..layer3 and every head's layer4 copy is initialized from
the same torchvision layer4 (matching the reference, which deep-copies
layer4 per head: ``resnet_encoder.py:365-391``).  The head Linear layers have
no torchvision counterpart and keep their random init.

Golden-tested in tests/test_weight_convert.py against a torch forward pass.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# ResNet-34 stage plan (torchvision layerN naming): (layer index, num blocks)
RESNET34_BLOCKS = ((1, 3), (2, 4), (3, 6), (4, 3))


def convert_state_dict(sd) -> dict:
    """torchvision resnet34 state_dict -> {flax_param_path: HWIO ndarray}.

    Accepts torch tensors or numpy arrays as values.  Only conv kernels are
    converted (OIHW -> HWIO); norm statistics/affine params are dropped (the
    reference replaces BatchNorm with affine-free InstanceNorm).
    """

    def hwio(w):
        w = np.asarray(getattr(w, "detach", lambda: w)())
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    out = {"conv1/kernel": hwio(sd["conv1.weight"])}
    for layer, n_blocks in RESNET34_BLOCKS:
        for b in range(n_blocks):
            pre = f"layer{layer}.{b}."
            dst = f"layer{layer}/block{b}/"
            out[dst + "conv1/kernel"] = hwio(sd[pre + "conv1.weight"])
            out[dst + "conv2/kernel"] = hwio(sd[pre + "conv2.weight"])
            if pre + "downsample.0.weight" in sd:
                out[dst + "downsample/kernel"] = hwio(sd[pre + "downsample.0.weight"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out", nargs="?", default="weights/resnet34.npz")
    ap.add_argument("--state_dict", default=None,
                    help="path to a torch.save()d resnet34 state_dict")
    args = ap.parse_args(argv)

    if args.state_dict:
        import torch

        sd = torch.load(args.state_dict, map_location="cpu", weights_only=True)
    else:
        try:
            import torchvision
        except ImportError:
            sys.exit(
                "torchvision not available in this image; run elsewhere (or pass "
                "--state_dict) and copy the npz"
            )
        sd = torchvision.models.resnet34(weights="IMAGENET1K_V1").state_dict()

    params = convert_state_dict(sd)
    np.savez(args.out, **params)
    print(f"wrote {args.out} with {len(params)} conv kernels")


if __name__ == "__main__":
    main()

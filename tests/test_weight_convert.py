"""Golden tests for the torch->flax weight converters.

torchvision is absent in this image, so each test builds a torch module with
torchvision-compatible state_dict keys (and BatchNorm already swapped for
affine-free InstanceNorm, exactly as the reference's ``convert_batch_norm``
does — resnet_encoder.py:23-48), random-initializes it, runs the converter on
its state_dict, loads the result into the flax model, and asserts the two
forward passes agree.  This proves converter + loader + flax architecture
equivalence; pointing the converter at real torchvision weights is then a
pure data swap.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


class TBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.InstanceNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.InstanceNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.InstanceNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet34(tnn.Module):
    """torchvision.models.resnet34-compatible keys, instance-norm variant."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.InstanceNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        plan = [(64, 64, 3, 1), (64, 128, 4, 2), (128, 256, 6, 2), (256, 512, 3, 2)]
        for i, (cin, cout, n, s) in enumerate(plan, start=1):
            blocks = [
                TBlock(cin if b == 0 else cout, cout, s if b == 0 else 1)
                for b in range(n)
            ]
            setattr(self, f"layer{i}", tnn.Sequential(*blocks))

    def trunk(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        return self.layer3(x)


def test_resnet34_convert_golden(tmp_path):
    from convert_resnet_weights import convert_state_dict

    from aon_tpu.models.resnet import ImgEncoderMultiHeadArt

    torch.manual_seed(0)
    tmodel = TorchResNet34().eval()
    heads = {
        "color": tnn.Linear(512, 128),
        "density": tnn.Linear(512, 128),
        "articulation": tnn.Linear(512, 32),
    }

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        feat = tmodel.trunk(x)
        h4 = tmodel.layer4(feat)  # every flax head gets this same layer4
        pooled = h4.mean(dim=(2, 3))
        torch_out = {k: fc(pooled).numpy() for k, fc in heads.items()}

    npz = tmp_path / "resnet34.npz"
    np.savez(npz, **convert_state_dict(tmodel.state_dict()))

    enc = ImgEncoderMultiHeadArt()
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))["params"]
    params = ImgEncoderMultiHeadArt.params_from_npz(params, str(npz))
    # head fc layers have no torchvision counterpart; align them by hand
    for k, fc in heads.items():
        params[f"{k}_fc"]["kernel"] = jnp.asarray(fc.weight.detach().numpy().T)
        params[f"{k}_fc"]["bias"] = jnp.asarray(fc.bias.detach().numpy())

    out = enc.apply({"params": params}, jnp.asarray(x.numpy()))
    for k in torch_out:
        np.testing.assert_allclose(
            np.asarray(out[k]), torch_out[k], rtol=2e-3, atol=2e-4, err_msg=k
        )


def test_params_from_npz_rejects_bad_shapes(tmp_path):
    from aon_tpu.models.resnet import ImgEncoderMultiHeadArt

    enc = ImgEncoderMultiHeadArt()
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))["params"]
    np.savez(tmp_path / "bad.npz", **{"conv1/kernel": np.zeros((3, 3, 3, 64), np.float32)})
    with pytest.raises(ValueError, match="shape mismatch"):
        ImgEncoderMultiHeadArt.params_from_npz(params, str(tmp_path / "bad.npz"))
    np.savez(tmp_path / "missing.npz", **{"layerX/kernel": np.zeros((1,), np.float32)})
    with pytest.raises(KeyError):
        ImgEncoderMultiHeadArt.params_from_npz(params, str(tmp_path / "missing.npz"))


# ---------------------------------------------------------------- LPIPS VGG


def _torch_vgg_features(convs, x, taps):
    feats = []
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512]
    ci = 0
    h = x
    for item in cfg:
        if item == "M":
            h = torch.max_pool2d(h, 2, 2)
            continue
        h = torch.relu(convs[ci](h))
        if ci in taps:
            feats.append(h)
        ci += 1
    return feats


def test_lpips_convert_golden(tmp_path):
    """Torch LPIPS computation (unit-normalize, sq-diff, 1x1 lin, spatial
    mean, sum over taps — the piqa/lpips formulation the reference uses,
    interface.py:113-123) vs aon_tpu/eval/lpips.py on converted weights."""
    from aon_tpu.eval import lpips as L

    torch.manual_seed(1)
    cfg = L._VGG_CFG
    taps = sorted(L._TAPS)
    convs = []
    cin = 3
    for item in cfg:
        if item == "M":
            continue
        convs.append(tnn.Conv2d(cin, item, 3, 1, 1))
        cin = item
    lins = [tnn.Conv2d(convs[t].out_channels, 1, 1, bias=False) for t in taps]
    for lin in lins:
        with torch.no_grad():
            lin.weight.abs_()  # LPIPS lin heads are non-negative

    params = {}
    for i, conv in enumerate(convs):
        params[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lins):
        params[f"lin{i}_w"] = lin.weight.detach().numpy().transpose(2, 3, 1, 0)
    npz = tmp_path / "lpips_vgg.npz"
    np.savez(npz, **params)

    rng = np.random.default_rng(0)
    pred = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    gt = rng.uniform(size=(32, 32, 3)).astype(np.float32)

    def torch_lpips(a, b):
        def prep(img):
            img = img * 2.0 - 1.0
            img = (img - L._SHIFT) / L._SCALE
            return torch.from_numpy(img.transpose(2, 0, 1)[None].copy())

        fa = _torch_vgg_features(convs, prep(a), set(taps))
        fb = _torch_vgg_features(convs, prep(b), set(taps))
        total = 0.0
        for fx, fy, lin in zip(fa, fb, lins):
            nx = fx / (fx.norm(dim=1, keepdim=True) + 1e-10)
            ny = fy / (fy.norm(dim=1, keepdim=True) + 1e-10)
            total = total + lin((nx - ny) ** 2).mean()
        return float(total)

    with torch.no_grad():
        want = torch_lpips(pred, gt)

    import os

    os.environ["AON_LPIPS_WEIGHTS"] = str(npz)
    L.lpips_fn.cache_clear()
    try:
        fn = L.lpips_fn()
        assert fn is not None
        got = fn(pred, gt)
    finally:
        del os.environ["AON_LPIPS_WEIGHTS"]
        L.lpips_fn.cache_clear()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

"""Weight converters: torch modules -> JAX params, output parity."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eventad_tpu.models.convert import _conv_hwio, convert_resnet  # noqa
from eventad_tpu.models.resnet import resnet_forward  # noqa: E402


class TorchBottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchMiniResNet50(torch.nn.Module):
    """torchvision-resnet50-compatible structure (same state dict keys)."""

    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (n, planes) in enumerate(zip(blocks, (64, 128, 256, 512)),
                                         start=1):
            layers = []
            for bi in range(n):
                stride = 2 if (li > 1 and bi == 0) else 1
                down = None
                if stride != 1 or inplanes != planes * 4:
                    down = torch.nn.Sequential(
                        torch.nn.Conv2d(inplanes, planes * 4, 1, stride,
                                        bias=False),
                        torch.nn.BatchNorm2d(planes * 4))
                layers.append(TorchBottleneck(inplanes, planes, stride,
                                              down))
                inplanes = planes * 4
            setattr(self, f"layer{li}", torch.nn.Sequential(*layers))

    def forward(self, x):
        taps = {}
        x = self.conv1(x)
        taps["conv1"] = x
        x = self.maxpool(self.relu(self.bn1(x)))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            taps[f"layer{li}"] = x
        return taps


def test_resnet_conversion_matches_torch(rng):
    torch.manual_seed(0)
    tm = TorchMiniResNet50(blocks=(1, 1, 1, 1))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, state = convert_resnet(sd, "resnet50")
    # our init builds (3,4,6,3); with (1,1,1,1) keys the converted dicts
    # simply have 1 block per layer — the forward iterates what exists
    x = rng.rand(1, 32, 48, 3).astype(np.float32)
    with torch.no_grad():
        taps_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    taps_j, _ = resnet_forward(params, state, jnp.asarray(x),
                               "resnet50", training=False)
    for k in ("conv1", "layer1", "layer2", "layer3", "layer4"):
        a = np.asarray(taps_j[k]).transpose(0, 3, 1, 2)
        b = taps_t[k].numpy()
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_full_model_export_convert_roundtrip(tmp_path):
    """export_torch_checkpoints -> convert_full_model must be the identity
    on every parameter and BN statistic (the parity.py fixture path)."""
    from eventad_tpu.config import Config
    from eventad_tpu.models.convert import (convert_full_model,
                                            export_torch_checkpoints)
    from eventad_tpu.models.dagr import init_model

    cfg = Config(batch_size=1, width=48, height=36, scale=1, use_image=True,
                 event_buckets=(256,), graph_lookback=64)
    params, state, _, _ = init_model(jax.random.PRNGKey(3), cfg)
    dagr_pth = str(tmp_path / "dagr.pth")
    head_pth = str(tmp_path / "head.pth")
    export_torch_checkpoints(params, state, cfg, dagr_pth, head_pth)

    params2, state2, _, _ = convert_full_model(cfg, dagr_pth, head_pth)

    flat1, _ = jax.tree_util.tree_flatten((params, state))
    flat2, _ = jax.tree_util.tree_flatten((params2, state2))
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stem_s2d_matches_direct_conv(rng):
    """The space-to-depth rewrite of conv1 (7x7/s2/pad3 on 3 channels ->
    4x4/s1 on 12) is the same linear map; only reduction order differs."""
    from eventad_tpu.models.resnet import _conv, _stem_conv_s2d
    x = jnp.asarray(rng.randn(2, 48, 72, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))
    direct = _conv(x, w, stride=2, padding=[(3, 3), (3, 3)])
    s2d = _stem_conv_s2d(x, w)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)
    # odd spatial dims fall back to the direct conv
    x_odd = jnp.asarray(rng.randn(1, 47, 72, 3).astype(np.float32))
    assert _stem_conv_s2d(x_odd, w).shape == (1, 24, 36, 16)

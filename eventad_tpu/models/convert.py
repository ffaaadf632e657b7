"""Torch -> JAX weight converters for parity evaluation.

The reference ships torch checkpoints: ``dagr_s_50.pth`` (DAGR detector,
loaded from its ``['ema']`` entry, reference utils/model.py:31-32),
``best_rol.pth`` (the trained EventAD head) and torchvision's pretrained
ResNet-50. These functions map their state dicts onto this framework's
parameter pytrees. Layout notes:

* torch conv weights ``[O, I, H, W]`` -> HWIO.
* torch Linear ``[O, I]`` -> ``[I, O]`` (transposed).
* torch GRU weight_ih/hh ``[3H, In]`` -> ``[In, 3H]`` (gate order r, z, n is
  identical).
* torch_spline_conv kernels ``[K^2, Cin, Cout]`` index dim-0 fastest, the
  same flat convention as :mod:`eventad_tpu.ops.spline` — copied verbatim.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(a):
    return np.asarray(a).T


def _conv_hwio(a):
    return np.asarray(a).transpose(2, 3, 1, 0)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "ema" in obj:
        obj = obj["ema"]
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().numpy() for k, v in obj.items()}


# ---------------------------------------------------------------------------
# GRU / EventAD head
# ---------------------------------------------------------------------------
def convert_gru(sd: Dict[str, np.ndarray], prefix: str, n_layers: int):
    from .gru import GRULayerParams, GRUParams
    import jax.numpy as jnp
    layers = []
    for i in range(n_layers):
        layers.append(GRULayerParams(
            jnp.asarray(_t(sd[f"{prefix}.weight_ih_l{i}"])),
            jnp.asarray(_t(sd[f"{prefix}.weight_hh_l{i}"])),
            jnp.asarray(sd[f"{prefix}.bias_ih_l{i}"]),
            jnp.asarray(sd[f"{prefix}.bias_hh_l{i}"])))
    return GRUParams(tuple(layers))


def convert_eventad_head(sd: Dict[str, np.ndarray]):
    """best_rol.pth (EventADModel state dict, dagr submodule excluded) ->
    EventADParams. Key names from models/EventAD.py:141-176."""
    import jax.numpy as jnp
    from .eventad import EventADParams, FusionParams
    fusion = FusionParams(
        jnp.asarray(_t(sd["fusion_module.event_proj.weight"])),
        jnp.asarray(sd["fusion_module.event_proj.bias"]),
        jnp.asarray(_t(sd["fusion_module.coord_proj.weight"])),
        jnp.asarray(sd["fusion_module.coord_proj.bias"]),
        jnp.asarray(_t(sd["fusion_module.fusion.0.weight"])),
        jnp.asarray(sd["fusion_module.fusion.0.bias"]),
        jnp.asarray(_t(sd["fusion_module.fusion.3.weight"])),
        jnp.asarray(sd["fusion_module.fusion.3.bias"]))
    return EventADParams(
        convert_gru(sd, "gru_net_event.gru", 2),
        convert_gru(sd, "gru_net_cor.gru", 1),
        fusion,
        jnp.asarray(sd["soft_attention.weight"]),
        jnp.asarray(sd["soft_attention_cor.weight"]))


# ---------------------------------------------------------------------------
# ResNet CNN branch
# ---------------------------------------------------------------------------
def convert_resnet(sd: Dict[str, np.ndarray], arch: str = "resnet50",
                   prefix: str = ""):
    """torchvision resnet state dict -> (params, state) nested dicts
    matching :func:`eventad_tpu.models.resnet.init_resnet`."""
    import jax.numpy as jnp
    from .resnet import LAYER_SPECS
    _, expansion = LAYER_SPECS[arch]
    # infer the actual block counts from the state dict (robust to trimmed
    # variants used in tests)
    blocks = []
    for li in range(1, 5):
        n = 0
        while f"{prefix}layer{li}.{n}.conv1.weight" in sd:
            n += 1
        blocks.append(n)
    g = lambda k: jnp.asarray(sd[prefix + k])

    def bn(k):
        return ({"scale": g(f"{k}.weight"), "offset": g(f"{k}.bias")},
                {"mean": g(f"{k}.running_mean"),
                 "var": g(f"{k}.running_var")})

    params: Dict = {"conv1": jnp.asarray(_conv_hwio(sd[prefix + "conv1.weight"]))}
    state: Dict = {}
    params["bn1"], state["bn1"] = bn("bn1")
    for li, n in enumerate(blocks, start=1):
        lp, ls = [], []
        for bi in range(n):
            base = f"layer{li}.{bi}"
            bp, bs = {}, {}
            if expansion == 4:
                for ci in (1, 2, 3):
                    bp[f"c{ci}"] = jnp.asarray(
                        _conv_hwio(sd[f"{prefix}{base}.conv{ci}.weight"]))
                    bp[f"b{ci}"], bs[f"b{ci}"] = bn(f"{base}.bn{ci}")
            else:
                for ci in (1, 2):
                    bp[f"c{ci}"] = jnp.asarray(
                        _conv_hwio(sd[f"{prefix}{base}.conv{ci}.weight"]))
                    bp[f"b{ci}"], bs[f"b{ci}"] = bn(f"{base}.bn{ci}")
            if f"{prefix}{base}.downsample.0.weight" in sd:
                bp["down"] = jnp.asarray(
                    _conv_hwio(sd[f"{prefix}{base}.downsample.0.weight"]))
                bp["down_bn"], bs["down_bn"] = bn(f"{base}.downsample.1")
            lp.append(bp)
            ls.append(bs)
        params[f"layer{li}"] = lp
        state[f"layer{li}"] = ls
    return params, state


# ---------------------------------------------------------------------------
# DAGR backbone (spline convs + BN + pooling-free layers)
# ---------------------------------------------------------------------------
def convert_spline_conv(sd, prefix, bias=False):
    import jax.numpy as jnp
    from ..ops.spline_conv import SplineConvParams
    w = jnp.asarray(sd[f"{prefix}.weight"])          # [K^2, Cin, Cout]
    root = jnp.asarray(_t(sd[f"{prefix}.lin.weight"])) \
        if f"{prefix}.lin.weight" in sd else None
    b = jnp.asarray(sd[f"{prefix}.bias"]) \
        if bias and f"{prefix}.bias" in sd else None
    return SplineConvParams(w, root, b)


def convert_bn(sd, prefix):
    import jax.numpy as jnp
    from ..ops.norm import BatchNormParams, BatchNormState
    # torch_geometric BatchNorm nests a torch BatchNorm1d at .module
    key = prefix if f"{prefix}.weight" in sd else f"{prefix}.module"
    return (BatchNormParams(jnp.asarray(sd[f"{key}.weight"]),
                            jnp.asarray(sd[f"{key}.bias"])),
            BatchNormState(jnp.asarray(sd[f"{key}.running_mean"]),
                           jnp.asarray(sd[f"{key}.running_var"])))


def convert_backbone(sd: Dict[str, np.ndarray], prefix="backbone."):
    """dagr_s_50.pth['ema'] -> (BackboneParams, BackboneState). Layer names
    from reference net.py:73-97 (conv_block1, layer2..layer5, each a Layer
    with conv_block1/conv_block2 + skip lin)."""
    import jax.numpy as jnp
    from .backbone import (BackboneParams, BackboneState, ConvBlockParams,
                           ConvBlockState, LayerParams, LayerState)
    names = ["conv_block1", "layer2", "layer3", "layer4", "layer5"]
    lps, lss = [], []
    for nm in names:
        base = f"{prefix}{nm}"
        b1 = ConvBlockParams(
            convert_spline_conv(sd, f"{base}.conv_block1.conv"),
            convert_bn(sd, f"{base}.conv_block1.norm")[0])
        s1 = ConvBlockState(convert_bn(sd, f"{base}.conv_block1.norm")[1])
        b2 = ConvBlockParams(
            convert_spline_conv(sd, f"{base}.conv_block2.conv"),
            convert_bn(sd, f"{base}.conv_block2.norm")[0])
        s2 = ConvBlockState(convert_bn(sd, f"{base}.conv_block2.norm")[1])
        lin_w = jnp.asarray(_t(sd[f"{base}.conv_block2.lin.mlp.weight"]))
        lin_b = jnp.asarray(sd.get(
            f"{base}.conv_block2.lin.mlp.bias",
            np.zeros(lin_w.shape[1], np.float32)))
        skip_bn, skip_bn_s = convert_bn(sd, f"{base}.conv_block2.norm_skip")
        lps.append(LayerParams(b1, lin_w, lin_b, b2, skip_bn))
        lss.append(LayerState(s1, s2, skip_bn_s))
    return BackboneParams(tuple(lps)), BackboneState(tuple(lss))

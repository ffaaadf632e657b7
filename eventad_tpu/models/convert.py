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


# ---------------------------------------------------------------------------
# CNN branch (HookModule: resnet + 1x1 remap convs) and full-model assembly
# ---------------------------------------------------------------------------
def convert_cnn_branch(sd: Dict[str, np.ndarray], arch: str = "resnet50",
                       prefix: str = "backbone.net."):
    """HookModule weights (reference net_img.py:42-90: ``module`` resnet +
    ``feature_dconv``/``output_dconv`` 1x1 ModuleLists) -> the nested dicts
    of :func:`eventad_tpu.models.resnet.init_cnn_branch`."""
    import jax.numpy as jnp
    rp, rs = convert_resnet(sd, arch, prefix=prefix + "module.")

    def dconvs(name):
        out, i = [], 0
        while f"{prefix}{name}.{i}.weight" in sd:
            out.append({
                "w": jnp.asarray(_conv_hwio(sd[f"{prefix}{name}.{i}.weight"])),
                "b": jnp.asarray(sd[f"{prefix}{name}.{i}.bias"])})
            i += 1
        return out

    return ({"resnet": rp, "feature_dconv": dconvs("feature_dconv"),
             "output_dconv": dconvs("output_dconv")}, rs)


def convert_full_model(cfg, dagr_path: str, eventad_path: str = None):
    """Assemble ModelParams/ModelState from the reference's torch
    checkpoints: ``dagr_s_50.pth`` (loaded from its ['ema'] entry like
    reference utils/model.py:31-32) and optionally ``best_rol.pth`` (the
    trained EventAD head, reference utils/model.py:80-90). Missing
    ``eventad_path`` leaves the head randomly initialised (parity on the
    frozen feature path only)."""
    import jax
    from .dagr import DAGRParams, DAGRState, ModelParams, ModelState, \
        init_model
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)

    sd = load_torch_state_dict(dagr_path)
    bp, bs = convert_backbone(sd, prefix="backbone.")
    cp, cs = (None, None)
    if cfg.use_image:
        cp, cs = convert_cnn_branch(sd, cfg.img_net, prefix="backbone.net.")

    hp = params.head
    if eventad_path:
        hsd = load_torch_state_dict(eventad_path)
        hsd = {k.removeprefix("module."): v for k, v in hsd.items()
               if not k.startswith(("dagr_model.", "module.dagr_model."))}
        hp = convert_eventad_head(hsd)

    return (ModelParams(DAGRParams(bp, cp), hp),
            ModelState(DAGRState(bs, cs)), bc, mc)


# ---------------------------------------------------------------------------
# Inverse export: JAX params -> reference-format torch checkpoints.
# Used by parity.py's fixture mode so the converted-checkpoint path is
# exercised end-to-end (round trip: export -> convert == identity) even
# before the real dagr_s_50.pth / best_rol.pth are available.
# ---------------------------------------------------------------------------
def _export_bn(out, prefix, bp, bs):
    out[f"{prefix}.module.weight"] = np.asarray(bp.scale)
    out[f"{prefix}.module.bias"] = np.asarray(bp.offset)
    out[f"{prefix}.module.running_mean"] = np.asarray(bs.mean)
    out[f"{prefix}.module.running_var"] = np.asarray(bs.var)


def export_backbone(bp, bs, prefix="backbone.") -> Dict[str, np.ndarray]:
    names = ["conv_block1", "layer2", "layer3", "layer4", "layer5"]
    out: Dict[str, np.ndarray] = {}
    for nm, lp, ls in zip(names, bp.layers, bs.layers):
        base = f"{prefix}{nm}"
        out[f"{base}.conv_block1.conv.weight"] = np.asarray(
            lp.block1.conv.weight)
        if lp.block1.conv.root is not None:
            out[f"{base}.conv_block1.conv.lin.weight"] = _t(
                lp.block1.conv.root)
        _export_bn(out, f"{base}.conv_block1.norm", lp.block1.bn,
                   ls.block1.bn)
        out[f"{base}.conv_block2.conv.weight"] = np.asarray(
            lp.block2.conv.weight)
        if lp.block2.conv.root is not None:
            out[f"{base}.conv_block2.conv.lin.weight"] = _t(
                lp.block2.conv.root)
        _export_bn(out, f"{base}.conv_block2.norm", lp.block2.bn,
                   ls.block2.bn)
        out[f"{base}.conv_block2.lin.mlp.weight"] = _t(lp.skip_lin)
        out[f"{base}.conv_block2.lin.mlp.bias"] = np.asarray(lp.skip_lin_bias)
        _export_bn(out, f"{base}.conv_block2.norm_skip", lp.skip_bn,
                   ls.skip_bn)
    return out


def export_resnet(rp, rs, prefix="") -> Dict[str, np.ndarray]:
    def oihw(a):
        return np.asarray(a).transpose(3, 2, 0, 1)

    out = {prefix + "conv1.weight": oihw(rp["conv1"])}

    def bn(key, p, s):
        out[f"{prefix}{key}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}{key}.bias"] = np.asarray(p["offset"])
        out[f"{prefix}{key}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}{key}.running_var"] = np.asarray(s["var"])

    bn("bn1", rp["bn1"], rs["bn1"])
    for li in range(1, 5):
        for bi, (bpb, bsb) in enumerate(zip(rp[f"layer{li}"],
                                            rs[f"layer{li}"])):
            base = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                if f"c{ci}" not in bpb:
                    continue
                out[f"{prefix}{base}.conv{ci}.weight"] = oihw(bpb[f"c{ci}"])
                bn(f"{base}.bn{ci}", bpb[f"b{ci}"], bsb[f"b{ci}"])
            if "down" in bpb:
                out[f"{prefix}{base}.downsample.0.weight"] = oihw(
                    bpb["down"])
                bn(f"{base}.downsample.1", bpb["down_bn"], bsb["down_bn"])
    return out


def export_cnn_branch(cp, cs, prefix="backbone.net.") -> Dict[str, np.ndarray]:
    def oihw(a):
        return np.asarray(a).transpose(3, 2, 0, 1)

    out = export_resnet(cp["resnet"], cs, prefix=prefix + "module.")
    for name in ("feature_dconv", "output_dconv"):
        for i, d in enumerate(cp[name]):
            out[f"{prefix}{name}.{i}.weight"] = oihw(d["w"])
            out[f"{prefix}{name}.{i}.bias"] = np.asarray(d["b"])
    return out


def export_gru(gp, prefix) -> Dict[str, np.ndarray]:
    out = {}
    for i, l in enumerate(gp.layers):
        out[f"{prefix}.weight_ih_l{i}"] = _t(l.w_ih)
        out[f"{prefix}.weight_hh_l{i}"] = _t(l.w_hh)
        out[f"{prefix}.bias_ih_l{i}"] = np.asarray(l.b_ih)
        out[f"{prefix}.bias_hh_l{i}"] = np.asarray(l.b_hh)
    return out


def export_eventad_head(hp) -> Dict[str, np.ndarray]:
    f = hp.fusion
    out = {
        "fusion_module.event_proj.weight": _t(f.event_proj_w),
        "fusion_module.event_proj.bias": np.asarray(f.event_proj_b),
        "fusion_module.coord_proj.weight": _t(f.coord_proj_w),
        "fusion_module.coord_proj.bias": np.asarray(f.coord_proj_b),
        "fusion_module.fusion.0.weight": _t(f.fuse1_w),
        "fusion_module.fusion.0.bias": np.asarray(f.fuse1_b),
        "fusion_module.fusion.3.weight": _t(f.fuse2_w),
        "fusion_module.fusion.3.bias": np.asarray(f.fuse2_b),
        "soft_attention.weight": np.asarray(hp.att_event_w),
        "soft_attention_cor.weight": np.asarray(hp.att_coord_w),
    }
    out.update(export_gru(hp.gru_event, "gru_net_event.gru"))
    out.update(export_gru(hp.gru_coord, "gru_net_cor.gru"))
    return out


def export_torch_checkpoints(params, state, cfg, dagr_path: str,
                             eventad_path: str):
    """Write reference-format .pth files (dagr under ['ema'], EventAD head
    flat) from a ModelParams/ModelState pytree."""
    import torch
    sd = export_backbone(params.dagr.backbone, state.dagr.backbone)
    if cfg.use_image and params.dagr.cnn is not None:
        sd.update(export_cnn_branch(params.dagr.cnn, state.dagr.cnn))
    to_t = lambda d: {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in d.items()}
    torch.save({"ema": to_t(sd)}, dagr_path)
    torch.save({"model": to_t(export_eventad_head(params.head))},
               eventad_path)

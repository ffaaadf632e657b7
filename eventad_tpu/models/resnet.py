"""Functional ResNet feature-pyramid CNN branch (NHWC, TPU-friendly).

Replaces the reference's torchvision ResNet-50 wrapped in ``HookModule``
(src/dagr/model/networks/net_img.py:42-135): forward hooks there capture
``conv1`` (pre-BN), ``layer1..layer4`` outputs as the feature pyramid and
``layer3``/``layer4`` as detection-head inputs, each remapped by a 1x1 conv.

Params/state are plain nested dicts (pytrees); a torch->JAX weight converter
can fill them from a torchvision checkpoint for parity runs.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

LAYER_SPECS = {
    "resnet18": ([2, 2, 2, 2], 1),
    "resnet34": ([3, 4, 6, 3], 1),
    "resnet50": ([3, 4, 6, 3], 4),
}


def _conv(x, w, stride=1, padding=None):
    # torch-style symmetric padding ((k-1)//2 both sides) — XLA "SAME" pads
    # asymmetrically under stride 2, which breaks weight-conversion parity
    if padding is None:
        ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
        padding = [(ph, ph), (pw, pw)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_apply(x, p, s, training, momentum=0.1, eps=1e-5):
    if training:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        cnt = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * cnt / max(cnt - 1, 1)
        ns = {"mean": (1 - momentum) * s["mean"] + momentum * mean,
              "var": (1 - momentum) * s["var"] + momentum * unbiased}
        y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["offset"]
        return y, ns
    # eval: fold scale*rsqrt(var+eps) / offset-mean*a in f32 (running stats
    # stay f32 regardless of the compute dtype — ops/norm.py convention),
    # cast only the folded affine to x.dtype
    f32 = jnp.float32
    a = p["scale"].astype(f32) * jax.lax.rsqrt(s["var"].astype(f32) + eps)
    b = p["offset"].astype(f32) - s["mean"].astype(f32) * a
    return x * a.astype(x.dtype) + b.astype(x.dtype), s


def _stem_conv_s2d(x, w):
    """conv1 (7x7, stride 2, pad 3) via 2x2 space-to-depth.

    A stride-2 conv on 3 input channels runs the MXU at 3/8 of even its
    padded-channel tiling; regrouping 2x2 input pixels into channels makes
    it an equivalent 4x4 stride-1 conv on 12 channels at half the spatial
    rows (same math, ~3x less device time for the stem on TPU).

    Derivation: out[i,j] reads input rows 2i+dy-3, dy in [0,7).  Writing
    the offset r = dy-3 as 2R+py (py = r mod 2) maps each kernel row to
    s2d row offset R in [-2,1] and sub-pixel py — a 4-tap kernel over the
    s2d grid with padding (2,1).  (R=-2, py=0) has no source row (dy=-1)
    and stays zero.
    """
    b, h, wd, c = x.shape
    if h % 2 or wd % 2:
        return _conv(x, w, stride=2, padding=[(3, 3), (3, 3)])
    return _stem_conv_on_s2d(s2d_format(x), w)


def s2d_format(x):
    """2x2 space-to-depth regrouping ``[B, H, W, C] -> [B, H/2, W/2, 4C]``
    (channel packing (py, px, c)); pure reindexing, works on numpy arrays
    too — the batcher applies it host-side so the device never pays the
    sub-lane-shaped relayout copies (~0.19 ms/batch at [8,240,360,3])."""
    b, h, wd, c = x.shape
    x2 = x.reshape(b, h // 2, 2, wd // 2, 2, c)
    return x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)


def _stem_conv_on_s2d(x2, w, hwnc: bool = False):
    """The stem conv on an already space-to-depth'd input (see
    :func:`_stem_conv_s2d` for the derivation).  With ``hwnc`` the input is
    ``[H/2, W/2, B, 4C]`` (the batcher's shipping orientation — physically
    identical to the conv's preferred operand layout, so no relayout op
    exists between the batch parameter and the conv); output is NHWC either
    way."""
    c = w.shape[2]
    # w: [7,7,C,O] -> w2: [4,4,4C,O] with channel packing (py, px, c)
    cout = w.shape[-1]
    w2 = jnp.zeros((4, 4, 4 * c, cout), w.dtype)
    for dy in range(7):
        ry, py = (dy - 3) // 2 + 2, (dy - 3) % 2
        for dx in range(7):
            rx, px = (dx - 3) // 2 + 2, (dx - 3) % 2
            w2 = w2.at[ry, rx, (py * 2 + px) * c:(py * 2 + px) * c + c].set(
                w[dy, dx])
    if hwnc:
        return jax.lax.conv_general_dilated(
            x2, w2, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NCHW", "HWIO", "NHWC"))
    return _conv(x2, w2, stride=1, padding=[(2, 1), (2, 1)])


def _init_conv(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    std = (2.0 / fan) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout)) * std


def _init_bn(c):
    return ({"scale": jnp.ones((c,)), "offset": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def init_resnet(key, arch: str = "resnet50", in_channels: int = 3):
    blocks, expansion = LAYER_SPECS[arch]
    params: Dict = {}
    state: Dict = {}
    key, k = jax.random.split(key)
    params["conv1"] = _init_conv(k, 7, 7, in_channels, 64)
    params["bn1"], state["bn1"] = _init_bn(64)
    cin = 64
    for li, (n, planes) in enumerate(zip(blocks, [64, 128, 256, 512])):
        lp, ls = [], []
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            cout = planes * expansion
            bp, bs = {}, {}
            if expansion == 4:
                key, k1, k2, k3 = jax.random.split(key, 4)
                bp["c1"] = _init_conv(k1, 1, 1, cin, planes)
                bp["b1"], bs["b1"] = _init_bn(planes)
                bp["c2"] = _init_conv(k2, 3, 3, planes, planes)
                bp["b2"], bs["b2"] = _init_bn(planes)
                bp["c3"] = _init_conv(k3, 1, 1, planes, cout)
                bp["b3"], bs["b3"] = _init_bn(cout)
            else:
                key, k1, k2 = jax.random.split(key, 3)
                bp["c1"] = _init_conv(k1, 3, 3, cin, planes)
                bp["b1"], bs["b1"] = _init_bn(planes)
                bp["c2"] = _init_conv(k2, 3, 3, planes, cout)
                bp["b2"], bs["b2"] = _init_bn(cout)
            if stride != 1 or cin != cout:
                key, k1 = jax.random.split(key)
                bp["down"] = _init_conv(k1, 1, 1, cin, cout)
                bp["down_bn"], bs["down_bn"] = _init_bn(cout)
            lp.append(bp)
            ls.append(bs)
            cin = cout
        params[f"layer{li+1}"] = lp
        state[f"layer{li+1}"] = ls
    return params, state


def _bottleneck(x, bp, bs, training, expansion, stride):
    ns = {}
    identity = x
    if expansion == 4:
        h = _conv(x, bp["c1"])
        h, ns["b1"] = _bn_apply(h, bp["b1"], bs["b1"], training)
        h = jax.nn.relu(h)
        h = _conv(h, bp["c2"], stride=stride)
        h, ns["b2"] = _bn_apply(h, bp["b2"], bs["b2"], training)
        h = jax.nn.relu(h)
        h = _conv(h, bp["c3"])
        h, ns["b3"] = _bn_apply(h, bp["b3"], bs["b3"], training)
    else:
        h = _conv(x, bp["c1"], stride=stride)
        h, ns["b1"] = _bn_apply(h, bp["b1"], bs["b1"], training)
        h = jax.nn.relu(h)
        h = _conv(h, bp["c2"])
        h, ns["b2"] = _bn_apply(h, bp["b2"], bs["b2"], training)
    if "down" in bp:
        identity = _conv(x, bp["down"], stride=stride)
        identity, ns["down_bn"] = _bn_apply(identity, bp["down_bn"],
                                            bs["down_bn"], training)
    return jax.nn.relu(h + identity), ns


def resnet_forward(params, state, x, arch: str = "resnet50",
                   training: bool = False, x_is_s2d: bool = False):
    """Args: x ``[B, H, W, C]`` in [0, 1] (or its :func:`s2d_format` with
    ``x_is_s2d``). Returns (taps, new_state) where taps = dict with
    'conv1', 'layer1'..'layer4' feature maps (NHWC)."""
    _, expansion = LAYER_SPECS[arch]
    ns: Dict = {}
    taps: Dict = {}
    h = (_stem_conv_on_s2d(x, params["conv1"], hwnc=x_is_s2d == "nchw")
         if x_is_s2d else _stem_conv_s2d(x, params["conv1"]))
    taps["conv1"] = h                     # hook fires on conv1 module (pre-BN)
    h, ns["bn1"] = _bn_apply(h, params["bn1"], state["bn1"], training)
    h = jax.nn.relu(h)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li in range(1, 5):
        lp, ls = params[f"layer{li}"], state[f"layer{li}"]
        nls = []
        for bi, (bp, bs) in enumerate(zip(lp, ls)):
            # stride is structural: first block of layers 2-4 downsamples
            stride = 2 if (li > 1 and bi == 0) else 1
            h, nbs = _bottleneck(h, bp, bs, training, expansion, stride)
            nls.append(nbs)
        ns[f"layer{li}"] = nls
        taps[f"layer{li}"] = h
    return taps, ns


# ---------------------------------------------------------------------------
# HookModule equivalent: pyramid taps + 1x1 channel remaps
# ---------------------------------------------------------------------------
FEATURE_LAYERS = ("conv1", "layer1", "layer2", "layer3", "layer4")
OUTPUT_LAYERS = ("layer3", "layer4")


def tap_channels(arch: str):
    _, e = LAYER_SPECS[arch]
    base = {"conv1": 64, "layer1": 64 * e, "layer2": 128 * e,
            "layer3": 256 * e, "layer4": 512 * e}
    return ([base[l] for l in FEATURE_LAYERS],
            [base[l] for l in OUTPUT_LAYERS])


def init_cnn_branch(key, arch: str, feature_channels: List[int],
                    output_channels: List[int], in_channels: int = 3):
    """ResNet + the HookModule's 1x1 remap convs (net_img.py:70-90)."""
    key, k = jax.random.split(key)
    rp, rs = init_resnet(k, arch, in_channels)
    fch, och = tap_channels(arch)
    fmap, omap = [], []
    for cin, cout in zip(fch, feature_channels):
        key, k1, k2 = jax.random.split(key, 3)
        s = 1.0 / cin ** 0.5
        fmap.append({"w": jax.random.uniform(k1, (1, 1, cin, cout),
                                             minval=-s, maxval=s),
                     "b": jax.random.uniform(k2, (cout,), minval=-s,
                                             maxval=s)})
    for cin, cout in zip(och, output_channels):
        key, k1, k2 = jax.random.split(key, 3)
        s = 1.0 / cin ** 0.5
        omap.append({"w": jax.random.uniform(k1, (1, 1, cin, cout),
                                             minval=-s, maxval=s),
                     "b": jax.random.uniform(k2, (cout,), minval=-s,
                                             maxval=s)})
    return {"resnet": rp, "feature_dconv": fmap, "output_dconv": omap}, rs


def cnn_branch_forward(params, state, image, arch: str = "resnet50",
                       training: bool = False, compute_dtype: str = "float32",
                       image_s2d=None):
    """Returns (features [5 maps], outputs [2 maps], new_state), NHWC.
    ``compute_dtype="bfloat16"`` casts weights+activations (eval only; BN
    running stats stay f32 inside _bn_apply's affine).

    ``image_s2d``: optional host-staged ``s2d_format(image.astype(bf16))``
    (bit-identical reindexing done by the batcher) — skips the device-side
    cast + space-to-depth relayout on the bf16 eval path."""
    x_is_s2d = False
    if compute_dtype == "bfloat16" and not training:
        # weights/activations bf16; BN running stats stay f32 (the _bn_apply
        # eval path folds the affine in f32 from the untouched state)
        cast = lambda a: (a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a)
        params = jax.tree.map(cast, params)
        if image_s2d is not None:
            # shipped NCHW [B, 12, H/2, W/2] (batching.staged_inputs);
            # fed to the stem conv via NCHW dimension numbers
            image = image_s2d.astype(jnp.bfloat16)
            x_is_s2d = "nchw"
        else:
            image = image.astype(jnp.bfloat16)
    # Sublane-pad the batch: at b=6 the convs tile batch onto 8 sublanes
    # anyway, and the odd size makes XLA thread per-block relayout copies
    # through the branch — batch 8 measures FASTER in absolute time than
    # batch 6 (1.36 vs 1.61 ms device, tools/bench_cnn.py v2 vs v0). Dead
    # rows are exact no-ops here: convs are per-item and eval BN is a
    # per-channel affine of running stats. Eval only (training BN batch
    # statistics would see the zero rows), and only where the pad ratio
    # stays small (b=5..7 -> 8; never the streaming b=1 path).
    b_axis = 0
    b_in = image.shape[b_axis]
    pad_b = (-b_in) % 8 if (not training and 5 <= b_in <= 7) else 0
    if pad_b and os.environ.get("EVENTAD_CNN_PAD", "1") == "1":
        pads = [(0, 0)] * image.ndim
        pads[b_axis] = (0, pad_b)
        image = jnp.pad(image, pads)
    else:
        pad_b = 0
    taps, ns = resnet_forward(params["resnet"], state, image, arch, training,
                              x_is_s2d=x_is_s2d)
    feats = [
        _conv(taps[l], params["feature_dconv"][i]["w"])
        + params["feature_dconv"][i]["b"]
        for i, l in enumerate(FEATURE_LAYERS)]
    outs = [
        _conv(taps[l], params["output_dconv"][i]["w"])
        + params["output_dconv"][i]["b"]
        for i, l in enumerate(OUTPUT_LAYERS)]
    if pad_b:
        feats = [f[:b_in] for f in feats]
        outs = [o[:b_in] for o in outs]
    return feats, outs, ns

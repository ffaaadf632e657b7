"""Analytic roofline accounting for the inference forward.

Why analytic: round 3 moved most of the compute path into Pallas custom
calls, which XLA's cost model cannot see, and XLA's "bytes accessed" is a
pre-fusion logical count (BENCH_r02 recorded 18.74 GB/batch, which at the
round-3 device time would imply 2.1x the v5e's physical 819 GB/s — an
artifact, not a roofline).  Here both roofline numerators are computed from
the model architecture itself:

- ``flops``: *model* FLOPs — the algorithmic multiply-add count of the
  network (the standard MFU numerator).  Hardware-side extra work (the
  fused kernels' one-hot gather matmuls, padding lanes) is intentionally
  excluded: MFU answers "what fraction of peak went into the model's math".
- ``bytes``: *minimum* HBM traffic — every activation written once and read
  once by its consumer, weights read once, gathers counted at their logical
  volume (rows actually fetched).  Real traffic is >= this (gather
  amplification on TPU is ~4-5x the logical row bytes for narrow rows,
  CLAUDE.md measured), so ``bytes / time`` is a *lower bound* on achieved
  bandwidth and must come out <= the 819 GB/s physical peak.

Reference anchor for the habit of analytic accounting: the reference's
asynchronous runtime counts FLOPs analytically per layer
(src/dagr/asynchronous/flops/conv.py:4-37) rather than trusting a profiler.

Peaks (v5e): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

V5E_PEAK_FLOPS = 197e12     # bf16 MXU
V5E_PEAK_FLOPS_F32 = 98.5e12
V5E_PEAK_HBM = 819e9        # bytes/s


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# CNN branch (functional ResNet + 1x1 remaps, models/resnet.py)
# ---------------------------------------------------------------------------
def resnet_conv_list(arch: str, h: int, w: int
                     ) -> Tuple[List[tuple], Dict[str, tuple]]:
    """Enumerates every conv of models/resnet.resnet_forward as
    ``(kh, kw, cin, cout, ho, wo)`` plus the tap dims per feature layer."""
    from ..models.resnet import LAYER_SPECS
    blocks, expansion = LAYER_SPECS[arch]
    convs = []
    # stem: 7x7 s2 (the s2d rewrite is math-equivalent; count model flops)
    ho, wo = _ceil_div(h, 2), _ceil_div(w, 2)
    convs.append((7, 7, 3, 64, ho, wo))
    taps = {"conv1": (64, ho, wo)}
    # maxpool s2
    ho, wo = _ceil_div(ho, 2), _ceil_div(wo, 2)
    cin = 64
    for li, (n, planes) in enumerate(zip(blocks, [64, 128, 256, 512])):
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            cout = planes * expansion
            if stride == 2:
                ho, wo = _ceil_div(ho, 2), _ceil_div(wo, 2)
            if expansion == 4:
                hi, wi = (ho * stride, wo * stride) if stride == 2 \
                    else (ho, wo)
                convs.append((1, 1, cin, planes, hi, wi))      # c1 pre-stride
                convs.append((3, 3, planes, planes, ho, wo))   # c2 (strided)
                convs.append((1, 1, planes, cout, ho, wo))     # c3
            else:
                convs.append((3, 3, cin, planes, ho, wo))
                convs.append((3, 3, planes, cout, ho, wo))
            if stride != 1 or cin != cout:
                convs.append((1, 1, cin, cout, ho, wo))        # downsample
            cin = cout
        taps[f"layer{li+1}"] = (cin, ho, wo)
    return convs, taps


def cnn_branch_cost(arch: str, b: int, h: int, w: int,
                    feature_channels, output_channels, dsize: int):
    """(flops, bytes) of the CNN branch at batch ``b`` (logical batch; the
    sublane pad to 8 is hardware-side work, not model flops)."""
    from ..models.resnet import FEATURE_LAYERS, OUTPUT_LAYERS
    convs, taps = resnet_conv_list(arch, h, w)
    for i, l in enumerate(FEATURE_LAYERS):
        c, ho, wo = taps[l]
        convs.append((1, 1, c, feature_channels[i], ho, wo))
    for i, l in enumerate(OUTPUT_LAYERS):
        c, ho, wo = taps[l]
        convs.append((1, 1, c, output_channels[i], ho, wo))
    flops = 0.0
    bytes_ = float(b * h * w * 3 * 4)       # input image read (f32)
    for (kh, kw, cin, cout, ho, wo) in convs:
        flops += 2.0 * b * ho * wo * kh * kw * cin * cout
        # each conv output is written once and read once by its consumer
        # (2x out bytes); inputs are the producers' outputs, already counted
        bytes_ += dsize * (2.0 * b * ho * wo * cout
                           + kh * kw * cin * cout)     # weights
    return flops, bytes_


# ---------------------------------------------------------------------------
# GNN backbone + head
# ---------------------------------------------------------------------------
def spline_conv_cost(n_nodes: int, n_edges: int, cin: int, cout: int,
                     kernel_size: int, dsize: int):
    """Model flops of one spline conv in the basis-decomposed (= LUT) form
    (utils/flops.spline_conv_flops): per-edge 4-tap basis mixing, per-node
    M=k^2 weighted-sum + kernel matmul, plus the root linear.  Bytes: node
    features in/out once + the logical gather volume (neighbour rows
    actually combined) + kernel weights."""
    m = kernel_size * kernel_size
    flops = (2.0 * n_edges * 4 * cin                 # basis-weighted taps
             + 2.0 * n_nodes * m * cin * cout        # kernel matmul
             + 2.0 * n_nodes * cin * cout)           # root linear
    bytes_ = dsize * (n_nodes * (cin + cout)         # x in / out
                      + n_edges * cin                # gathered rows (logical)
                      + (m + 1) * cin * cout)        # weights
    return flops, bytes_


def forward_roofline(cfg, n_events: int = None) -> dict:
    """Analytic (flops, min-bytes) of the batched inference forward at the
    benchmark operating point.  Returns totals + a per-stage breakdown.

    Approximations (all stated, all conservative for the roofline claim):
    - gathers/scatters at logical row volume (real traffic is larger);
    - elementwise/BN/activation ops are folded into their producer's bytes
      (XLA fuses them) and their flops are ignored (<1% of total);
    - the neighbour-search kernel's compare ops are counted as flops at
      4 ops/candidate over the lookback window.
    """
    dsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    b = cfg.batch_size
    w, h = cfg.model_width, cfg.model_height
    n = n_events if n_events is not None else cfg.event_buckets[-1]
    nb = b * n
    ch = cfg.channels()
    img_ch = list(ch[1:]) if cfg.use_image else [0] * 5
    grids = cfg.grid_dims()
    k = cfg.max_neighbors
    ks = cfg.kernel_size
    stages: Dict[str, Tuple[float, float]] = {}

    if cfg.use_image:
        stages["cnn"] = cnn_branch_cost(cfg.img_net, b, h, w,
                                        img_ch, [256, 256], dsize)
        # maps 0/1 upsampled to full res (4-tap bilinear), written once,
        # then ONE combined row gather at event positions
        c01 = img_ch[0] + img_ch[1]
        up_flops = 2.0 * b * h * w * c01 * 4
        up_bytes = dsize * (b * h * w * c01 * 2      # write + gather-read
                            + nb * c01)              # rows delivered
        stages["image_upsample_gather"] = (up_flops, up_bytes)

    # level-0 neighbour search (Pallas): each destination scans the
    # lookback window of packed keys
    lb = min(cfg.graph_lookback, n)
    stages["graph_search"] = (4.0 * nb * lb,
                              4.0 * nb            # packed keys read
                              + nb * k * (4 + 1 + 2))  # nbr/mask/off out

    # GNN pyramid: layer1 at event scale, layers 2-5 on pooled cell tables
    pairs = [(ch[i] + img_ch[i] + 2, ch[i + 1]) for i in range(5)]
    nodes = nb
    fl = by = 0.0
    for li, (cin, cout) in enumerate(pairs):
        if li > 0:
            nx, ny = grids[li - 1]
            new_nodes = b * nx * ny
            # pooling: scatter rows into the cell table + pos snap
            by += dsize * (nodes * cin + new_nodes * cin)
            nodes = new_nodes
        edges = nodes * (k - 1 if li == 0 else (2 * 2 + 1) ** 2)
        f1, b1 = spline_conv_cost(nodes, edges, cin, cout, ks, dsize)
        f2, b2 = spline_conv_cost(nodes, edges, cout, cout, ks, dsize)
        fskip = 2.0 * nodes * cin * cout
        fl += f1 + f2 + fskip
        by += b1 + b2 + dsize * (nodes * cout + cin * cout)
    stages["gnn_pyramid"] = (fl, by)

    # box feature pooling + recurrent head (f32, tiny)
    s1 = cfg.max_boxes + 1
    n4 = b * grids[3][0] * grids[3][1]
    x_dim, h_dim = cfg.x_dim, cfg.h_dim
    head_fl = (2.0 * n4 * s1 * 4                       # in-box tests
               + 2 * b * s1 * (3 * (x_dim + h_dim) * h_dim
                               + 3 * (h_dim + h_dim) * h_dim   # 2-layer GRU
                               + 3 * (4 + 32) * 32             # coord GRU
                               + 2 * (h_dim + 32) * 256 + 256 * 2))
    stages["box_head"] = (head_fl, 4.0 * (b * s1 * (x_dim + 4 + 2)
                                          + n4 * x_dim))

    flops = sum(f for f, _ in stages.values())
    bytes_ = sum(bb for _, bb in stages.values())
    return {
        "flops": flops,
        "bytes": bytes_,
        "by_stage": {k_: (round(f / 1e9, 3), round(bb / 1e6, 2))
                     for k_, (f, bb) in stages.items()},
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_ / 1e9, 4),
    }


def roofline_rates(roof: dict, device_seconds: float,
                   compute_dtype: str = "bfloat16") -> dict:
    """MFU / achieved-bandwidth view; flags (instead of silently printing)
    any physically impossible rate.  The MFU denominator follows the run's
    compute dtype (f32 runs divide by the f32 MXU peak, not the bf16 one)."""
    peak = V5E_PEAK_FLOPS if compute_dtype == "bfloat16" \
        else V5E_PEAK_FLOPS_F32
    mfu = roof["flops"] / device_seconds / peak
    hbm = roof["bytes"] / device_seconds
    out = {
        "mfu": round(mfu, 5),
        "hbm_gbps_min": round(hbm / 1e9, 1),
        "model_gflops_per_batch": roof["gflops"],
        "model_gbytes_min_per_batch": roof["gbytes"],
    }
    if mfu > 1.0 or hbm > V5E_PEAK_HBM:
        out["roofline_warning"] = (
            f"impossible rate: mfu={mfu:.3f} hbm={hbm/1e9:.0f}GB/s "
            f"exceeds v5e peaks — accounting or timing bug")
    return out

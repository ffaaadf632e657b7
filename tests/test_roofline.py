"""Analytic roofline accounting (utils/roofline.py): the MFU/HBM numerators
the benchmark prints must be architecture-derived and physically sane
(round-4 fix: XLA cost analysis cannot see Pallas custom calls, and its
logical byte counts implied >2x the v5e HBM peak — VERDICT r3 weak #3)."""
import numpy as np

from eventad_tpu.config import Config
from eventad_tpu.utils.roofline import (V5E_PEAK_HBM, forward_roofline,
                                        resnet_conv_list, roofline_rates)


def test_resnet50_flops_match_published_count():
    # ResNet-50 at 224x224 is 4.1 GMACs = 8.2 GFLOPs (He et al. 2015);
    # the enumerated conv list must reproduce that within a few percent
    # (ours omits the fc layer and counts the exact conv set of
    # models/resnet.resnet_forward)
    convs, taps = resnet_conv_list("resnet50", 224, 224)
    fl = sum(2.0 * kh * kw * cin * cout * ho * wo
             for (kh, kw, cin, cout, ho, wo) in convs)
    assert abs(fl - 8.2e9) / 8.2e9 < 0.06, fl / 1e9
    assert taps["layer4"] == (2048, 7, 7)


def test_forward_roofline_sane_at_benchmark_point():
    cfg = Config(batch_size=6, use_image=True, compute_dtype="bfloat16",
                 event_buckets=(16384,))
    roof = forward_roofline(cfg, 16384)
    # model flops should be the same order as XLA's logical count of the
    # non-fused program (BENCH_r02: 129.3 GFLOP/batch)
    assert 50 < roof["gflops"] < 300, roof["gflops"]
    assert 0.3 < roof["gbytes"] < 5.0, roof["gbytes"]
    stages = roof["by_stage"]
    assert set(stages) == {"cnn", "image_upsample_gather", "graph_search",
                           "gnn_pyramid", "box_head"}
    # CNN dominates flops; every stage contributes positive bytes
    assert stages["cnn"][0] > 0.5 * roof["gflops"]
    assert all(b > 0 for _, b in stages.values())

    # at the recorded round-3 device time the rates must be physical
    rates = roofline_rates(roof, 0.01068)
    assert 0 < rates["mfu"] < 1
    assert rates["hbm_gbps_min"] * 1e9 < V5E_PEAK_HBM
    assert "roofline_warning" not in rates
    # an absurd device time must be flagged, not silently printed
    assert "roofline_warning" in roofline_rates(roof, 1e-5)


def test_roofline_scales_with_batch_and_events():
    cfg = Config(batch_size=6, use_image=True, compute_dtype="bfloat16",
                 event_buckets=(16384,))
    r1 = forward_roofline(cfg, 16384)
    r2 = forward_roofline(cfg.replace(batch_size=12), 16384)
    assert abs(r2["flops"] / r1["flops"] - 2.0) < 0.05
    r3 = forward_roofline(cfg, 32768)
    # only the event-scale stages grow with n_events
    assert r3["flops"] > r1["flops"]
    assert abs(r3["by_stage"]["cnn"][0] - r1["by_stage"]["cnn"][0]) < 1e-6


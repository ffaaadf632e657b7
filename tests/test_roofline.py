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



def test_packed_random_like_matches_init_structure():
    """The benchmark's fast init (eval_shape + packed numpy values) must
    reproduce init_model's exact pytree structure/shapes/dtypes, keep BN
    running stats well-scaled, and yield a finite forward."""
    import jax
    import jax.numpy as jnp
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import (graph_static_config, init_model,
                                         model_forward)
    from eventad_tpu.models.backbone import make_backbone_config
    from eventad_tpu.models.eventad import EventADConfig
    from eventad_tpu.utils.jaxtools import packed_random_like

    cfg = Config(batch_size=1, width=48, height=36, scale=1,
                 use_image=True, event_buckets=(256,), graph_lookback=128)
    real = init_model(jax.random.PRNGKey(0), cfg)[:2]
    fast = packed_random_like(
        lambda: init_model(jax.random.PRNGKey(0), cfg)[:2])
    rl = jax.tree.leaves(real)
    fl = jax.tree.leaves(fast)
    assert len(rl) == len(fl)
    for a, b in zip(rl, fl):
        assert a.shape == b.shape and a.dtype == b.dtype, (a.shape, b.shape)
    # every BN running-var leaf must be ones (eval BN stays well-scaled)
    params, state = fast
    import jax.tree_util as jtu
    var_leaves = [l for p, l in jtu.tree_flatten_with_path(state)[0]
                  if any(str(getattr(k, "key", "")) == "var" for k in p)]
    assert var_leaves and all((np.asarray(v) == 1.0).all()
                              for v in var_leaves)
    # forward is finite
    bc = make_backbone_config(cfg)
    mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                       max_boxes=cfg.max_boxes)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray, make_synthetic_batch(cfg))
    out, _ = model_forward(params, state, batch, bc, mc, gsc,
                           img_net=cfg.img_net, training=False)
    assert np.isfinite(np.asarray(out.logits)).all()

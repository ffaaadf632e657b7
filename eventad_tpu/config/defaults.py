"""Default hyper-parameter sets.

The reference repository (PKU-XD/EventAD) reads most DAGR hyper-parameters from
``config/dagr-s-dsec.yaml`` which is *absent* from the snapshot (see
reference ``config/eventad_config.py:29`` and the argparse.SUPPRESS keys it
fills).  The values below reconstruct the dagr-S configuration from the public
uzh-rpg/dagr release and from constraints visible in the reference code
(e.g. the dense head output sizes ``[B,2,10,14]`` commented at
``src/dagr/model/networks/dagr.py:212-216`` pin ``pooling_dim_at_output`` to
"5x7" and ``num_scales`` to 2).
"""

# DAGR-S / DSEC detector hyper-parameters (reference: config/dagr-s-dsec.yaml,
# reconstructed; consumed at src/dagr/model/networks/net.py:34-97 and
# src/dagr/model/networks/dagr.py:162-200 in the reference).
DAGR_S_DSEC = dict(
    task="detection",
    dataset="dsec",
    # graph construction (reference src/dagr/model/layers/ev_tgn.py:22-37)
    radius=0.01,
    time_window_us=1_000_000,
    max_neighbors=16,
    n_nodes=50_000,
    # network (reference src/dagr/model/layers/spline_conv.py:13-14,
    # net.py:34-37)
    activation="relu",
    edge_attr_dim=2,
    aggr="sum",
    kernel_size=5,
    pooling_aggr="max",
    # net_stem_width is pinned to 0.5 by the reference's 64-d out4 features
    # (models/EventAD.py x_dim=64; net.py:186-190 comment "x=[278, 64]")
    base_width=0.5,
    after_pool_width=1.0,
    net_stem_width=0.5,
    yolo_stem_width=0.5,
    num_scales=2,
    pooling_dim_at_output="5x7",
    # optimization (reference-side DAGR training, kept for parity)
    weight_decay=1e-5,
    clip=0.1,
)

# EventAD (anomaly head) defaults; reference config/eventad_config.py:46-101.
EVENTAD_DEFAULTS = dict(
    batch_size=6,
    optimizer="adam",
    lr=0.003,
    lr_scheduler="cosine",
    epochs=100,
    x_dim=64,
    h_dim=256,
    n_frames=100,
    fps=20.0,
    experiment_name="eventad_dagr_experiment",
    output_dir="./output",
    learning_rate=1e-3,
    min_lr=1e-6,
    grad_clip=1.0,
    pretrained_model="",
    height=720,
    width=1080,
    use_image=True,
    no_events=False,
    keep_temporal_ordering=False,
    img_net="resnet50",
    num_interframe_steps=6,
    aug_p_flip=0.5,
    aug_trans=0.1,
    aug_zoom=1.5,
    num_workers=4,
    threshold=0.5,
    # training extras (reference train.py:17-44)
    save_interval=10,
    plot_interval=5,
    lr_decay_factor=0.5,
    lr_patience=5,
    # test extras (reference test.py:113-129)
    measure_fps=True,
    fps_warmup_batches=70,
    fps_num_batches=20,
)

# TPU-specific knobs (new in this framework; no reference counterpart).
TPU_DEFAULTS = dict(
    # padded event-count buckets: each batch item is padded to the smallest
    # bucket that fits; bounds jit recompilation (SURVEY.md 7.4.2)
    event_buckets=(8192, 16384, 32768, 65536),
    # max in-neighbours kept per pooled cell (5x5 offset bitmap)
    pool_neighbor_span=2,
    # lookback window of the fixed-K neighbour search kernel
    graph_lookback=1024,
    # per-pixel queue depth (reference ev_tgn.py:24 uses 128)
    max_queue_size=128,
    # dtype of the compute path
    compute_dtype="float32",
    # mesh shape for data/model parallel training, e.g. "8" or "4x2"
    mesh="1",
    # destination-chunk width of the Pallas neighbour-search kernel on the
    # batch path (tools/bench_search.py sweep: 64 beats 128 by ~5% at the
    # 6x16k operating point; streaming append uses its own chunk=16)
    search_chunk=64,
)

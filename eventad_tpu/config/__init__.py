"""Unified configuration system.

The reference keeps three overlapping argparse parsers
(``config/eventad_config.py``, ``src/dagr/utils/args.py`` BASE/FLAGS/FLOPS)
whose SUPPRESSed holes are filled from YAML (``eventad_config.py:104-111``).
Here everything is one dataclass with the same key names, a YAML overlay with
the same precedence (CLI > YAML > defaults), and derived geometry helpers.
"""
from __future__ import annotations

import argparse
import dataclasses
import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Tuple

import yaml

from .defaults import DAGR_S_DSEC, EVENTAD_DEFAULTS, TPU_DEFAULTS


@dataclass
class Config:
    # ---- paths (reference config/eventad_config.py:19-33) ----
    dataset_directory: str = "./data/detector/ROL"
    output_directory: str = "./log"
    checkpoint: str = "./checkpoints/detector/dagr_s_50.pth"
    config: str = ""            # optional YAML overlay path
    eventad_config: str = ""    # optional second YAML overlay
    split: str = "./config/rol_split.yaml"
    toa: str = "./config/toa_values.json"

    # ---- task ----
    task: str = DAGR_S_DSEC["task"]
    dataset: str = DAGR_S_DSEC["dataset"]

    # ---- graph ----
    radius: float = DAGR_S_DSEC["radius"]
    time_window_us: int = DAGR_S_DSEC["time_window_us"]
    max_neighbors: int = DAGR_S_DSEC["max_neighbors"]
    n_nodes: int = DAGR_S_DSEC["n_nodes"]

    # ---- network ----
    activation: str = DAGR_S_DSEC["activation"]
    edge_attr_dim: int = DAGR_S_DSEC["edge_attr_dim"]
    aggr: str = DAGR_S_DSEC["aggr"]
    kernel_size: int = DAGR_S_DSEC["kernel_size"]
    pooling_aggr: str = DAGR_S_DSEC["pooling_aggr"]
    base_width: float = DAGR_S_DSEC["base_width"]
    after_pool_width: float = DAGR_S_DSEC["after_pool_width"]
    net_stem_width: float = DAGR_S_DSEC["net_stem_width"]
    yolo_stem_width: float = DAGR_S_DSEC["yolo_stem_width"]
    num_scales: int = DAGR_S_DSEC["num_scales"]
    pooling_dim_at_output: str = DAGR_S_DSEC["pooling_dim_at_output"]
    weight_decay: float = DAGR_S_DSEC["weight_decay"]
    clip: float = DAGR_S_DSEC["clip"]
    use_image: bool = EVENTAD_DEFAULTS["use_image"]
    no_events: bool = EVENTAD_DEFAULTS["no_events"]
    keep_temporal_ordering: bool = EVENTAD_DEFAULTS["keep_temporal_ordering"]
    img_net: str = EVENTAD_DEFAULTS["img_net"]

    # ---- training ----
    batch_size: int = EVENTAD_DEFAULTS["batch_size"]
    optimizer: str = EVENTAD_DEFAULTS["optimizer"]
    lr: float = EVENTAD_DEFAULTS["lr"]
    lr_scheduler: str = EVENTAD_DEFAULTS["lr_scheduler"]
    epochs: int = EVENTAD_DEFAULTS["epochs"]
    learning_rate: float = EVENTAD_DEFAULTS["learning_rate"]
    min_lr: float = EVENTAD_DEFAULTS["min_lr"]
    grad_clip: float = EVENTAD_DEFAULTS["grad_clip"]
    lr_decay_factor: float = EVENTAD_DEFAULTS["lr_decay_factor"]
    lr_patience: int = EVENTAD_DEFAULTS["lr_patience"]
    save_interval: int = EVENTAD_DEFAULTS["save_interval"]
    plot_interval: int = EVENTAD_DEFAULTS["plot_interval"]
    pretrained_model: str = ""
    resume: str = ""
    seed: int = 42

    # ---- anomaly model ----
    x_dim: int = EVENTAD_DEFAULTS["x_dim"]
    h_dim: int = EVENTAD_DEFAULTS["h_dim"]
    n_frames: int = EVENTAD_DEFAULTS["n_frames"]
    fps: float = EVENTAD_DEFAULTS["fps"]
    max_boxes: int = 30  # reference models/EventAD.py:176
    threshold: float = EVENTAD_DEFAULTS["threshold"]

    # ---- experiment / io ----
    experiment_name: str = EVENTAD_DEFAULTS["experiment_name"]
    output_dir: str = EVENTAD_DEFAULTS["output_dir"]
    num_workers: int = EVENTAD_DEFAULTS["num_workers"]
    no_eval: bool = False
    num_interframe_steps: int = EVENTAD_DEFAULTS["num_interframe_steps"]
    # reference quirk: training data comes from the split named "test" with
    # the testing transform (utils/data.py:27-30); override to use "train"
    train_split: str = "test"
    use_augmentations: bool = False
    check_balance: bool = False

    # ---- augmentation ----
    aug_p_flip: float = EVENTAD_DEFAULTS["aug_p_flip"]
    aug_trans: float = EVENTAD_DEFAULTS["aug_trans"]
    aug_zoom: float = EVENTAD_DEFAULTS["aug_zoom"]
    # lower zoom bound; < 1 enables zoom-out with the density-preserving
    # event subsample (reference augment.py:139-189 with zoom < 1)
    aug_zoom_min: float = 1.0
    # detector training: final epochs with augmentation off + L1 loss on
    # (the vendored YOLOX no-aug phase; reference dagr.py:192-193 use_l1)
    no_aug_epochs: int = 0

    # ---- test ----
    test_checkpoint: str = ""
    legacy_frame_collapse: bool = False   # reproduce the reference-as-run
    # frame-id collapse (utils/test.py:49-52 + utils/utils.py:70-93)
    measure_fps: bool = EVENTAD_DEFAULTS["measure_fps"]
    fps_warmup_batches: int = EVENTAD_DEFAULTS["fps_warmup_batches"]
    fps_num_batches: int = EVENTAD_DEFAULTS["fps_num_batches"]

    # ---- raw sensor geometry (reference eventad_config.py:97-98) ----
    height: int = EVENTAD_DEFAULTS["height"]
    width: int = EVENTAD_DEFAULTS["width"]
    scale: int = 3            # reference dsec_data.py:64
    cropped_height: int = 430

    # ---- TPU-native knobs ----
    event_buckets: Tuple[int, ...] = TPU_DEFAULTS["event_buckets"]
    pool_neighbor_span: int = TPU_DEFAULTS["pool_neighbor_span"]
    graph_lookback: int = TPU_DEFAULTS["graph_lookback"]
    max_queue_size: int = TPU_DEFAULTS["max_queue_size"]
    compute_dtype: str = TPU_DEFAULTS["compute_dtype"]
    mesh: str = TPU_DEFAULTS["mesh"]
    search_chunk: int = TPU_DEFAULTS["search_chunk"]
    synthetic_data: bool = False   # run on generated fixture data
    # parity.py fixture mode: deterministic head fine-tune steps before the
    # golden eval, so scores discriminate at trained logit scale and all 5
    # metric families (incl. mTTA/mRESPONSE thresholds) come out finite
    fixture_train_steps: int = 800

    # ------------------------------------------------------------------
    # derived geometry
    # ------------------------------------------------------------------
    @property
    def model_width(self) -> int:
        """Event/image width seen by the model (reference dsec_data.py:83)."""
        return self.width // self.scale

    @property
    def model_height(self) -> int:
        return self.height // self.scale

    @property
    def radius_px(self) -> int:
        """Pixel radius of the event graph (reference ev_tgn.py:29)."""
        return int(self.radius * self.model_width) + 1

    @property
    def delta_t_us(self) -> int:
        """Temporal radius in microseconds (reference ev_tgn.py:28)."""
        return int(self.radius * self.time_window_us)

    @property
    def effective_radius(self) -> float:
        """Normalized Cartesian max value (reference net.py:70)."""
        w = self.model_width
        return 2 * float(int(self.radius * w + 2)) / w

    def poolings(self):
        """Voxel sizes per pooling layer (reference net.py:19-28).

        Returns a list of 4 ``(vx, vy, vt)`` tuples, fractions of the
        normalized [0,1) coordinate range.
        """
        py, px = map(int, self.pooling_dim_at_output.split("x"))
        out = []
        for i in range(4):
            out.append((1.0 / px / 2 ** (3 - i), 1.0 / py / 2 ** (3 - i), 1.0))
        return out

    def grid_dims(self):
        """Cells (nx, ny) of every pooled level."""
        return [
            (int(round(1.0 / v[0])), int(round(1.0 / v[1])))
            for v in self.poolings()
        ]

    def strides(self):
        """Dense-map strides of the two output scales (reference net.py:66-68)."""
        ps = self.poolings()
        return [int(math.ceil(ps[2][1] * self.model_height)),
                int(math.ceil(ps[3][1] * self.model_height))]

    def channels(self):
        """Backbone channel plan (reference net.py:34-37)."""
        return [1,
                int(self.base_width * 32),
                int(self.after_pool_width * 64),
                int(self.net_stem_width * 128),
                int(self.net_stem_width * 128),
                int(self.net_stem_width * 128)]

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_yaml_overlay(cfg: Config, path: str) -> Config:
    """YAML overlay: fills keys, YAML wins over dataclass defaults but CLI
    wins over YAML (mirrors reference parse_config semantics where only
    SUPPRESSed/unset keys are filled, eventad_config.py:5-11)."""
    with open(path) as f:
        overlay = yaml.safe_load(f) or {}
    known = {f.name for f in dataclasses.fields(Config)}
    updates = {k: v for k, v in overlay.items() if k in known}
    return cfg.replace(**updates)


def _add_args(parser: argparse.ArgumentParser):
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.type in ("bool", bool) or isinstance(f.default, bool):
            parser.add_argument(name, default=None,
                                type=lambda s: s.lower() in ("1", "true", "yes"))
        elif f.name == "event_buckets":
            parser.add_argument(name, default=None,
                                type=lambda s: tuple(int(x) for x in s.split(",")))
        elif isinstance(f.default, int):
            parser.add_argument(name, default=None, type=int)
        elif isinstance(f.default, float):
            parser.add_argument(name, default=None, type=float)
        else:
            parser.add_argument(name, default=None, type=str)
    return parser


def parse_args(argv=None, **overrides) -> Config:
    """CLI > YAML overlay(s) > defaults."""
    parser = argparse.ArgumentParser(description="EventAD-TPU")
    _add_args(parser)
    ns, _ = parser.parse_known_args(argv)
    cli = {k: v for k, v in vars(ns).items() if v is not None}

    cfg = Config()
    for path_key in ("config", "eventad_config"):
        p = cli.get(path_key, "")
        if p and Path(p).exists():
            cfg = load_yaml_overlay(cfg, p)
    if cli:
        cfg = cfg.replace(**cli)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg

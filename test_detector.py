#!/usr/bin/env python
"""Detector evaluation CLI: mAP on the val split + optional visualization
frames (the reference's pure-DAGR test loop,
src/dagr/utils/testing.py:16-55 + buffers.py mAP)."""
import sys
from pathlib import Path

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np

from eventad_tpu.config import parse_args
from eventad_tpu.data.batching import Loader
from eventad_tpu.data.dataset import SequenceDataset
from eventad_tpu.models.detector import detector_forward, init_detector
from eventad_tpu.utils import checkpoint as ckpt
from eventad_tpu.utils.detection_eval import DetectionBuffer
from eventad_tpu.utils.result import setup_directories
from eventad_tpu.utils.viz import save_detection_frame


def main(argv=None):
    cfg = parse_args(argv)
    print(f"devices: {jax.devices()}")
    if cfg.synthetic_data:
        from eventad_tpu.data.fixtures import generate_dataset
        root = Path(cfg.dataset_directory)
        if not (root / "rol_split.yaml").exists():
            generate_dataset(root, cfg)
        cfg = cfg.replace(split=str(root / "rol_split.yaml"))

    dirs = setup_directories(cfg.output_dir, cfg.experiment_name + "_det",
                             "test")
    test_ds = SequenceDataset(cfg, Path(cfg.dataset_directory), "val")
    loader = Loader(test_ds, cfg, shuffle=False)

    params, state, bc = init_detector(jax.random.PRNGKey(cfg.seed), cfg)
    if cfg.test_checkpoint:
        tree = ckpt.load_pytree(cfg.test_checkpoint,
                                (params, params, None))
        params = tree[1] if tree[1] is not None else tree[0]  # EMA weights
        print(f"loaded {cfg.test_checkpoint}")

    @jax.jit
    def eval_step(batch):
        dets, _dec, _ns = detector_forward(params, state, batch, cfg, bc,
                                           training=False,
                                           no_events=cfg.no_events)
        return dets

    buf = DetectionBuffer(num_classes=2)
    n_viz = 0
    for bi_batch, (batch, meta) in enumerate(loader):
        dets = eval_step(jax.tree.map(jnp.asarray, batch))
        dets = jax.tree.map(np.asarray, dets)
        for bi in range(meta.n_items):
            gt = np.asarray(batch.bbox[bi]).copy()
            m = np.asarray(batch.bbox_mask[bi])
            gt_xyxy = gt[:, :4].copy()
            gt_xyxy[:, 2:4] += gt_xyxy[:, :2]
            buf.update(
                [{k: v[bi] for k, v in dets.items()}],
                [{"boxes": gt_xyxy[m], "labels": gt[m, 4]}])
            if n_viz < 8:
                save_detection_frame(
                    Path(dirs["result_dir"]) / f"det_{bi_batch}_{bi}.png",
                    batch.image[bi],
                    detections={k: v[bi][dets["mask"][bi]]
                                for k, v in dets.items() if k != "mask"},
                    targets={"boxes": gt_xyxy[m], "labels": gt[m, 4]})
                n_viz += 1
    metrics = buf.compute()
    print(f"mAP: {metrics['mAP']:.4f}  mAP@50: {metrics['mAP_50']:.4f}")
    print(f"results: {dirs['result_dir']}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])

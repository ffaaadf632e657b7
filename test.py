#!/usr/bin/env python
"""EventAD-TPU test entry point.

Mirrors the reference ``test.py`` (test.py:17-110): collect predictions on
the val split, compute bbox AUC/AP, frame AUC, mTTA, measure FPS, compute
mRESPONSE with the measured FPS, write test_results.csv +
metrics_summary.txt."""
import sys
from pathlib import Path

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import numpy as np

from eventad_tpu.config import parse_args
from eventad_tpu.data.batching import Loader
from eventad_tpu.data.dataset import SequenceDataset
from eventad_tpu.models.dagr import graph_static_config, init_model
from eventad_tpu.parallel import make_optimizer, make_train_fns
from eventad_tpu.utils import checkpoint as ckpt
from eventad_tpu.utils.evaluation import (calculate_bbox_metrics,
                                          calculate_frame_metrics,
                                          calculate_response_metrics,
                                          calculate_tta_metrics)
from eventad_tpu.utils.fps import measure_fps
from eventad_tpu.utils.predict import collect_predictions, load_toa_values
from eventad_tpu.utils.result import (append_fps, create_metrics_summary,
                                      save_metrics, setup_directories,
                                      setup_result_file)


def main(argv=None):
    cfg = parse_args(argv)
    print(f"devices: {jax.devices()}")

    if cfg.synthetic_data:
        from eventad_tpu.data.fixtures import generate_dataset
        root = Path(cfg.dataset_directory)
        if not (root / "rol_split.yaml").exists():
            generate_dataset(root, cfg)
        cfg = cfg.replace(split=str(root / "rol_split.yaml"),
                          toa=str(root / "toa_values.json"))

    dirs = setup_directories(cfg.output_dir, cfg.experiment_name, "test")
    result_dir = dirs["result_dir"]
    video_toa = load_toa_values(cfg.toa)

    test_ds = SequenceDataset(cfg, Path(cfg.dataset_directory), "val")
    test_loader = Loader(test_ds, cfg, shuffle=False)
    print(f"test items: {len(test_ds)}")

    # data-parallel evaluation (reference protocol utils/test.py:9-180 is
    # single-GPU; here --mesh N shards the metrics-producing eval batches
    # over the 'data' axis — metrics stay host-side, jit inserts the
    # collectives)
    mesh = None
    if cfg.mesh not in ("", "1"):
        from eventad_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.mesh)
        d = mesh.shape["data"]
        if cfg.batch_size % d:
            print(f"warning: batch_size {cfg.batch_size} not divisible by "
                  f"data-mesh size {d}; running single-device")
            mesh = None
        else:
            print(f"eval mesh: {dict(mesh.shape)}")

    params, state, bc, mc = init_model(jax.random.PRNGKey(cfg.seed), cfg)
    gsc = graph_static_config(cfg)
    optimizer = make_optimizer(cfg.learning_rate, cfg.weight_decay,
                               cfg.grad_clip)
    opt_state = optimizer.init(params.head)
    fns = make_train_fns(cfg, bc, mc, gsc, optimizer)

    checkpoint_info = {"path": "<random init>", "epoch": -1}
    try:
        path = ckpt.find_best_checkpoint(cfg.output_dir, cfg.experiment_name,
                                         cfg.test_checkpoint)
        params, opt_state = ckpt.load_pytree(path, (params, opt_state))
        extra = ckpt.load_extra(path)
        checkpoint_info = {"path": str(path), "epoch": extra.get("epoch", -1)}
        print(f"loaded checkpoint {path}")
    except FileNotFoundError as e:
        print(f"warning: {e}; evaluating randomly initialised model")

    result_file = setup_result_file(result_dir, cfg, checkpoint_info)

    if mesh is not None:
        from eventad_tpu.parallel import replicated
        params = jax.device_put(params, replicated(mesh))
        state = jax.device_put(state, replicated(mesh))

    def to_device(batch):
        batch = jax.tree.map(np.asarray, batch)
        if mesh is not None:
            from eventad_tpu.parallel import shard_batch
            return shard_batch(batch, mesh)
        return batch

    def forward(batch):
        logits, valid, labels, _loss, _nv = fns.eval_step(
            params, state, to_device(batch))
        return np.asarray(logits), np.asarray(valid), np.asarray(labels)

    results = collect_predictions(
        forward, test_loader, threshold=cfg.threshold,
        legacy_frame_collapse=cfg.legacy_frame_collapse)
    bbox_metrics = calculate_bbox_metrics(results["all_labels"],
                                          results["all_scores"])
    frame_metrics = calculate_frame_metrics(results["frame_data"])
    tta_metrics = calculate_tta_metrics(results["video_predictions"],
                                        results["video_first_anomaly"],
                                        video_toa)
    fps_results = None
    if cfg.measure_fps:
        def fwd_bench(batch):
            return fns.eval_step(params, state, to_device(batch))
        fps_results = measure_fps(fwd_bench, test_loader,
                                  warmup_batches=cfg.fps_warmup_batches,
                                  num_batches=cfg.fps_num_batches)
        append_fps(result_file, fps_results["fps"])
    response_metrics = calculate_response_metrics(
        results["video_predictions"],
        fps=fps_results["fps"] if fps_results else 579)
    save_metrics(result_file, bbox_metrics, frame_metrics, tta_metrics,
                 response_metrics)
    create_metrics_summary(result_dir, cfg, bbox_metrics, frame_metrics,
                           tta_metrics, response_metrics, checkpoint_info,
                           fps_results)
    print(f"results saved in: {result_dir}")
    return dict(bbox=bbox_metrics, frame=frame_metrics, tta=tta_metrics,
                response=response_metrics, fps=fps_results)


if __name__ == "__main__":
    main(sys.argv[1:])

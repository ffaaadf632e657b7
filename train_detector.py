#!/usr/bin/env python
"""DAGR detector training entry point.

The reference trains its detector through the vendored YOLOX machinery
(dagr.py:76-86 routes YOLOX.forward into get_losses; LR schedule
src/dagr/utils/learning_rate_scheduler.py; EMA ema.py; mAP eval
src/dagr/utils/buffers.py + testing.py:16-55). This is the TPU-native
equivalent: jitted train step over the full detector, simOTA loss, EMA
weights, YOLOX warmup-cosine schedule, periodic mAP on the val split.
"""
import sys
import time
from pathlib import Path

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np
import optax

from eventad_tpu.config import parse_args
from eventad_tpu.parallel import make_mesh
from eventad_tpu.data.batching import Loader
from eventad_tpu.data.dataset import SequenceDataset
from eventad_tpu.models.detector import detector_forward, init_detector
from eventad_tpu.models.yolox_loss import (convert_to_training_format,
                                           make_anchor_geometry, yolox_loss)
from eventad_tpu.utils import checkpoint as ckpt
from eventad_tpu.utils.detection_eval import DetectionBuffer
from eventad_tpu.utils.ema import ema_init, ema_update
from eventad_tpu.utils.logging import RunLogger
from eventad_tpu.utils.result import setup_directories
from eventad_tpu.utils.schedules import (make_detector_optimizer,
                                         yolox_schedule)


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
                             "train")
    logger = RunLogger(dirs["result_dir"], hparams=cfg)

    transform = None
    if cfg.use_augmentations:
        from eventad_tpu.data.augment import training_transform
        transform = training_transform(cfg, seed=cfg.seed)
    train_ds = SequenceDataset(cfg, Path(cfg.dataset_directory), "train",
                               transform=transform)
    val_ds = SequenceDataset(cfg, Path(cfg.dataset_directory), "val")
    train_loader = Loader(train_ds, cfg, shuffle=True, seed=cfg.seed)
    val_loader = Loader(val_ds, cfg, shuffle=False)

    # 2-D mesh (same 'data' contract as train.py): batch leaves sharded on
    # 'data'; with a model axis > 1 ("NxM" spec) the large detector weights
    # are additionally sharded over 'model' (parallel/sharding.py — XLA's
    # SPMD partitioner turns that into tensor-parallel compute or FSDP-style
    # just-in-time gathers per op, and grads/optimizer state stay sharded)
    mesh = make_mesh(cfg.mesh) if cfg.mesh not in ("", "1") else None
    model_parallel = mesh is not None and mesh.shape["model"] > 1

    def to_device(batch):
        batch = jax.tree.map(jnp.asarray, batch)
        if mesh is not None and mesh.devices.size > 1:
            from eventad_tpu.parallel import shard_batch
            return shard_batch(batch, mesh)
        return batch

    params, state, bc = init_detector(jax.random.PRNGKey(cfg.seed), cfg)
    if model_parallel:
        from eventad_tpu.parallel import shard_params
        params = shard_params(params, mesh)
    grids = [bc.grids[2], bc.grids[3]]
    strides = [int(round(bc.height / g[1])) for g in grids]
    geom = make_anchor_geometry(grids, strides)

    steps_per_epoch = max(len(train_loader), 1)
    total_steps = cfg.epochs * steps_per_epoch
    schedule = yolox_schedule(cfg.lr, warmup_steps=steps_per_epoch,
                              total_steps=total_steps)
    optimizer = make_detector_optimizer(cfg.optimizer, schedule,
                                        cfg.weight_decay, cfg.clip)
    if model_parallel:
        # jitted inits: moments/EMA inherit the parameter shardings
        from eventad_tpu.parallel import sharded_init
        opt_state = sharded_init(optimizer.init, params, mesh)
        ema = sharded_init(ema_init, params, mesh)
    else:
        opt_state = optimizer.init(params)
        ema = ema_init(params)

    def loss_fn(params, state, batch, l1_weight):
        _dets, decoded, new_state = detector_forward(
            params, state, batch, cfg, bc, training=True)
        logits = decoded.at[..., 4:].set(
            jnp.log(jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6))
            - jnp.log1p(-jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6)))
        tgt, tmask = convert_to_training_format(batch.bbox, batch.bbox_mask)
        losses = yolox_loss(logits, tgt, tmask, geom, l1_weight=l1_weight)
        return losses["total"], (losses, new_state)

    @jax.jit
    def train_step(params, state, opt_state, ema, batch, l1_weight):
        (loss, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, l1_weight)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = ema_update(ema, new_params)
        return new_params, new_state, new_opt, new_ema, losses

    @jax.jit
    def eval_step(params, state, batch):
        dets, _dec, _ns = detector_forward(params, state, batch, cfg, bc,
                                           training=False)
        return dets

    step = 0
    for epoch in range(cfg.epochs):
        t0 = time.time()
        # YOLOX no-aug phase: final epochs train without augmentation and
        # with the L1 regression branch on (vendored head's use_l1 flip)
        no_aug = (cfg.no_aug_epochs > 0
                  and epoch >= cfg.epochs - cfg.no_aug_epochs)
        if no_aug and train_ds.transform is not None:
            print(f"epoch {epoch}: no-aug phase (L1 on, augmentations off)")
            train_ds.transform = None
        l1_w = jnp.float32(1.0 if no_aug else 0.0)
        for batch, _meta in train_loader:
            if not batch.bbox_mask.any():
                continue
            batch = to_device(batch)
            params, state, opt_state, ema, losses = train_step(
                params, state, opt_state, ema, batch, l1_w)
            step += 1
            if step % 20 == 0:
                logger.log({k: float(v) for k, v in losses.items()},
                           step=step)
        # periodic mAP with EMA weights (reference eval convention)
        buf = DetectionBuffer(num_classes=2)
        for batch, _meta in val_loader:
            dets = eval_step(ema.params, state, to_device(batch))
            for bi in range(cfg.batch_size):
                gt_xyxy = np.asarray(batch.bbox[bi, :, :4]).copy()
                gt_xyxy[:, 2:4] += gt_xyxy[:, :2]
                m = np.asarray(batch.bbox_mask[bi])
                buf.update(
                    [{k: np.asarray(v[bi]) for k, v in dets.items()}],
                    [{"boxes": gt_xyxy[m],
                      "labels": np.asarray(batch.bbox[bi, m, 4])}])
        metrics = buf.compute()
        logger.log({"epoch": epoch, **metrics})
        print(f"epoch {epoch}: mAP {metrics['mAP']:.4f} "
              f"mAP50 {metrics['mAP_50']:.4f} ({time.time()-t0:.1f}s)")
        ckpt.save_pytree(Path(dirs["model_dir"]) / "detector_latest.npz",
                         (params, ema.params, opt_state),
                         dict(epoch=epoch, **metrics))
    logger.close()


if __name__ == "__main__":
    main(sys.argv[1:])

#!/usr/bin/env python
"""EventAD-TPU training entry point.

Mirrors the reference ``train.py`` flow (train.py:46-144): data loaders,
frozen DAGR, anomaly head, AdamW + plateau LR, per-epoch validation with
ROC/PR plots, CSV logging, best-AUC/AP checkpoint files, early stop when the
LR drops below ``min_lr``, crash-save on exceptions.

Quirk preserved: the reference trains on the split named "test" with the
*testing* transform (utils/data.py:27-30); override with ``--train_split``.
"""
import sys
import time
from pathlib import Path

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import numpy as np

from eventad_tpu.config import parse_args
from eventad_tpu.data.batching import Loader
from eventad_tpu.data.dataset import SequenceDataset
from eventad_tpu.models.dagr import init_model
from eventad_tpu.models.dagr import graph_static_config
from eventad_tpu.parallel import (make_mesh, make_optimizer, make_train_fns,
                                  plateau_init, plateau_update)
from eventad_tpu.parallel.train_step import set_lr
from eventad_tpu.utils import checkpoint as ckpt
from eventad_tpu.utils.result import (append_epoch_row, setup_directories,
                                      setup_result_file)
from eventad_tpu.utils.visualization import validate_and_visualize


def to_device(batch, mesh=None):
    import jax.numpy as jnp
    if mesh is not None and mesh.devices.size > 1:
        from eventad_tpu.parallel import shard_batch
        return shard_batch(batch, mesh)
    return jax.tree.map(jnp.asarray, batch)


def main(argv=None):
    cfg = parse_args(argv)
    print(f"devices: {jax.devices()}")

    if cfg.synthetic_data:
        from eventad_tpu.data.fixtures import generate_dataset
        root = Path(cfg.dataset_directory)
        if not (root / "rol_split.yaml").exists():
            print("generating synthetic fixture data ...")
            generate_dataset(root, cfg)
        cfg = cfg.replace(split=str(root / "rol_split.yaml"),
                          toa=str(root / "toa_values.json"))

    dirs = setup_directories(cfg.output_dir, cfg.experiment_name, "train")
    result_dir, model_dir = dirs["result_dir"], dirs["model_dir"]

    # reference quirk default: training data comes from split "test" with
    # the testing transform (utils/data.py:27-30); --train_split overrides
    transform = None
    if cfg.use_augmentations:
        from eventad_tpu.data.augment import training_transform
        transform = training_transform(cfg, seed=cfg.seed)
    train_ds = SequenceDataset(cfg, Path(cfg.dataset_directory),
                               cfg.train_split, transform=transform)
    val_ds = SequenceDataset(cfg, Path(cfg.dataset_directory), "val")
    train_loader = Loader(train_ds, cfg, shuffle=True, seed=cfg.seed)
    val_loader = Loader(val_ds, cfg, shuffle=False)
    print(f"train items: {len(train_ds)}, val items: {len(val_ds)}")
    # dataset balance report (reference utils/data.py:67-96, train.py:66)
    if getattr(cfg, "check_balance", False):
        from eventad_tpu.data.dataset import check_dataset_balance
        check_dataset_balance({"train": train_loader, "val": val_loader})

    key = jax.random.PRNGKey(cfg.seed)
    params, state, bc, mc = init_model(key, cfg)
    gsc = graph_static_config(cfg)

    mesh = make_mesh(cfg.mesh) if cfg.mesh not in ("", "1") else None
    optimizer = make_optimizer(cfg.learning_rate, cfg.weight_decay,
                               cfg.grad_clip)
    opt_state = optimizer.init(params.head)
    fns = make_train_fns(cfg, bc, mc, gsc, optimizer, mesh)

    result_file = setup_result_file(result_dir, cfg)
    start_epoch, best_auc, best_ap = 0, 0.0, 0.0
    plateau = plateau_init()

    if cfg.pretrained_model or cfg.resume:
        path = cfg.pretrained_model or cfg.resume
        tree = ckpt.load_pytree(path, (params, opt_state))
        params, opt_state = tree
        extra = ckpt.load_extra(path)
        start_epoch = extra.get("epoch", -1) + 1
        best_auc = extra.get("best_auc", 0.0)
        best_ap = extra.get("best_ap", 0.0)
        print(f"resumed from {path} at epoch {start_epoch}")

    rng = jax.random.PRNGKey(cfg.seed + 1)
    epoch = start_epoch
    try:
        for epoch in range(start_epoch, cfg.epochs):
            lr = cfg.learning_rate * plateau.scale
            opt_state = set_lr(opt_state, lr)
            t0 = time.time()
            losses, n_valid_total, skipped = [], 0, 0
            step_i = 0
            for batch, _meta in train_loader:
                step_i += 1
                if step_i <= 3 or step_i % 50 == 0:
                    print(f"  epoch {epoch} step {step_i} "
                          f"({time.time()-t0:.1f}s)", flush=True)
                if not batch.bbox_mask.any():
                    skipped += 1
                    continue
                rng, sub = jax.random.split(rng)
                params, state, opt_state, m = fns.train_step(
                    params, state, opt_state, to_device(batch, mesh), sub)
                if not bool(m["finite"]):
                    print("warning: non-finite loss/grads; step skipped")
                    skipped += 1
                    continue
                nv = int(m["n_valid"])
                if nv > 0:
                    losses.append(float(m["loss"]) / nv)
                    n_valid_total += nv
            if not losses:
                raise RuntimeError("No valid batches during training")
            train_loss = float(np.mean(losses))

            def eval_fn(batch):
                return [np.asarray(x) for x in
                        fns.eval_step(params, state, to_device(batch, mesh))]

            val_loss, roc_auc, ap = validate_and_visualize(
                eval_fn, val_loader, result_dir, epoch,
                plot=(epoch % cfg.plot_interval == 0))
            plateau = plateau_update(plateau, val_loss,
                                     factor=cfg.lr_decay_factor,
                                     patience=cfg.lr_patience)
            append_epoch_row(result_file, epoch, train_loss, val_loss,
                             roc_auc, ap, lr)
            is_best_auc = roc_auc == roc_auc and roc_auc > best_auc
            is_best_ap = ap == ap and ap > best_ap
            best_auc = max(best_auc, roc_auc if roc_auc == roc_auc else 0.0)
            best_ap = max(best_ap, ap if ap == ap else 0.0)
            ckpt.save_checkpoint(model_dir, (params, opt_state), epoch,
                                 best_auc, best_ap, is_best_auc, is_best_ap)
            print(f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} "
                  f"auc {roc_auc:.4f} ap {ap:.4f} lr {lr:.2e} "
                  f"({time.time()-t0:.1f}s)")
            if lr < cfg.min_lr:
                print(f"lr {lr:.2e} below min_lr, early stop")
                break
    except Exception as e:  # crash-save (reference train.py:134-140)
        print(f"Error during training: {e}")
        ckpt.save_checkpoint(model_dir, (params, opt_state), epoch,
                             best_auc, best_ap, False, False)
        raise
    print(f"done. best AUC {best_auc:.4f} best AP {best_ap:.4f}")
    print(f"models: {model_dir}\nresults: {result_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])

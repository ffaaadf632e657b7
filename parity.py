#!/usr/bin/env python
"""Golden-number parity harness.

Loads the reference's torch checkpoints (``dagr_s_50.pth`` via its ['ema']
entry, reference utils/model.py:31-32, and ``best_rol.pth`` for the trained
EventAD head), converts them with :mod:`eventad_tpu.models.convert`, runs the
full test pipeline on the val split and prints each metric against the
committed baseline table (reference
output/test_results/eventad_dagr_experiment_20250526_085544/test_results.csv).

Real-data run (the golden numbers, once ROL data + checkpoints are present):

    python parity.py --dataset_directory ./data/detector/ROL \
        --checkpoint ./checkpoints/detector/dagr_s_50.pth \
        --test_checkpoint ./checkpoints/detector/best_rol.pth

Fixture run (works today, exercises the exact same converted-checkpoint
code path end-to-end): random-init params are exported to reference-format
.pth files, converted back, and evaluated on the synthetic fixture:

    python parity.py --synthetic_data true --dataset_directory /tmp/parity
"""
import sys
from pathlib import Path

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import numpy as np

from eventad_tpu.config import parse_args
from eventad_tpu.data.batching import Loader
from eventad_tpu.data.dataset import SequenceDataset
from eventad_tpu.models.convert import convert_full_model
from eventad_tpu.models.dagr import graph_static_config
from eventad_tpu.parallel import make_optimizer, make_train_fns
from eventad_tpu.utils.evaluation import (calculate_bbox_metrics,
                                          calculate_frame_metrics,
                                          calculate_response_metrics,
                                          calculate_tta_metrics)
from eventad_tpu.utils.predict import collect_predictions, load_toa_values
from eventad_tpu.utils.result import (create_metrics_summary, save_metrics,
                                      setup_directories, setup_result_file)

# BASELINE.md golden targets (authors' committed run, best_rol.pth epoch 24)
GOLDEN = {
    "AUC": 0.8822,
    "AP": 0.5736,
    "AUC-Frame": 0.7481,
    "mTTA": 2.9201,
    "mRESPONSE": 1.2017,
}


def _train_fixture_head(cfg, params, state, bc, mc):
    """Deterministic head fine-tune on the fixture's train split (reference
    trains on the split named "test" with the testing transform,
    utils/data.py:27-30).  The backbone is frozen (EventAD.py:149-150), so
    features are extracted ONCE per batch and cached; the head then trains
    on the cached tensors — two orders of magnitude cheaper than full
    forward/backward steps, bit-identical semantics.

    Determinism contract (tests/golden/parity_fixture.json): fixed seed,
    shuffle off, dropout keys folded from the step index — same platform
    (CPU) reproduces the goldens exactly."""
    import jax.numpy as jnp
    import optax

    from eventad_tpu.models.dagr import dagr_extract_features
    from eventad_tpu.models.eventad import eventad_forward
    from eventad_tpu.models.feature_extract import extract_box_features

    gsc = graph_static_config(cfg)
    ds = SequenceDataset(cfg, Path(cfg.dataset_directory), cfg.train_split)
    loader = Loader(ds, cfg, shuffle=False)
    denom = jnp.asarray([bc.width, bc.height, bc.width, bc.height],
                        jnp.float32)

    @jax.jit
    def feat_fn(batch):
        outs, _ = dagr_extract_features(
            params.dagr, state.dagr, batch.pos, batch.polarity, batch.valid,
            batch.image, bc, gsc, img_net=cfg.img_net, training=False,
            ranks=getattr(batch, "rank", None),
            pool_tables=getattr(batch, "pool_tables", None))
        feats = extract_box_features(outs[1], batch.boxes,
                                     batch.box_present, bc.batch_size,
                                     bc.width, bc.height)
        feats = feats.astype(jnp.float32)
        return (feats, batch.boxes[:, 1] / denom, batch.box_present[:, 1],
                batch.box_labels)

    cached = [jax.tree.map(np.asarray,
                           feat_fn(jax.tree.map(np.asarray, b)))
              for b, _meta in loader]
    print(f"fixture head training: {len(cached)} cached feature batches")

    opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                      optax.adamw(cfg.learning_rate,
                                  weight_decay=cfg.weight_decay))
    hp = params.head
    opt_state = opt.init(hp)

    @jax.jit
    def head_step(hp, opt_state, feats, coords, present, labels, key):
        def lf(hp):
            out = eventad_forward(hp, mc, feats, coords, present, labels,
                                  training=True, rng=key)
            return out.loss / jnp.maximum(out.n_valid, 1)
        loss, grads = jax.value_and_grad(lf)(hp)
        updates, new_opt = opt.update(grads, opt_state, hp)
        return optax.apply_updates(hp, updates), new_opt, loss

    key = jax.random.PRNGKey(cfg.seed)
    loss = np.nan
    for i in range(cfg.fixture_train_steps):
        fb = cached[i % len(cached)]
        hp, opt_state, loss = head_step(hp, opt_state,
                                        *map(jnp.asarray, fb),
                                        jax.random.fold_in(key, i))
    print(f"fixture head trained {cfg.fixture_train_steps} steps, "
          f"final per-box loss {float(loss):.4f}")
    return params._replace(head=hp)


def _fixture_checkpoints(cfg, root: Path):
    """Round-trip fixture: head-train deterministically, then export the
    params to reference-format torch files so the converter path below is
    the one under test (at trained logit scale)."""
    from eventad_tpu.models.convert import export_torch_checkpoints
    from eventad_tpu.models.dagr import init_model
    dagr_pth = root / "dagr_fixture.pth"
    head_pth = root / "eventad_fixture.pth"
    if not dagr_pth.exists():
        params, state, bc, mc = init_model(jax.random.PRNGKey(cfg.seed), cfg)
        if cfg.fixture_train_steps > 0:
            params = _train_fixture_head(cfg, params, state, bc, mc)
        export_torch_checkpoints(params, state, cfg, str(dagr_pth),
                                 str(head_pth))
        print(f"exported fixture torch checkpoints to {root}")
    return str(dagr_pth), str(head_pth)


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
        dagr_path, head_path = _fixture_checkpoints(cfg, root)
    else:
        dagr_path, head_path = cfg.checkpoint, cfg.test_checkpoint
        if not Path(dagr_path).exists():
            raise FileNotFoundError(
                f"DAGR checkpoint {dagr_path!r} not found — pass "
                f"--checkpoint, or --synthetic_data true for a fixture run")
        if not (head_path and Path(head_path).exists()):
            print(f"warning: EventAD checkpoint {head_path!r} not found; "
                  f"head stays randomly initialised")
            head_path = None

    params, state, bc, mc = convert_full_model(cfg, dagr_path, head_path)
    print(f"converted torch checkpoints: dagr={dagr_path} head={head_path}")

    dirs = setup_directories(cfg.output_dir, cfg.experiment_name, "parity")
    result_dir = dirs["result_dir"]
    video_toa = load_toa_values(cfg.toa)

    test_ds = SequenceDataset(cfg, Path(cfg.dataset_directory), "val")
    test_loader = Loader(test_ds, cfg, shuffle=False)
    print(f"val items: {len(test_ds)}")

    gsc = graph_static_config(cfg)
    optimizer = make_optimizer(cfg.learning_rate, cfg.weight_decay,
                               cfg.grad_clip)
    fns = make_train_fns(cfg, bc, mc, gsc, optimizer)

    def forward(batch):
        logits, valid, labels, _loss, _nv = fns.eval_step(
            params, state, jax.tree.map(np.asarray, batch))
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
    response_metrics = calculate_response_metrics(
        results["video_predictions"], fps=cfg.fps or 579)

    checkpoint_info = {"path": f"{dagr_path} + {head_path}", "epoch": -1}
    result_file = setup_result_file(result_dir, cfg, checkpoint_info)
    save_metrics(result_file, bbox_metrics, frame_metrics, tta_metrics,
                 response_metrics)
    create_metrics_summary(result_dir, cfg, bbox_metrics, frame_metrics,
                           tta_metrics, response_metrics, checkpoint_info,
                           None)

    measured = {
        "AUC": bbox_metrics.get("auc"),
        # ranking guard: the adjusted AUC sits at the median-scaling
        # quirk's blind spot (it crushes well-separated scores toward 0.5),
        # so the unadjusted value is pinned alongside it
        "AUC_unadjusted": bbox_metrics.get("auc_unadjusted"),
        "AP": bbox_metrics.get("ap"),
        "AUC-Frame": frame_metrics.get("auc_frame"),
        "mTTA": tta_metrics.get("mtta"),
        "mRESPONSE": response_metrics.get("mresponse"),
        # whole-pipeline score digests: with the fixture-trained head the
        # scores discriminate at trained logit scale, so ALL five metric
        # families above come out finite and pinned; these additionally pin
        # the raw score stream itself (tests/test_parity_fixture.py)
        "score_mean": float(np.mean(results["all_scores"]))
        if len(results["all_scores"]) else None,
        "score_max": float(np.max(results["all_scores"]))
        if len(results["all_scores"]) else None,
    }
    mode = "FIXTURE (round-trip converter check, fixture-trained head)" \
        if cfg.synthetic_data else "REAL DATA"
    print(f"\n==== Parity vs BASELINE.md ({mode}) ====")
    print(f"{'metric':<12} {'measured':>10} {'golden':>10} {'delta':>9}")
    ok = True
    for k, target in GOLDEN.items():
        v = measured.get(k)
        if v is None or (isinstance(v, float) and np.isnan(v)):
            print(f"{k:<12} {'N/A':>10} {target:>10.4f} {'-':>9}")
            continue
        d = v - target
        within = abs(d) <= 0.01 * abs(target)
        if not cfg.synthetic_data and not within:
            ok = False
        print(f"{k:<12} {v:>10.4f} {target:>10.4f} {d:>+9.4f}"
              + ("  OK" if within else ""))
    print(f"results saved in: {result_dir}")
    if not cfg.synthetic_data and not ok:
        print("PARITY: some metrics outside 1% of golden targets")
    return measured


if __name__ == "__main__":
    main(sys.argv[1:])

"""Mixed-precision detector training (bf16 compute / f32 master weights).

The full-gradient detector training regime (reference dagr.py:76-86) with
``compute_dtype="bfloat16"``: activations and weight CASTS are bf16 through
the backbone + head, while the optimizer state, master weights and BN
statistics stay float32 (ops/norm.py keeps stats f32; the cast's VJP
delivers f32 gradients).  Pins:

1. bf16 training descends (finite, strictly decreasing over steps);
2. the bf16 loss trajectory agrees with f32 within a stated tolerance;
3. synthetic-AP agreement: after a short f32 training run, evaluating the
   SAME weights under bf16 vs f32 compute gives matching mAP (and close
   decoded maps).

Device rate context (v5e, tools/bench_train_detector.py 16384 20 <dtype>):
f32 77.1 ms/batch, bf16 56.8 ms/batch — the residual gap to the matmul
roofline is per-index gather/scatter and neighbour-tensor formatting,
which are dtype-insensitive."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eventad_tpu.config import Config
from eventad_tpu.data.synthetic import make_synthetic_batch
from eventad_tpu.models.detector import detector_forward, init_detector
from eventad_tpu.models.yolox_loss import (convert_to_training_format,
                                           make_anchor_geometry, yolox_loss)


def _setup(dtype):
    cfg = Config(batch_size=2, width=96, height=72, scale=1,
                 use_image=True, event_buckets=(1024,), graph_lookback=256,
                 compute_dtype=dtype)
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg)
    grids = [bc.grids[2], bc.grids[3]]
    strides = [int(round(bc.height / g[1])) for g in grids]
    geom = make_anchor_geometry(grids, strides)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=3))
    return cfg, params, state, bc, geom, batch


def _make_step(cfg, bc, geom, opt):
    def loss_fn(params, state, batch):
        _d, decoded, ns = detector_forward(params, state, batch, cfg, bc,
                                           training=True)
        p = jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6)
        logits = decoded.at[..., 4:].set(jnp.log(p) - jnp.log1p(-p))
        tgt, tmask = convert_to_training_format(batch.bbox, batch.bbox_mask)
        return yolox_loss(logits, tgt, tmask, geom,
                          l1_weight=0.0)["total"], ns

    @jax.jit
    def step(params, state, opt_state, batch):
        (loss, ns), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), ns, new_opt, loss

    return step


def _train(dtype, n_steps):
    cfg, params, state, bc, geom, batch = _setup(dtype)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = _make_step(cfg, bc, geom, opt)
    losses = []
    for _ in range(n_steps):
        params, state, opt_state, loss = step(params, state, opt_state,
                                              batch)
        losses.append(float(loss))
    return losses, params, state


def test_bf16_detector_training_descends_and_tracks_f32():
    n = 6
    losses_bf, _, _ = _train("bfloat16", n)
    losses_f32, _, _ = _train("float32", n)
    assert np.isfinite(losses_bf).all() and np.isfinite(losses_f32).all()
    # descends: the last loss is clearly below the first, for BOTH dtypes
    assert losses_bf[-1] < losses_bf[0] * 0.9, losses_bf
    assert losses_f32[-1] < losses_f32[0] * 0.9, losses_f32
    # the first steps agree tightly (same math, bf16 rounding only); later
    # steps diverge mildly because simOTA's DISCRETE anchor assignment
    # amplifies rounding into different-but-equally-valid targets — the
    # trajectory-level agreement (both descend to a similar level) is the
    # meaningful mixed-precision statement
    for lb, lf in zip(losses_bf[:2], losses_f32[:2]):
        assert abs(lb - lf) / max(abs(lf), 1e-6) < 0.01, (losses_bf,
                                                          losses_f32)
    assert abs(losses_bf[-1] - losses_f32[-1]) / losses_f32[-1] < 0.25, \
        (losses_bf, losses_f32)


def test_bf16_detector_master_weights_stay_f32():
    losses, params, state = _train("bfloat16", 2)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
    # BN running statistics stay f32 too
    for leaf in jax.tree.leaves(state):
        assert leaf.dtype != jnp.bfloat16, leaf.dtype


def test_bf16_detector_eval_ap_matches_f32():
    """Same (f32-trained) weights evaluated under bf16 vs f32 compute:
    mAP on the synthetic boxes must agree within 0.05 and the decoded
    maps must be close."""
    from eventad_tpu.utils.detection_eval import DetectionBuffer
    n_train = 8
    _, params, state = _train("float32", n_train)
    cfg_f, _, _, bc_f, geom, batch = _setup("float32")
    cfg_b = dataclasses.replace(cfg_f, compute_dtype="bfloat16")
    from eventad_tpu.models.backbone import make_backbone_config
    bc_b = make_backbone_config(cfg_b)

    det_f, dec_f, _ = detector_forward(params, state, batch, cfg_f, bc_f,
                                       training=False)
    det_b, dec_b, _ = detector_forward(params, state, batch, cfg_b, bc_b,
                                       training=False)
    a = np.asarray(dec_f, np.float32)
    b = np.asarray(dec_b, np.float32)
    # the objectness field drives ranking — it must be strongly correlated
    # between the two dtypes (max-rel on raw decoded values is dominated by
    # near-zero logits and the exp() in the box decode, so correlation is
    # the meaningful closeness statement, mirroring the anomaly path's
    # AUC-based bf16 validation in tests/test_bf16_path.py)
    of, ob = a[..., 4].ravel(), b[..., 4].ravel()
    corr = float(np.corrcoef(of, ob)[0, 1])
    assert corr > 0.99, corr

    def ap_of(dets):
        dets = jax.tree.map(np.asarray, dets)
        buf = DetectionBuffer(num_classes=2)
        for j in range(cfg_f.batch_size):
            gt = np.asarray(batch.bbox[j]).copy()
            m = np.asarray(batch.bbox_mask[j])
            gt_xyxy = gt[:, :4].copy()
            gt_xyxy[:, 2:4] += gt_xyxy[:, :2]
            buf.update([{k: v[j] for k, v in dets.items()}],
                       [{"boxes": gt_xyxy[m], "labels": gt[m, 4]}])
        return buf.compute()["mAP"]

    ap_f, ap_b = ap_of(det_f), ap_of(det_b)
    assert abs(ap_f - ap_b) <= 0.05, (ap_f, ap_b)

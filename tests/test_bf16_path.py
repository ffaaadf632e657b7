"""bfloat16 compute path: same pipeline, bounded deviation from f32.

``compute_dtype="bfloat16"`` casts the frozen feature path (CNN + GNN
backbone) to bf16 — the batched forward is HBM-bandwidth-bound, so this
halves the dominant traffic. Geometry (positions, cell assignment, attrs)
and the trained recurrent head stay f32; this test pins the numeric
contract: logits close to the f32 path, and the structure (valid slots)
identical.
"""
import jax
import jax.numpy as jnp
import numpy as np

from eventad_tpu.config import Config
from eventad_tpu.data.synthetic import make_synthetic_batch
from eventad_tpu.models.backbone import make_backbone_config
from eventad_tpu.models.dagr import (graph_static_config, init_model,
                                     model_forward)


def test_bf16_matches_f32_within_tolerance():
    cfg = Config(batch_size=2, use_image=True, width=96, height=72, scale=1,
                 event_buckets=(2048,))
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=4))

    out32, _ = jax.jit(lambda p, s, b: model_forward(
        p, s, b, bc, mc, gsc, img_net=cfg.img_net, training=False))(
            params, state, batch)

    bc16 = bc._replace(compute_dtype="bfloat16")
    out16, _ = jax.jit(lambda p, s, b: model_forward(
        p, s, b, bc16, mc, gsc, img_net=cfg.img_net, training=False))(
            params, state, batch)

    v32 = np.asarray(out32.valid)
    v16 = np.asarray(out16.valid)
    np.testing.assert_array_equal(v32, v16)
    l32 = np.asarray(out32.logits)[v32]
    l16 = np.asarray(out16.logits)[v16]
    assert l16.dtype == np.float32          # head stays f32
    # bf16 features through 5 conv levels: logits feed a softmax, so the
    # absolute deviation is what moves scores (|dp| <= |dlogit|/2)
    assert np.abs(l32 - l16).max() < 0.05, np.abs(l32 - l16).max()
    # scores must correlate: anomaly ordering is what the metrics use.
    # At RANDOM init the logit signal is ~0.02 (vs ~0.008 bf16 deviation),
    # so 0.95 here; a trained head has O(1) logits where the same absolute
    # deviation is negligible.
    p32 = jax.nn.softmax(jnp.asarray(l32), axis=-1)[:, 1]
    p16 = jax.nn.softmax(jnp.asarray(l16), axis=-1)[:, 1]
    if len(l32) > 2:
        c = np.corrcoef(np.asarray(p32), np.asarray(p16))[0, 1]
        assert c > 0.95, c


def test_bf16_train_step_descends():
    """Anomaly training is head-only with DAGR frozen in eval mode
    (reference EventAD.py:149-150), so ``compute_dtype=bfloat16`` is legal
    during training: bf16 frozen features, f32 head gradients.  Pins that
    the step compiles, the loss is finite and decreases, and the trained
    parameters stay f32."""
    from eventad_tpu.parallel.train_step import (make_optimizer,
                                                 make_train_fns)
    cfg = Config(batch_size=1, use_image=True, width=96, height=72, scale=1,
                 event_buckets=(1024,), graph_lookback=256,
                 compute_dtype="bfloat16")
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=4))
    opt = make_optimizer(1e-3, 1e-5, 1.0)
    opt_state = opt.init(params.head)
    fns = make_train_fns(cfg, bc, mc, gsc, opt)
    p, s, o, m0 = fns.train_step(params, state, opt_state, batch,
                                 jax.random.PRNGKey(1))
    p, s, o, m1 = fns.train_step(p, s, o, batch, jax.random.PRNGKey(1))
    l0, l1 = float(m0["loss"]), float(m1["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(p.head)
               if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                         jnp.floating))


def test_bf16_auc_matches_f32_at_trained_scale(tmp_path):
    """Metric-level bf16 evidence at TRAINED logit scale (round-4 item: the
    random-init logit tolerance above is weaker than the signal).  The
    fixture-trained head (parity.py, deterministic 800-step fine-tune) is
    evaluated once in f32 and once with compute_dtype=bfloat16 over the
    identical converted checkpoints; the metric the reference optimizes
    (bbox AUC) must agree within 0.5%."""
    import parity
    args = ["--synthetic_data", "true",
            "--width", "96", "--height", "72", "--scale", "1",
            "--batch_size", "2", "--use_image", "false",
            "--event_buckets", "4096", "--graph_lookback", "512",
            "--num_workers", "0", "--seed", "7",
            "--dataset_directory", str(tmp_path / "data"),
            "--output_dir", str(tmp_path / "out")]
    m32 = parity.main(args)
    # second run reuses the trained fixture checkpoints written by the first
    m16 = parity.main(args + ["--compute_dtype", "bfloat16"])
    assert np.isfinite(m32["AUC"]) and np.isfinite(m16["AUC"])
    assert abs(m16["AUC"] - m32["AUC"]) <= 0.005 * m32["AUC"], \
        (m32["AUC"], m16["AUC"])
    assert abs(m16["AUC-Frame"] - m32["AUC-Frame"]) \
        <= 0.005 * m32["AUC-Frame"], (m32["AUC-Frame"], m16["AUC-Frame"])
    # trained-scale scores: bf16 must not perturb the mean score stream by
    # more than ~0.5% relative either
    assert abs(m16["score_mean"] - m32["score_mean"]) \
        <= 0.005 * abs(m32["score_mean"])

"""Full detector forward + loss end-to-end on a small config."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.config import Config
from eventad_tpu.data.synthetic import make_synthetic_batch
from eventad_tpu.models.detector import detector_forward, init_detector
from eventad_tpu.models.yolox_loss import (convert_to_training_format,
                                           make_anchor_geometry, yolox_loss)


def test_detector_forward_and_loss():
    cfg = Config(batch_size=2, width=96, height=72, scale=1,
                 use_image=True, event_buckets=(1024,), graph_lookback=256)
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, events_per_item=1024))

    # training=True: batch-stat BN keeps random-init activations bounded
    # (eval-mode running stats at init overflow exp() in decode, exactly
    # like the torch reference would)
    dets, decoded, new_state = detector_forward(params, state, batch, cfg,
                                                bc, training=True)
    b = cfg.batch_size
    grids = [bc.grids[2], bc.grids[3]]
    n_anchors = sum(nx * ny for nx, ny in grids)
    assert decoded.shape == (b, n_anchors, 7)
    assert dets["boxes"].shape[0] == b
    assert bool(jnp.isfinite(decoded).all())
    assert bool(jnp.isfinite(dets["scores"]).all())

    # training loss on the same decoded outputs
    strides = [int(round(bc.height / g[1])) for g in grids]
    geom = make_anchor_geometry(grids, strides)
    tgt, tmask = convert_to_training_format(batch.bbox, batch.bbox_mask)
    # loss expects logits for obj/cls: invert the eval-path sigmoid
    logits = decoded.at[..., 4:].set(
        jnp.log(jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6))
        - jnp.log1p(-jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6)))
    losses = yolox_loss(logits, tgt, tmask, geom)
    assert bool(jnp.isfinite(losses["total"]))
    assert float(losses["num_fg"]) > 0


def test_detector_forward_bf16():
    """The bf16 feature path through the detector: finite decode, f32
    geometry out of decode/NMS, structure matches the f32 path."""
    cfg = Config(batch_size=2, width=96, height=72, scale=1,
                 use_image=True, event_buckets=(1024,), graph_lookback=256,
                 compute_dtype="bfloat16")
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg)
    assert bc.compute_dtype == "bfloat16"
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, events_per_item=1024))
    dets, decoded, _ = detector_forward(params, state, batch, cfg, bc,
                                        training=True)
    assert decoded.dtype == jnp.float32       # decode/NMS geometry f32
    assert bool(jnp.isfinite(decoded).all())
    assert bool(jnp.isfinite(dets["scores"]).all())

    cfg32 = cfg.replace(compute_dtype="float32")
    p32, s32, bc32 = init_detector(jax.random.PRNGKey(0), cfg32)
    _, decoded32, _ = detector_forward(p32, s32, batch, cfg32, bc32,
                                       training=True)
    import numpy as np
    # same pipeline within bf16 tolerance: compare the linear decode parts
    # (xy centers, sigmoided obj/cls); wh goes through exp(), which
    # amplifies bf16 deltas at random init
    d32 = np.asarray(decoded32)
    d16 = np.asarray(decoded)
    # loose bounds: random-init + batch-stat BN renormalizes activations,
    # amplifying bf16 deltas; trained weights behave far tighter (see
    # tests/test_bf16_path.py for the anomaly pipeline contract)
    rel_xy = np.abs(d16[..., :2] - d32[..., :2]) \
        / (np.abs(d32[..., :2]) + 1.0)
    assert np.median(rel_xy) < 0.05, np.median(rel_xy)
    assert rel_xy.max() < 0.5, rel_xy.max()
    assert np.abs(d16[..., 4:] - d32[..., 4:]).max() < 0.3

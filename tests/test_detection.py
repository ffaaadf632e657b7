"""Detection components: NMS, decode, mAP buffer, simOTA loss."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.models.yolox_head import (decode_outputs, nms_fixed,
                                           postprocess)
from eventad_tpu.models.yolox_loss import (convert_to_training_format,
                                           make_anchor_geometry, yolox_loss)
from eventad_tpu.utils.detection_eval import DetectionBuffer, box_iou


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40],
                         [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([0, 0, 0, 1])   # last overlaps but other class
    idx, mask = nms_fixed(boxes, scores, classes, iou_threshold=0.5,
                          score_threshold=0.1, max_out=4, width=64,
                          height=64)
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {0, 2, 3}   # box 1 suppressed; box 3 survives (class 1)


def test_decode_outputs_geometry():
    b, c = 1, 2
    m = jnp.zeros((b, 5 + c, 2, 3))       # ny=2, nx=3, stride 16
    m = m.at[:, 2:4].set(jnp.log(2.0))    # wh = 2*stride
    out = decode_outputs([m], [16])
    assert out.shape == (1, 6, 7)
    np.testing.assert_allclose(np.asarray(out[0, 0, :2]), [0, 0])
    np.testing.assert_allclose(np.asarray(out[0, 4, :2]), [16, 16])
    np.testing.assert_allclose(np.asarray(out[0, 0, 2:4]), [32, 32])


def test_box_iou_and_map():
    buf = DetectionBuffer(num_classes=2)
    gt = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
          "labels": np.array([0, 1])}
    det = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30],
                              [50, 50, 60, 60]]),
           "scores": np.array([0.9, 0.8, 0.7]),
           "labels": np.array([0, 1, 0])}
    buf.update([det], [gt])
    m = buf.compute()
    assert m["mAP_50"] > 0.99   # both matched at IoU 1.0
    iou = box_iou(np.array([[0, 0, 10, 10.]]), np.array([[5, 0, 15, 10.]]))
    np.testing.assert_allclose(iou[0, 0], 1 / 3, atol=1e-6)


def test_yolox_loss_prefers_correct_predictions(rng):
    grids = [(4, 3)]
    geom = make_anchor_geometry(grids, [16])
    a = 12
    bbox = np.zeros((1, 3, 6), np.float32)
    bbox[0, 0] = (8, 8, 16, 16, 1, 1)      # gt at cell (0..1, 0..1)
    bbox_mask = np.zeros((1, 3), bool)
    bbox_mask[0, 0] = True
    tgt, tmask = convert_to_training_format(jnp.asarray(bbox),
                                            jnp.asarray(bbox_mask))

    def outputs(perfect):
        o = np.zeros((1, a, 7), np.float32)
        o[..., :2] = np.asarray(geom.centers)
        o[..., 2:4] = 8.0
        o[..., 4] = -4.0                    # low obj everywhere
        if perfect:
            o[0, 0, :4] = (16, 16, 16, 16)  # anchor 0 matches gt box
            o[0, 0, 4] = 4.0
            o[0, 0, 5 + 1] = 4.0            # class 1 logit
        return jnp.asarray(o)

    bad = yolox_loss(outputs(False), tgt, tmask, geom)
    good = yolox_loss(outputs(True), tgt, tmask, geom)
    assert float(good["total"]) < float(bad["total"])
    assert float(good["num_fg"]) >= 1


def test_yolox_loss_grads_finite(rng):
    grids = [(4, 3)]
    geom = make_anchor_geometry(grids, [16])
    bbox = np.zeros((2, 4, 6), np.float32)
    bbox[0, 0] = (5, 5, 20, 20, 0, 1)
    bbox[1, 0] = (30, 10, 15, 25, 1, 2)
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True
    tgt, tmask = convert_to_training_format(jnp.asarray(bbox),
                                            jnp.asarray(mask))
    out = jnp.asarray(rng.randn(2, 12, 7).astype(np.float32))
    out = out.at[..., :2].add(jnp.asarray(geom.centers))
    out = out.at[..., 2:4].set(10.0)

    def loss_fn(o):
        return yolox_loss(o, tgt, tmask, geom)["total"]
    g = jax.grad(loss_fn)(out)
    assert bool(jnp.isfinite(g).all())

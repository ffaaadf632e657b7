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


def test_time_windowed_eval_rejects_late_detections():
    """A detection at the right place but the wrong TIME must not count —
    plain (timeless) mAP gets this wrong, the windowed eval gets it right
    (reference coco_eval.py:110-145 semantics)."""
    from eventad_tpu.utils.detection_eval import (DetectionBuffer,
                                                  evaluate_detection_windowed)
    box = np.array([[10.0, 10.0, 30.0, 30.0]])
    lab = np.array([0])
    sc = np.array([0.9])
    gt = {"t": np.array([0]), "boxes": box, "labels": lab}
    dt_late = {"t": np.array([1_000_000]), "boxes": box, "labels": lab,
               "scores": sc}
    dt_ontime = {"t": np.array([10_000]), "boxes": box, "labels": lab,
                 "scores": sc}

    # plain mAP (whole sequence as one image) scores the late det perfectly
    buf = DetectionBuffer(num_classes=1)
    buf.update([{"boxes": box, "scores": sc, "labels": lab}],
               [{"boxes": box, "labels": lab}])
    assert buf.compute()["mAP_50"] > 0.98

    res_late = evaluate_detection_windowed([gt], [dt_late], num_classes=1,
                                           time_tol=50_000)
    res_ontime = evaluate_detection_windowed([gt], [dt_ontime],
                                             num_classes=1, time_tol=50_000)
    assert res_ontime["mAP_50"] > 0.98
    assert not (res_late["mAP_50"] > 0)  # nan or 0: no dets in any window


def test_time_windowed_eval_windows_are_per_timestamp():
    from eventad_tpu.utils.detection_eval import match_times
    gt_t = np.array([0, 0, 100_000, 200_000])
    dt_t = np.array([-10_000, 40_000, 90_000, 210_000])
    gt_win, dt_win = match_times(np.unique(gt_t), gt_t, dt_t, 50_000)
    assert gt_win == [(0, 2), (2, 3), (3, 4)]
    # ts=0: dets in [-50k, 50k] -> idx 0..1; ts=100k: [50k,150k] -> idx 2;
    # ts=200k: [150k,250k] -> idx 3
    assert dt_win == [(0, 2), (2, 3), (3, 4)]


def test_yolox_l1_branch(rng):
    """l1_weight gates an exact raw-space L1: zero for perfect boxes,
    positive and gradient-finite for offset boxes."""
    grids = [(4, 3)]
    geom = make_anchor_geometry(grids, [16])
    bbox = np.zeros((1, 2, 6), np.float32)
    bbox[0, 0] = (8, 8, 16, 16, 1, 1)
    mask = np.zeros((1, 2), bool)
    mask[0, 0] = True
    tgt, tmask = convert_to_training_format(jnp.asarray(bbox),
                                            jnp.asarray(mask))

    def outputs(dx):
        o = np.zeros((1, 12, 7), np.float32)
        o[..., :2] = np.asarray(geom.centers)
        o[..., 2:4] = 8.0
        o[..., 4] = -4.0
        o[0, 0, :4] = (16 + dx, 16, 16, 16)
        o[0, 0, 4] = 4.0
        o[0, 0, 6] = 4.0
        return jnp.asarray(o)

    perfect = yolox_loss(outputs(0.0), tgt, tmask, geom, l1_weight=1.0)
    off = yolox_loss(outputs(4.0), tgt, tmask, geom, l1_weight=1.0)
    off_no_l1 = yolox_loss(outputs(4.0), tgt, tmask, geom, l1_weight=0.0)
    # the matched anchor's own L1 contribution: 4 px / stride 16 = 0.25
    assert float(perfect["l1"]) < 1e-5
    assert float(off["l1"]) > 0.2
    assert float(off_no_l1["l1"]) == 0.0
    assert float(off["total"]) > float(off_no_l1["total"])

    def loss_fn(o):
        return yolox_loss(o, tgt, tmask, geom, l1_weight=1.0)["total"]
    g = jax.grad(loss_fn)(outputs(4.0))
    assert bool(jnp.isfinite(g).all())

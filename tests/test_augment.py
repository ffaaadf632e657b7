"""Host-side augmentations: geometry invariants + reference-kernel oracles."""
import numpy as np

from eventad_tpu.data.augment import (Compose, Crop, RandomCrop, RandomHFlip,
                                      RandomTranslate, RandomZoom,
                                      _crop_bbox)
from eventad_tpu.data.dataset import Item
from eventad_tpu import native


def _item(rng, w=64, h=48, n=500):
    ev = dict(x=rng.randint(0, w, n).astype(np.int32),
              y=rng.randint(0, h, n).astype(np.int32),
              t=np.sort(rng.randint(0, 10**6, n)).astype(np.int32),
              p=rng.choice([-1, 1], n).astype(np.int8))
    bbox = np.array([[10, 10, 20, 15, 0, 1], [40, 20, 15, 20, 1, 2]],
                    np.float32)
    return Item(events=ev, image=rng.randint(0, 255, (h, w, 3), np.uint8),
                bbox=bbox.copy(), bbox0=bbox.copy(), sequence="s",
                frame_id=0, width=w, height=h, time_window=10**6)


def test_hflip(rng):
    it = _item(rng)
    x0 = it.events["x"].copy()
    b0 = it.bbox.copy()
    out = RandomHFlip(p=1.0, seed=0)(it)
    assert (out.events["x"] == 63 - x0).all()
    # box flips: new x = W-1 - (x + w)
    np.testing.assert_allclose(out.bbox[0, 0], 63 - (b0[0, 0] + b0[0, 2]))
    assert (out.bbox[:, 2:4] == b0[:, 2:4]).all()   # sizes preserved
    assert (out.bbox[:, 4:] == b0[:, 4:]).all()     # class/track preserved


def test_final_crop_bounds_everything(rng):
    it = _item(rng)
    it = RandomTranslate(size=0.2, seed=3)(it)       # may go out of frame
    out = Crop((0, 0), (1, 1))(it)
    assert (out.events["x"] >= 0).all() and (out.events["x"] <= 63).all()
    assert (out.events["y"] >= 0).all() and (out.events["y"] <= 47).all()
    for b in (out.bbox, out.bbox0):
        assert (b[:, 0] >= 0).all() and (b[:, 0] + b[:, 2] <= 63).all()
        assert (b[:, 1] >= 0).all() and (b[:, 1] + b[:, 3] <= 47).all()


def test_random_crop_oracle(rng):
    it = _item(rng, n=2000)
    ev0 = {k: v.copy() for k, v in it.events.items()}
    img0 = it.image.copy()
    rc = RandomCrop((0.5, 0.5), p=1.0, seed=7)
    out = rc(it)
    # recover the window the transform drew (same rng replay)
    r = np.random.RandomState(7)
    r.rand()
    size = [int(np.clip(0.5 * 64, 0, 63)), int(np.clip(0.5 * 48, 0, 47))]
    left = [int(r.rand() * (64 - size[0])), int(r.rand() * (48 - size[1]))]
    right = [left[0] + size[0], left[1] + size[1]]
    inside = ((ev0["x"] >= left[0]) & (ev0["x"] <= right[0])
              & (ev0["y"] >= left[1]) & (ev0["y"] <= right[1]))
    assert len(out.events["x"]) == int(inside.sum())
    # image zeroed outside, untouched inside
    assert (out.image[:left[1]] == 0).all()
    assert (out.image[right[1]:] == 0).all()
    assert (out.image[left[1]:right[1], left[0]:right[0]]
            == img0[left[1]:right[1], left[0]:right[0]]).all()
    # bboxes clamped into window
    for b in (out.bbox, out.bbox0):
        assert (b[:, 0] >= left[0]).all()
        assert (b[:, 0] + b[:, 2] <= right[0]).all()


def test_crop_bbox_degenerate_outside():
    # a box entirely outside the window collapses to zero size at the edge
    b = np.array([[50., 40., 10., 5., 0., 1.]])
    out = _crop_bbox(b, (0, 0), (31, 23))
    assert out[0, 2] == 0 and out[0, 3] == 0


def test_zoom_in_scales_positions(rng):
    it = _item(rng)
    x0 = it.events["x"].copy()
    out = RandomZoom((1.2, 1.2), seed=1)(it)
    exp = np.trunc((x0 - 32) * 1.2 + 32).astype(np.int32)
    assert (out.events["x"] == exp).all()
    assert (out.bbox[:, 2] > 0).all()


def test_zoom_out_subsample_density():
    """zoom < 1 crowds events onto fewer pixels; the accumulator keeps
    ~z^2 of same-polarity events at a pixel (threshold 1/z^2)."""
    w = h = 32
    n = 400
    ev = dict(x=np.full(n, 16, np.int32), y=np.full(n, 16, np.int32),
              t=np.arange(n, dtype=np.int32), p=np.ones(n, np.int8))
    it = Item(events=ev, image=np.zeros((h, w, 3), np.uint8),
              bbox=np.zeros((0, 6), np.float32),
              bbox0=np.zeros((0, 6), np.float32), sequence="s", frame_id=0,
              width=w, height=h, time_window=10**6)
    out = RandomZoom((0.5, 0.5), seed=0, subsample=True)(it)
    kept = len(out.events["t"])
    # threshold = 1/0.25 = 4, strict >: first fire at event 5 (count 5 > 4,
    # reset to 1), then every 4 events -> 1 + (n-5)//4
    assert kept == 1 + (n - 5) // 4
    # without subsample everything survives
    it2 = Item(events={k: v.copy() for k, v in ev.items()},
               image=np.zeros((h, w, 3), np.uint8),
               bbox=np.zeros((0, 6), np.float32),
               bbox0=np.zeros((0, 6), np.float32), sequence="s", frame_id=0,
               width=w, height=h, time_window=10**6)
    out2 = RandomZoom((0.5, 0.5), seed=0, subsample=False)(it2)
    assert len(out2.events["t"]) == n


def test_zoom_subsample_native_matches_python_oracle(rng):
    n, w, h = 5000, 40, 30
    x = rng.randint(0, w + 1, n).astype(np.int32)
    y = rng.randint(0, h + 1, n).astype(np.int32)
    p = rng.choice([-1, 1], n).astype(np.int8)
    thr = 3.7
    got = native.zoom_subsample_mask(x, y, p, w, h, thr)
    # sequential oracle (literal transcription of reference augment.py:13-37
    # specialised to integer positions)
    count = np.zeros((h + 1, w + 1), np.float32)
    exp = np.zeros(n, bool)
    for i in range(n):
        count[y[i], x[i]] += float(p[i])
        pol = 1.0 if count[y[i], x[i]] > 0 else -1.0
        if pol * count[y[i], x[i]] > thr:
            count[y[i], x[i]] -= pol * thr
            exp[i] = True
    assert (got == exp).all()


def test_training_pipeline_runs(rng):
    from eventad_tpu.config import Config
    cfg = Config(aug_p_flip=0.5, aug_trans=0.1, aug_zoom=1.5,
                 aug_zoom_min=0.7)
    from eventad_tpu.data.augment import training_transform
    tf = training_transform(cfg, seed=0)
    for i in range(10):
        out = tf(_item(rng))
        assert (out.events["x"] >= 0).all() and (out.events["x"] <= 63).all()
        assert (out.events["y"] >= 0).all() and (out.events["y"] <= 47).all()
        assert out.image.shape == (48, 64, 3)

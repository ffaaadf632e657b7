"""Host-side augmentations preserve geometry invariants."""
import numpy as np

from eventad_tpu.data.augment import (RandomHFlip, RandomTranslate,
                                      RandomZoom, subsample_events)
from eventad_tpu.data.dataset import Item


def _item(rng, w=64, h=48, n=500):
    ev = dict(x=rng.randint(0, w, n).astype(np.int32),
              y=rng.randint(0, h, n).astype(np.int32),
              t=np.sort(rng.randint(0, 10**6, n)).astype(np.int32),
              p=rng.choice([-1, 1], n).astype(np.int8))
    bbox = np.array([[10, 10, 20, 15, 0, 1], [40, 20, 15, 20, 1, 2]],
                    np.float32)
    return Item(events=ev, image=rng.randint(0, 255, (h, w, 3), np.uint8)
                if hasattr(rng, "randint") else None,
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


def test_translate_keeps_events_in_fov(rng):
    it = _item(rng)
    out = RandomTranslate(max_frac=0.2, p=1.0, seed=3)(it)
    assert (out.events["x"] >= 0).all() and (out.events["x"] < 64).all()
    assert (out.events["y"] >= 0).all() and (out.events["y"] < 48).all()


def test_zoom_keeps_events_in_fov(rng):
    it = _item(rng)
    n0 = len(it.events["t"])
    out = RandomZoom(max_zoom=1.5, p=1.0, seed=1)(it)
    assert (out.events["x"] >= 0).all() and (out.events["x"] < 64).all()
    assert len(out.events["t"]) <= n0 + 1
    assert (out.bbox[:, 2] > 0).all()


def test_subsample_balanced(rng):
    ev = dict(x=rng.randint(0, 64, 2000), y=rng.randint(0, 48, 2000),
              t=np.arange(2000), p=rng.choice([-1, 1], 2000))
    out = subsample_events(ev, 500, rng)
    assert len(out["t"]) == 500
    frac = (out["p"] > 0).mean()
    assert 0.3 < frac < 0.7

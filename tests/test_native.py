"""Native evio library vs numpy fallbacks."""
import numpy as np

from eventad_tpu import native


def _events(rng, n=5000, t_span=200_000):
    return dict(
        x=rng.randint(0, 300, n).astype(np.uint16),
        y=rng.randint(0, 250, n).astype(np.uint16),
        t=np.sort(rng.randint(0, t_span, n)).astype(np.int64),
        p=rng.randint(0, 2, n).astype(np.uint8))


def test_native_builds():
    assert native.get_lib() is not None, "g++ build of evio.cpp failed"


def test_window_rebase_matches_numpy(rng):
    ev = _events(rng)
    got = native.window_rebase(ev, 50_000, 150_000, 1_000_000, 200)
    # force the numpy path
    lib, native._LIB = native._LIB, None
    tried = native._TRIED
    native._TRIED = True
    try:
        exp = native.window_rebase(ev, 50_000, 150_000, 1_000_000, 200)
    finally:
        native._LIB, native._TRIED = lib, tried
    for k in "xytp":
        np.testing.assert_array_equal(got[k], exp[k])
    assert got["t"].max() == 1_000_000
    assert set(np.unique(got["p"])) <= {-1, 1}


def test_subsample_balanced(rng):
    ev = dict(x=rng.randint(0, 300, 4000).astype(np.int32),
              y=rng.randint(0, 200, 4000).astype(np.int32),
              t=np.sort(rng.randint(0, 10**6, 4000)).astype(np.int32),
              p=rng.choice([-1, 1], 4000).astype(np.int8))
    out = native.subsample_balanced(ev, 1000)
    assert len(out["t"]) <= 1000
    assert (np.diff(out["t"]) >= 0).all()   # order preserved
    pos = (out["p"] > 0).sum()
    assert 0.3 < pos / max(len(out["p"]), 1) < 0.7

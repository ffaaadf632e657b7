"""Data layer: h5 roundtrip, window queries, dataset items, batching."""
import numpy as np
import pytest

from eventad_tpu.config import Config
from eventad_tpu.data.batching import Loader, collate, pick_bucket
from eventad_tpu.data.h5io import EventFile, create_ms_to_idx, write_events
from eventad_tpu.data.fixtures import generate_dataset
from eventad_tpu.data.dataset import SequenceDataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    cfg = Config(width=96, height=72, scale=1, batch_size=2)
    generate_dataset(root, cfg, n_train=1, n_val=1, n_frames=8,
                     events_per_window=800)
    return root, cfg


def test_h5_roundtrip_and_window(tmp_path, rng):
    n = 3000
    ev = dict(x=rng.randint(0, 100, n).astype(np.uint16),
              y=rng.randint(0, 80, n).astype(np.uint16),
              t=np.sort(rng.randint(0, 500_000, n)).astype(np.int64),
              p=rng.randint(0, 2, n).astype(np.uint8))
    path = tmp_path / "e.h5"
    write_events(path, ev, t_offset=123)
    f = EventFile(path)
    assert f.t_offset == 123
    assert f.n_events == n
    w = f.load_window(100_000, 200_000)
    exp = (ev["t"] >= 100_000) & (ev["t"] < 200_000)
    assert len(w["t"]) == exp.sum()
    np.testing.assert_array_equal(np.sort(w["t"]), np.sort(ev["t"][exp]))
    # ms index invariant
    idx = create_ms_to_idx(ev["t"])
    for ms in (0, 17, 499):
        assert (ev["t"][: int(idx[ms])] < ms * 1000).all()


def test_dataset_items(synth_root):
    root, cfg = synth_root
    cfg = cfg.replace(split=str(root / "rol_split.yaml"))
    ds = SequenceDataset(cfg, root, "val")
    assert len(ds) == 7
    it = ds[3]
    assert it.events["t"].max() == cfg.time_window_us
    assert (np.diff(it.events["t"]) >= 0).all()
    assert set(np.unique(it.events["p"])) <= {-1, 1}
    assert it.image.shape == (cfg.model_height, cfg.model_width, 3)
    assert it.bbox.shape[1] == 6
    # labels live in column 4, track ids in column 5
    assert (it.bbox[:, 5] >= 1).all()


def test_dataset_preload_matches_h5(synth_root):
    root, cfg = synth_root
    cfg = cfg.replace(split=str(root / "rol_split.yaml"))
    ds = SequenceDataset(cfg, root, "val")
    ds.preload_events = True
    a = ds[2]
    ds2 = SequenceDataset(cfg, root, "val")
    ds2.preload_events = False
    b = ds2[2]
    for k in "xytp":
        np.testing.assert_array_equal(a.events[k], b.events[k])


def test_collate_buckets(synth_root):
    root, cfg = synth_root
    cfg = cfg.replace(split=str(root / "rol_split.yaml"),
                      event_buckets=(256, 1024, 4096))
    ds = SequenceDataset(cfg, root, "val")
    batch, meta = collate([ds[0], ds[1]], cfg)
    assert batch.pos.shape[1] in (256, 1024, 4096)
    assert batch.valid.sum() > 0
    assert batch.box_present[:, 1].sum() > 0
    assert pick_bucket(300, (256, 1024)) == 1024
    assert pick_bucket(5000, (256, 1024)) == 1024  # capped at largest


def test_loader_iteration(synth_root):
    root, cfg = synth_root
    cfg = cfg.replace(split=str(root / "rol_split.yaml"))
    ds = SequenceDataset(cfg, root, "val")
    loader = Loader(ds, cfg, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    seqs = [s for _b, m in batches for s in m.sequences]
    assert len(seqs) == len(ds)


def test_loader_process_pool_matches_serial(synth_root):
    """The shared-memory decode pool must produce byte-identical batches
    to the in-process path, in order, across two epochs (pool persists)."""
    root, cfg = synth_root
    cfg = cfg.replace(split=str(root / "rol_split.yaml"))
    ds = SequenceDataset(cfg, root, "val")
    serial = Loader(ds, cfg, shuffle=True, seed=3, prefetch=0,
                    num_workers=0)
    pooled = Loader(ds, cfg, shuffle=True, seed=3, num_workers=2)
    try:
        for _epoch in range(2):
            got = list(pooled)
            want = list(serial)
            assert len(got) == len(want) > 0
            for (gb, gm), (wb, wm) in zip(got, want):
                assert gm.sequences == wm.sequences
                assert gm.frame_ids == wm.frame_ids
                for a, b in zip(gb, wb):
                    np.testing.assert_array_equal(a, b)
    finally:
        pooled.close()

"""Pallas neighbour-search kernel vs the numpy oracle (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from eventad_tpu.ops.event_graph import build_graph_numpy
from eventad_tpu.ops.event_graph_pallas import build_graph_pallas
from tests.test_event_graph import make_events


def test_pallas_matches_reference(rng):
    pos, valid = make_events(rng, 384, n_valid=360)
    kw = dict(radius=3, delta_t_us=20_000, max_neighbors=8,
              max_queue_size=16)
    ref_nbr, ref_mask, ref_off = build_graph_numpy(pos, valid, **kw)
    nbr, mask, off = build_graph_pallas(
        jnp.asarray(pos)[None], jnp.asarray(valid)[None],
        lookback=384, chunk=128, interpret=True, **kw)
    nbr, mask, off = np.asarray(nbr[0]), np.asarray(mask[0]), np.asarray(off[0])
    assert (mask == ref_mask).all()
    assert (np.where(mask, nbr, 0) == np.where(ref_mask, ref_nbr, 0)).all()
    # spiral-decoded pixel offsets equal pos[dst] - pos[src]
    assert (np.where(mask[..., None], off, 0)
            == np.where(ref_mask[..., None], ref_off, 0)).all()


def test_pallas_dense_pixels(rng):
    pos, valid = make_events(rng, 256, w=4, h=3, t_max=5_000)
    kw = dict(radius=2, delta_t_us=4_000, max_neighbors=6, max_queue_size=8)
    ref_nbr, ref_mask, ref_off = build_graph_numpy(pos, valid, **kw)
    nbr, mask, off = build_graph_pallas(
        jnp.asarray(pos)[None], jnp.asarray(valid)[None],
        lookback=256, chunk=64, interpret=True, **kw)
    assert (np.where(ref_mask[..., None], np.asarray(off[0]), 0)
            == np.where(ref_mask[..., None], ref_off, 0)).all()
    assert (np.asarray(mask[0]) == ref_mask).all()
    assert (np.where(ref_mask, np.asarray(nbr[0]), 0)
            == np.where(ref_mask, ref_nbr, 0)).all()


def test_pallas_batched_partial_chunks(rng):
    pos0, valid0 = make_events(rng, 300)
    pos1, valid1 = make_events(rng, 300, n_valid=150)
    pos = jnp.stack([jnp.asarray(pos0), jnp.asarray(pos1)])
    valid = jnp.stack([jnp.asarray(valid0), jnp.asarray(valid1)])
    kw = dict(radius=3, delta_t_us=30_000, max_neighbors=8)
    nbr, mask, _ = build_graph_pallas(pos, valid, lookback=300, chunk=128,
                                      interpret=True, **kw)
    for b, (p, v) in enumerate([(pos0, valid0), (pos1, valid1)]):
        rn, rm, _ = build_graph_numpy(p, v, max_queue_size=128, **kw)
        assert (np.asarray(mask[b]) == rm).all()
        assert (np.where(rm, np.asarray(nbr[b]), 0)
                == np.where(rm, rn, 0)).all()


def test_pallas_tall_grid_key_packing(rng):
    """Sensors taller than 256 px: the packed pixel key's x field must
    shrink to the static width so y gets the remaining bits (the legacy
    fixed 15-bit x split wrapped the int32 key for y >= 256)."""
    w, h = 640, 480
    pos, valid = make_events(rng, 384, w=w, h=h, n_valid=370)
    pos[:, 1] = np.maximum(pos[:, 1], 256)       # force the overflow zone
    kw = dict(radius=3, delta_t_us=40_000, max_neighbors=8,
              max_queue_size=16)
    ref_nbr, ref_mask, ref_off = build_graph_numpy(pos, valid, **kw)
    nbr, mask, off = build_graph_pallas(
        jnp.asarray(pos)[None], jnp.asarray(valid)[None],
        lookback=384, chunk=128, grid_wh=(w, h), interpret=True, **kw)
    assert (np.asarray(mask[0]) == ref_mask).all()
    assert (np.where(ref_mask, np.asarray(nbr[0]), 0)
            == np.where(ref_mask, ref_nbr, 0)).all()
    assert (np.where(ref_mask[..., None], np.asarray(off[0]), 0)
            == np.where(ref_mask[..., None], ref_off, 0)).all()


def test_pallas_grid_too_tall_asserts():
    import pytest
    pos = jnp.zeros((1, 128, 3), jnp.int32)
    valid = jnp.ones((1, 128), bool)
    with pytest.raises(AssertionError, match="packed pixel key"):
        build_graph_pallas(pos, valid, radius=3, delta_t_us=1000,
                           grid_wh=(2048, 8192), interpret=True)


def test_pallas_narrow_chunk16(rng):
    """chunk=16 (the streaming append tile — fills the kernel's 128 lanes
    when only ~1.5k tail destinations exist) must produce the identical
    edge set: chunk is an implementation tile, candidate reach stays
    ``lookback``."""
    pos, valid = make_events(rng, 384, n_valid=360)
    kw = dict(radius=3, delta_t_us=20_000, max_neighbors=8,
              max_queue_size=16)
    ref_nbr, ref_mask, ref_off = build_graph_numpy(pos, valid, **kw)
    nbr, mask, off = build_graph_pallas(
        jnp.asarray(pos)[None], jnp.asarray(valid)[None],
        lookback=384, chunk=16, interpret=True, **kw)
    nbr, mask, off = (np.asarray(nbr[0]), np.asarray(mask[0]),
                      np.asarray(off[0]))
    assert (mask == ref_mask).all()
    assert (np.where(mask, nbr, 0) == np.where(ref_mask, ref_nbr, 0)).all()
    assert (np.where(mask[..., None], off, 0)
            == np.where(ref_mask[..., None], ref_off, 0)).all()

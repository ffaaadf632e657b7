"""Event-graph builder vs a literal simulation of the reference CUDA kernel."""
import numpy as np
import jax.numpy as jnp

from eventad_tpu.ops.event_graph import (
    build_graph, build_graph_single, build_graph_numpy, spiral_index_table,
    queue_rank)


def make_events(rng, n, w=48, h=32, t_max=100_000, n_valid=None):
    n_valid = n if n_valid is None else n_valid
    x = rng.randint(0, w, size=n).astype(np.int32)
    y = rng.randint(0, h, size=n).astype(np.int32)
    t = np.sort(rng.randint(0, t_max, size=n)).astype(np.int32)
    pos = np.stack([x, y, t], axis=1)
    valid = np.arange(n) < n_valid
    return pos, valid


def test_spiral_table_first_ring():
    t = spiral_index_table(2)
    r = 2
    assert t[r + 0, r + 0] == 0          # center first
    assert t[r + 0, r + 1] == 1          # (1, 0)
    assert t[r + 1, r + 1] == 2          # (1, 1)
    assert t[r + 1, r + 0] == 3          # (0, 1)
    assert t[r + 1, r - 1] == 4          # (-1, 1)
    assert t[r + 0, r - 1] == 5          # (-1, 0)
    assert t[r - 1, r - 1] == 6          # (-1, -1)
    assert t[r - 1, r + 0] == 7          # (0, -1)
    assert t[r - 1, r + 1] == 8          # (1, -1)
    side = 2 * r + 1
    vals = np.sort(t.ravel())
    assert (vals == np.arange(side * side)).all()   # bijection


def test_spiral_offset_inverse():
    """spiral_offset is the exact arithmetic inverse of spiral_index."""
    from eventad_tpu.ops.event_graph import spiral_index, spiral_offset
    r = 12
    dy, dx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                         indexing="ij")
    s = np.asarray(spiral_index(jnp.asarray(dx), jnp.asarray(dy)))
    gx, gy = spiral_offset(jnp.asarray(s))
    assert (np.asarray(gx) == dx).all()
    assert (np.asarray(gy) == dy).all()


def test_queue_rank(rng):
    pix = np.array([3, 3, 7, 3, 7, 9], dtype=np.int32)
    valid = np.array([1, 1, 1, 1, 1, 0], dtype=bool)
    r = np.asarray(queue_rank(jnp.asarray(pix), jnp.asarray(valid)))
    # pixel 3 events at idx 0,1,3 -> ranks 2,1,0 ; pixel 7 idx 2,4 -> 1,0
    assert list(r[:5]) == [2, 1, 1, 0, 0]
    assert r[5] > 5


def test_graph_matches_reference(rng):
    for trial in range(3):
        pos, valid = make_events(rng, 400, n_valid=380)
        kw = dict(radius=3, delta_t_us=20_000, max_neighbors=8,
                  max_queue_size=16)
        ref_nbr, ref_mask, ref_off = build_graph_numpy(pos, valid, **kw)
        nbr, mask, off = build_graph_single(
            jnp.asarray(pos), jnp.asarray(valid), lookback=400, chunk=64,
            **kw)
        nbr, mask, off = np.asarray(nbr), np.asarray(mask), np.asarray(off)
        assert (mask == ref_mask).all()
        assert (np.where(mask, nbr, 0) == np.where(ref_mask, ref_nbr, 0)).all()
        # per-edge pixel offsets equal pos[dst] - pos[src]
        assert (np.where(ref_mask[..., None], off, 0)
                == np.where(ref_mask[..., None], ref_off, 0)).all()
        d = pos[:, None, :2] - pos[ref_nbr][:, :, :2]
        assert (off[ref_mask] == d[ref_mask]).all()


def test_graph_dense_pixel(rng):
    # many events on few pixels exercises the queue-depth cutoff
    pos, valid = make_events(rng, 300, w=4, h=3, t_max=5_000)
    kw = dict(radius=2, delta_t_us=4_000, max_neighbors=6, max_queue_size=8)
    ref_nbr, ref_mask, _ = build_graph_numpy(pos, valid, **kw)
    nbr, mask, _ = build_graph_single(jnp.asarray(pos), jnp.asarray(valid),
                                      lookback=300, chunk=50, **kw)
    assert (np.asarray(mask) == ref_mask).all()
    assert (np.where(ref_mask, np.asarray(nbr), 0)
            == np.where(ref_mask, ref_nbr, 0)).all()


def test_graph_batched(rng):
    pos0, valid0 = make_events(rng, 256)
    pos1, valid1 = make_events(rng, 256, n_valid=100)
    pos = jnp.stack([jnp.asarray(pos0), jnp.asarray(pos1)])
    valid = jnp.stack([jnp.asarray(valid0), jnp.asarray(valid1)])
    nbr, mask, _ = build_graph(pos, valid, radius=3, delta_t_us=30_000,
                               max_neighbors=8, lookback=256, chunk=64)
    assert nbr.shape == (2, 256, 8)
    for b, (p, v) in enumerate([(pos0, valid0), (pos1, valid1)]):
        rn, rm, _ = build_graph_numpy(p, v, radius=3, delta_t_us=30_000,
                                      max_neighbors=8)
        assert (np.asarray(mask[b]) == rm).all()
    # self edges present for every valid event
    assert (np.asarray(mask[1, :100, 0])).all()
    assert (~np.asarray(mask[1, 100:, 0])).all()


def test_edge_invariants(rng):
    """Reference ev_tgn.py:53-56: src_i <= dst_i, destinations ordered."""
    pos, valid = make_events(rng, 200)
    nbr, mask, _ = build_graph_single(jnp.asarray(pos), jnp.asarray(valid),
                                      radius=3, delta_t_us=50_000,
                                      max_neighbors=8, lookback=200, chunk=64)
    nbr, mask = np.asarray(nbr), np.asarray(mask)
    dst = np.arange(200)[:, None]
    assert (nbr[mask] <= np.broadcast_to(dst, nbr.shape)[mask]).all()


def test_precomputed_ranks_match_ingraph(rng):
    """Host-computed ranks (native evio) must reproduce the in-graph path."""
    from eventad_tpu import native
    pos, valid = make_events(rng, 300, w=16, h=12, t_max=20_000)
    kw = dict(radius=3, delta_t_us=8_000, max_neighbors=8,
              max_queue_size=4)
    ranks = native.queue_ranks(pos[:, 0], pos[:, 1], 16, 12)
    a = build_graph(jnp.asarray(pos)[None], jnp.asarray(valid)[None],
                    lookback=300, chunk=64, **kw)
    b = build_graph(jnp.asarray(pos)[None], jnp.asarray(valid)[None],
                    jnp.asarray(ranks)[None], lookback=300, chunk=64, **kw)
    assert (np.asarray(a[1]) == np.asarray(b[1])).all()
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()

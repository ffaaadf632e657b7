"""Host-precomputed pooled-position tables vs the device scatter path.

The tables (data/pool_tables.py) must reproduce pool_graph's internal
position sums/counts exactly — on CPU the XLA scatter accumulates in index
(= event) order, the same order numpy's ``np.add.at`` uses, so the
comparison is bitwise.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from eventad_tpu.data.pool_tables import (batch_pool_tables,
                                          item_pool_tables,
                                          item_pool_tables_np, table_slices)
from eventad_tpu.ops.pooling import pool_graph


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _events(rng, b=2, n=600, w=64, h=48, tw=100_000):
    x = rng.randint(0, w, (b, n)).astype(np.int32)
    y = rng.randint(0, h, (b, n)).astype(np.int32)
    t = np.sort(rng.randint(0, tw, (b, n)), axis=1).astype(np.int32)
    pos = np.stack([x, y, t], axis=-1)
    valid = rng.rand(b, n) > 0.1
    return pos, valid


def _local_nbr(posn, batch, node_mask, k=6):
    n = posn.shape[0]
    nbr = np.zeros((n, k), np.int32)
    mask = np.zeros((n, k), bool)
    for i in range(n):
        same = np.where((batch == batch[i])
                        & (np.abs(posn[:, 0] - posn[i, 0]) < 0.05)
                        & (np.abs(posn[:, 1] - posn[i, 1]) < 0.05)
                        & node_mask)[0]
        sel = same[:k]
        nbr[i, :len(sel)] = sel
        mask[i, :len(sel)] = node_mask[i]
    return nbr, mask


def test_host_table_cascade_matches_scatter(rng):
    """pool_graph(host_table) == pool_graph(scatter) bitwise, cascaded
    through two pooled levels like backbone_forward."""
    b, w, h, tw = 2, 64, 48, 100_000
    grids = [(8, 6), (4, 3)]
    pos_int, valid = _events(rng, b=b, w=w, h=h, tw=tw)
    n = pos_int.shape[1]

    tables = batch_pool_tables(pos_int, valid, grids, w, h, tw)
    sl = table_slices(grids)

    denom = np.array([w, h, tw], np.float32)
    posn = (pos_int.astype(np.float32) / denom).reshape(b * n, 3)
    batch_ids = np.repeat(np.arange(b, dtype=np.int32), n)
    node_mask = valid.reshape(b * n)
    x = rng.randn(b * n, 5).astype(np.float32)

    g = None
    for li, grid in enumerate(grids):
        if g is None:
            cx, cp, cm, cb = x, posn, node_mask, batch_ids
        else:
            cx, cp, cm, cb = (np.asarray(g.x), np.asarray(g.pos),
                              np.asarray(g.node_mask), np.asarray(g.batch))
        nbr, mask = _local_nbr(cp, cb, cm)
        lo, hi = sl[li]
        ht = jnp.asarray(tables[:, lo:hi].reshape(-1, 4))
        args = (jnp.asarray(cx), jnp.asarray(cp), jnp.asarray(nbr),
                jnp.asarray(mask), jnp.asarray(cm), jnp.asarray(cb))
        kw = dict(grid=grid, batch_size=b, width=w, height=h, aggr="max",
                  span=2)
        g_scatter = pool_graph(*args, **kw)
        g_table = pool_graph(*args, host_table=ht, **kw)
        for name in ("x", "pos", "nbr", "nbr_mask", "node_mask", "batch"):
            a = np.asarray(getattr(g_scatter, name))
            bb = np.asarray(getattr(g_table, name))
            np.testing.assert_array_equal(a, bb, err_msg=f"L{li+1}.{name}")
        g = g_table


def test_item_tables_match_direct_accumulation(rng):
    """Level-1 table columns equal a direct masked accumulation."""
    w, h, tw = 64, 48, 100_000
    pos_int, valid = _events(rng, b=1, w=w, h=h, tw=tw)
    grids = [(8, 6)]
    tab = item_pool_tables(pos_int[0], valid[0], grids, w, h, tw)[0]
    denom = np.array([w, h, tw], np.float32)
    posn = (pos_int[0].astype(np.float32) / denom)[valid[0]]
    nx, ny = grids[0]
    pc = np.clip(posn, 0.0, np.float32(0.9999999))
    cell = (np.floor(pc[:, 1] * ny).astype(int) * nx
            + np.floor(pc[:, 0] * nx).astype(int))
    for c in range(nx * ny):
        m = cell == c
        np.testing.assert_allclose(tab[c, 3], m.sum())
        if m.any():
            np.testing.assert_allclose(tab[c, :3], posn[m].sum(0),
                                       rtol=1e-6)


def test_native_matches_numpy_oracle(rng):
    """evio.cpp pool_tables == the numpy oracle bitwise (same f32 ops in
    the same event order)."""
    from eventad_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    w, h, tw = 360, 240, 1_000_000
    grids = [(56, 40), (28, 20), (14, 10), (7, 5)]
    pos_int, valid = _events(rng, b=1, n=5000, w=w, h=h, tw=tw)
    a = item_pool_tables(pos_int[0], valid[0], grids, w, h, tw)
    b = item_pool_tables_np(pos_int[0], valid[0], grids, w, h, tw)
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(la, lb)


def test_table_slices():
    grids = [(8, 6), (4, 3), (2, 2)]
    sl = table_slices(grids)
    assert sl == [(0, 48), (48, 60), (60, 64)]

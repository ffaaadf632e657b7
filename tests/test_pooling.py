"""Pooling vs a naive simulation of the reference grid_cluster pipeline."""
import numpy as np
import jax.numpy as jnp

from eventad_tpu.ops.pooling import pool_graph


def naive_pool(x, pos, nbr, mask, node_mask, batch, grid, bsz, w, h, aggr,
               keep_temporal_ordering=False):
    """Mirror of reference pooling.py:51-97 on (nbr, mask) edge tables."""
    nx, ny = grid
    ncells = nx * ny
    m = bsz * ncells
    pc = np.clip(pos, 0.0, 0.9999999)
    ix = np.floor(pc[:, 0] * nx).astype(int)
    iy = np.floor(pc[:, 1] * ny).astype(int)
    cell = batch * ncells + iy * nx + ix

    out_x = np.zeros((m, x.shape[1]), np.float32)
    out_pos = np.zeros((m, 3), np.float32)
    active = np.zeros(m, bool)
    tmax = np.full(m, -np.inf)
    for c in range(m):
        members = np.where((cell == c) & node_mask)[0]
        if len(members) == 0:
            continue
        active[c] = True
        if aggr == "max":
            out_x[c] = x[members].max(0)
        else:
            out_x[c] = x[members].mean(0)
        p = pos[members].mean(0)
        p[0] = np.floor((p[0] + 1e-5) * w) / w
        p[1] = np.floor((p[1] + 1e-5) * h) / h
        out_pos[c] = p
        tmax[c] = pos[members, 2].max()

    edges = set()
    n = x.shape[0]
    for i in range(n):
        if not node_mask[i]:
            continue
        for k in range(nbr.shape[1]):
            if not mask[i, k]:
                continue
            s, d = cell[nbr[i, k]], cell[i]
            if s == d:
                continue
            if keep_temporal_ordering and not (tmax[d] > tmax[s]):
                continue
            edges.add((s, d))
    return out_x, out_pos, active, edges


def _random_graph(rng, n=200, bsz=2):
    x = rng.randn(n, 5).astype(np.float32)
    pos = rng.rand(n, 3).astype(np.float32)
    batch = (rng.rand(n) * bsz).astype(np.int32)
    node_mask = rng.rand(n) > 0.15
    # local edges only (within what a radius graph would produce)
    nbr = np.zeros((n, 6), np.int32)
    mask = np.zeros((n, 6), bool)
    for i in range(n):
        same = np.where(
            (batch == batch[i])
            & (np.abs(pos[:, 0] - pos[i, 0]) < 0.1)
            & (np.abs(pos[:, 1] - pos[i, 1]) < 0.1)
            & node_mask)[0]
        sel = same[:6]
        nbr[i, :len(sel)] = sel
        mask[i, :len(sel)] = node_mask[i]
    return x, pos, nbr, mask, node_mask, batch


def test_pool_matches_naive(rng):
    x, pos, nbr, mask, node_mask, batch = _random_graph(rng)
    grid, bsz, w, h = (8, 6), 2, 64, 48
    for aggr in ("max", "mean"):
        g = pool_graph(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(nbr),
                       jnp.asarray(mask), jnp.asarray(node_mask),
                       jnp.asarray(batch), grid=grid, batch_size=bsz,
                       width=w, height=h, aggr=aggr, span=2)
        ex, ep, ea, eedges = naive_pool(x, pos, nbr, mask, node_mask, batch,
                                        grid, bsz, w, h, aggr)
        assert (np.asarray(g.node_mask) == ea).all()
        np.testing.assert_allclose(np.asarray(g.x), ex, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g.pos), ep, rtol=1e-5,
                                   atol=1e-5)
        got_edges = set()
        gn, gm = np.asarray(g.nbr), np.asarray(g.nbr_mask)
        for d in range(gn.shape[0]):
            for s in gn[d][gm[d]]:
                got_edges.add((int(s), d))
        assert got_edges == eedges


def test_pool_temporal_ordering(rng):
    x, pos, nbr, mask, node_mask, batch = _random_graph(rng)
    grid, bsz, w, h = (8, 6), 2, 64, 48
    g = pool_graph(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(nbr),
                   jnp.asarray(mask), jnp.asarray(node_mask),
                   jnp.asarray(batch), grid=grid, batch_size=bsz, width=w,
                   height=h, aggr="max", span=2, keep_temporal_ordering=True)
    _, _, _, eedges = naive_pool(x, pos, nbr, mask, node_mask, batch, grid,
                                 bsz, w, h, "max", keep_temporal_ordering=True)
    got = set()
    gn, gm = np.asarray(g.nbr), np.asarray(g.nbr_mask)
    for d in range(gn.shape[0]):
        for s in gn[d][gm[d]]:
            got.add((int(s), d))
    assert got == eedges


def test_neighbor_rows_matches_gather(rng):
    """Dense-shift neighbour access == src[nbr] at every masked slot, for a
    real pool_graph output (the arithmetic-offset contract of the pooled
    neighbour table)."""
    from eventad_tpu.models.graph import neighbor_rows

    x, pos, nbr, mask, node_mask, batch = _random_graph(rng)
    grid, bsz, w, h = (8, 6), 2, 64, 48
    g = pool_graph(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(nbr),
                   jnp.asarray(mask), jnp.asarray(node_mask),
                   jnp.asarray(batch), grid=grid, batch_size=bsz,
                   width=w, height=h, aggr="max", span=2)
    src = jnp.concatenate([g.pos[:, :2], g.x], axis=1)
    gathered = np.asarray(src[g.nbr])                 # [M, S, C]
    shifted = np.asarray(neighbor_rows(src, grid, bsz, span=2))
    m = np.asarray(g.nbr_mask)
    np.testing.assert_array_equal(shifted[m], gathered[m])


def test_pool_inactive_cells_zero(rng):
    x, pos, nbr, mask, node_mask, batch = _random_graph(rng, n=20)
    g = pool_graph(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(nbr),
                   jnp.asarray(mask), jnp.asarray(node_mask),
                   jnp.asarray(batch), grid=(16, 12), batch_size=2, width=64,
                   height=48, aggr="max", span=2)
    inact = ~np.asarray(g.node_mask)
    assert (np.asarray(g.x)[inact] == 0).all()
    assert (~np.asarray(g.nbr_mask)[inact]).all()

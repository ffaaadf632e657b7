"""Spline conv: basis decomposition == per-edge formulation == LUT path."""
import jax
import jax.numpy as jnp
import numpy as np

from eventad_tpu.ops.spline import spline_basis, build_lut
from eventad_tpu.ops.spline_conv import (
    SplineConvParams, init_spline_conv, spline_conv, spline_conv_reference,
    cartesian_attr)


def _random_graph(rng, n=64, k=8, cin=7, cout=5):
    nbr = rng.randint(0, n, size=(n, k)).astype(np.int32)
    mask = rng.rand(n, k) > 0.3
    x = rng.randn(n, cin).astype(np.float32)
    attr = rng.rand(n, k, 2).astype(np.float32)
    params = init_spline_conv(jax.random.PRNGKey(0), cin, cout, 5, bias=True)
    params = SplineConvParams(params.weight, params.root,
                              jnp.asarray(rng.randn(cout), jnp.float32))
    return (jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(mask),
            jnp.asarray(attr), params)


def test_basis_partition_of_unity(rng):
    attr = jnp.asarray(rng.rand(100, 2).astype(np.float32))
    w, idx = spline_basis(attr, 5)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    assert int(idx.min()) >= 0 and int(idx.max()) < 25


def test_conv_matches_per_edge(rng):
    x, nbr, mask, attr, params = _random_graph(rng)
    for aggr in ("sum", "mean"):
        a = spline_conv(x, nbr, mask, attr, params, kernel_size=5, aggr=aggr)
        b = spline_conv_reference(x, nbr, mask, attr, params, kernel_size=5,
                                  aggr=aggr)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_conv_matches_lut_on_quantized_offsets(rng):
    """On integer pixel offsets, direct basis conv == tabulated LUT conv
    (the reference's init_lut/message_lut fast path, spline_conv.py:16-47)."""
    n, k, cin, cout, ks = 40, 6, 3, 4, 5
    w_img, h_img = 64, 48
    rx = ry = 4
    mx = 2 * float(int(0.01 * w_img + 2)) / w_img  # reference dagr.py:37
    my = mx
    dx = rng.randint(-rx, rx + 1, size=(n, k))
    dy = rng.randint(-ry, ry + 1, size=(n, k))
    attr = np.stack([dx / (2 * mx * w_img) + 0.5,
                     dy / (2 * my * h_img) + 0.5], axis=-1).astype(np.float32)
    nbr = rng.randint(0, n, size=(n, k)).astype(np.int32)
    mask = np.ones((n, k), dtype=bool)
    x = rng.randn(n, cin).astype(np.float32)
    params = init_spline_conv(jax.random.PRNGKey(1), cin, cout, ks)

    out = spline_conv(jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(mask),
                      jnp.asarray(attr), params, kernel_size=ks)

    lut = build_lut(params.weight, ks, rx, ry, mx, my, w_img, h_img)
    kern = np.asarray(lut)[dx + rx, dy + ry]              # [N, K, Ci, Co]
    msg = np.einsum("nkio,nki->nko", kern, x[np.asarray(nbr)])
    expect = msg.sum(1) + x @ np.asarray(params.root)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_cartesian_attr():
    pos = jnp.asarray([[0.5, 0.5, 0.0], [0.6, 0.4, 0.0]], jnp.float32)
    nbr = jnp.asarray([[1], [0]], jnp.int32)
    mask = jnp.ones((2, 1), dtype=bool)
    attr = cartesian_attr(pos, nbr, mask, max_value=0.2)
    # edge 0<-1: pos[0]-pos[1] = (-0.1, 0.1) -> /0.4 + 0.5 = (0.25, 0.75)
    np.testing.assert_allclose(np.asarray(attr[0, 0]), [0.25, 0.75],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(attr[1, 0]), [0.75, 0.25],
                               atol=1e-6)


def test_conv_attr_range_restriction(rng):
    """The static tap-range restriction (attr_range) is exact: attrs drawn
    from a narrow band around 0.5 give identical outputs with the 5x5 kernel
    contraction restricted to the implied sub-rectangle."""
    from eventad_tpu.ops.spline_conv import tap_ranges
    n, k, cin, cout = 64, 8, 7, 5
    span = (0.2, 0.3)     # dagr-S level-0 spans: radius 4px, cart_max 1/36
    attr_range = ((0.5 - span[0], 0.5 + span[0]),
                  (0.5 - span[1], 0.5 + span[1]))
    assert tap_ranges(5, attr_range) == ((1, 3), (0, 4))
    nbr = jnp.asarray(rng.randint(0, n, size=(n, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    x = jnp.asarray(rng.randn(n, cin).astype(np.float32))
    attr = jnp.asarray(
        (0.5 + (rng.rand(n, k, 2) * 2 - 1) * np.array(span))
        .astype(np.float32))
    params = init_spline_conv(jax.random.PRNGKey(2), cin, cout, 5, bias=True)
    for aggr in ("sum", "mean"):
        full = spline_conv(x, nbr, mask, attr, params, kernel_size=5,
                           aggr=aggr)
        ranged = spline_conv(x, nbr, mask, attr, params, kernel_size=5,
                             aggr=aggr, attr_range=attr_range)
        np.testing.assert_allclose(np.asarray(ranged), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)


def test_conv_self_edge_fold(rng):
    """Dropping the slot-0 self edge (attr exactly 0.5) and folding the
    center kernel into the root matmul reproduces the full conv."""
    n, k, cin, cout = 64, 8, 7, 7
    nbr = rng.randint(0, n, size=(n, k)).astype(np.int32)
    nbr[:, 0] = np.arange(n)                       # slot 0 = self
    mask = rng.rand(n, k) > 0.3
    node_mask = mask[:, 0].copy()                  # self mask == row mask
    attr = rng.rand(n, k, 2).astype(np.float32)
    attr[:, 0] = 0.5
    x = rng.randn(n, cin).astype(np.float32)
    params = init_spline_conv(jax.random.PRNGKey(3), cin, cout, 5, bias=True)
    x, nbr, mask, attr = map(jnp.asarray, (x, nbr, mask, attr))
    nm = jnp.asarray(node_mask)
    full = spline_conv(x, nbr, mask, attr, params, kernel_size=5,
                       aggr="sum", node_mask=nm)
    folded = spline_conv(x, nbr[:, 1:], mask[:, 1:], attr[:, 1:], params,
                         kernel_size=5, aggr="sum", node_mask=nm,
                         add_center_to_root=True)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_conv_zero_when_masked(rng):
    x, nbr, mask, attr, params = _random_graph(rng)
    node_mask = jnp.asarray(rng.rand(x.shape[0]) > 0.5)
    out = spline_conv(x, nbr, mask, attr, params, kernel_size=5,
                      node_mask=node_mask)
    assert (np.asarray(out)[~np.asarray(node_mask)] == 0).all()

"""Shift-sliced pooled-level fused conv vs the XLA spline_conv oracle.

Builds a pooled-like graph exactly the way ops/pooling.pool_graph does
(arithmetic +-span cell slots, pixel-rounded mean positions confined to
their cell) and checks the Pallas kernel (interpret mode) against
ops/spline_conv.spline_conv plus the XLA epilogue."""
import numpy as np
import pytest

import jax.numpy as jnp

from eventad_tpu.ops.spline_conv import SplineConvParams, spline_conv
from eventad_tpu.ops.spline_shift import (prepare_shift, shift_spline_conv,
                                          tap_windows)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _pooled_graph(rng, *, nx, ny, bsz, span, width, height,
                  adversarial=False):
    """Cell table + arithmetic slots + pixel-rounded mean positions."""
    side = 2 * span + 1
    ncells = nx * ny
    m = bsz * ncells
    active = rng.rand(m) > 0.25
    cx = np.arange(m) % nx
    cy = (np.arange(m) // nx) % ny
    cb = np.arange(m) // ncells
    if adversarial:
        # positions at the extreme corners of each cell (worst case for
        # the static tap windows): cell_lo (floor rounding can dip 1px
        # below) or just under cell_hi
        pick = rng.rand(m) > 0.5
        px = np.where(pick, cx / nx, (cx + 1) / nx - 1e-7)
        py = np.where(pick, cy / ny, (cy + 1) / ny - 1e-7)
    else:
        px = (cx + rng.rand(m)) / nx
        py = (cy + rng.rand(m)) / ny
    # pooling.py:47-49 pixel rounding
    px = np.floor((px + 1e-5) * width) / width
    py = np.floor((py + 1e-5) * height) / height
    pos = np.stack([px, py], 1).astype(np.float32)

    offs = np.arange(side * side)
    ox = offs % side - span
    oy = offs // side - span
    nxs = cx[:, None] + ox[None, :]
    nys = cy[:, None] + oy[None, :]
    in_fov = (nxs >= 0) & (nxs < nx) & (nys >= 0) & (nys < ny)
    nbr = (cb[:, None] * ncells + np.clip(nys, 0, ny - 1) * nx
           + np.clip(nxs, 0, nx - 1)).astype(np.int32)
    not_self = (ox != 0) | (oy != 0)
    mask = in_fov & not_self[None, :] & active[:, None] & active[nbr]
    # random edge dropout (bitmap sparsity)
    mask &= rng.rand(m, side * side) > 0.3
    nbr = np.where(mask, nbr, 0)
    return pos, nbr.astype(np.int32), mask, active


def _case(rng, *, nx=14, ny=10, bsz=2, span=2, cin=21, cout=16, ks=5,
          width=112, height=80, act="elu", skip=False, block=128,
          adversarial=False, tol=2e-2):
    side = 2 * span + 1
    cart_max = 2.0 * max(1.0 / nx, 1.0 / ny)
    pos, nbr, mask, active = _pooled_graph(
        rng, nx=nx, ny=ny, bsz=bsz, span=span, width=width, height=height,
        adversarial=adversarial)
    m = pos.shape[0]
    x = (rng.randn(m, cin) * active[:, None]).astype(np.float32)
    attr = ((pos[:, None, :] - pos[nbr]) / (2 * cart_max) + 0.5)
    attr = np.where(mask[..., None], np.clip(attr, 0.0, 1.0), 0.5) \
        .astype(np.float32)
    w = (rng.randn(ks * ks, cin, cout) / np.sqrt(cin * 4)).astype(np.float32)
    r = (rng.randn(cin, cout) / np.sqrt(cin)).astype(np.float32)
    a = (rng.rand(cout) + 0.5).astype(np.float32)
    b = (rng.randn(cout) * 0.1).astype(np.float32)

    conv = spline_conv(jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(mask),
                       jnp.asarray(attr),
                       SplineConvParams(jnp.asarray(w), jnp.asarray(r), None),
                       kernel_size=ks, aggr="sum",
                       node_mask=jnp.asarray(active))
    pre = np.asarray(conv) * a + b
    skip_arg = None
    if skip:
        sk = (rng.randn(cin, cout) / np.sqrt(cin)).astype(np.float32)
        a_s = (rng.rand(cout) + 0.5).astype(np.float32)
        b_s = (rng.randn(cout) * 0.1).astype(np.float32)
        pre = pre + (x @ sk) * a_s + b_s
        skip_arg = (jnp.asarray(x), jnp.asarray(sk), jnp.asarray(a_s),
                    jnp.asarray(b_s))
    ref = np.where(pre > 0, pre, np.expm1(pre)) if act == "elu" \
        else np.maximum(pre, 0.0)
    ref = ref * active[:, None]

    u = np.clip(attr, 0, 1) * (ks - 1)
    prep = prepare_shift(jnp.asarray(u), jnp.asarray(mask),
                         jnp.asarray(active), grid=(nx, ny), span=span,
                         cart_max=cart_max, width=width, height=height,
                         kernel_size=ks, block=block)
    out = shift_spline_conv(
        jnp.asarray(x), prep, jnp.asarray(w), jnp.asarray(r),
        jnp.asarray(a), jnp.asarray(b), kernel_size=ks, act=act,
        skip=skip_arg, interpret=True)
    sc = np.abs(ref).max() + 1e-6
    diff = np.abs(np.asarray(out, np.float32) - ref).max() / sc
    assert diff < tol, f"shift kernel diverges: rel {diff}"


def test_tap_windows_cover_all_attrs(rng):
    """Every valid edge's basis taps lie inside the static per-slot window
    (the soundness condition of the pruned z-contraction), including for
    positions at the extreme cell corners."""
    nx, ny, span, ks, width, height = 14, 10, 2, 5, 112, 80
    cart_max = 2.0 * max(1.0 / nx, 1.0 / ny)
    for adv in (False, True):
        pos, nbr, mask, active = _pooled_graph(
            rng, nx=nx, ny=ny, bsz=2, span=span, width=width, height=height,
            adversarial=adv)
        attr = ((pos[:, None, :] - pos[nbr]) / (2 * cart_max) + 0.5)
        u = np.clip(np.where(mask[..., None], attr, 0.5), 0, 1) * (ks - 1)
        wins = tap_windows((nx, ny), span, cart_max, width, height, ks)
        i0 = np.clip(np.floor(u).astype(int), 0, ks - 2)
        for k, ((xl, xh), (yl, yh)) in enumerate(wins):
            mk = mask[:, k]
            if not mk.any():
                continue
            assert i0[mk, k, 0].min() >= xl and i0[mk, k, 0].max() + 1 <= xh
            assert i0[mk, k, 1].min() >= yl and i0[mk, k, 1].max() + 1 <= yh


def test_shift_conv_block1(rng):
    _case(rng, act="elu")


def test_shift_conv_skip_relu(rng):
    _case(rng, act="relu", skip=True)


def test_shift_conv_block256_small_grid(rng):
    """Level-4-like tiny grid where n < block (single padded block)."""
    _case(rng, nx=7, ny=5, bsz=2, block=256, act="elu", skip=True)


def test_shift_conv_adversarial_corners(rng):
    _case(rng, adversarial=True, act="elu", skip=True)

"""Fused spline-conv Pallas kernel vs the XLA formulation (interpret mode).

The kernel is bf16 (production inference path); comparisons are against the
float32 XLA path with bf16-grade tolerances (inputs and the z operand of the
final matmul are bf16-quantized in the kernel).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventad_tpu.ops.spline_conv import (SplineConvParams, spline_conv,
                                         tap_ranges)
from eventad_tpu.ops.spline_fused import fused_spline_conv


def _window_graph(rng, n, k, lookback, lookahead=0):
    """Neighbour table obeying the window contract."""
    lo = np.maximum(np.arange(n)[:, None] - lookback, 0)
    hi = np.minimum(np.arange(n)[:, None] + lookahead, n - 1)
    u = rng.rand(n, k)
    nbr = (lo + np.round(u * (hi - lo))).astype(np.int32)
    mask = rng.rand(n, k) > 0.25
    return nbr, mask


def _compare(rng, *, n, k, cin, cout, span, lookback, lookahead=0,
             tol=3e-2):
    ks = 5
    attr_range = ((0.5 - span[0], 0.5 + span[0]),
                  (0.5 - span[1], 0.5 + span[1]))
    ranges = tap_ranges(ks, attr_range)
    nbr, mask = _window_graph(rng, n, k, lookback, lookahead)
    x = rng.randn(n, cin).astype(np.float32)
    attr = (0.5 + (rng.rand(n, k, 2) * 2 - 1) * np.array(span)) \
        .astype(np.float32)
    w = (rng.randn(ks * ks, cin, cout) * (1.0 / np.sqrt(cin * 4))) \
        .astype(np.float32)
    params = SplineConvParams(jnp.asarray(w), None, None)

    ref = spline_conv(jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(mask),
                      jnp.asarray(attr), params, kernel_size=ks,
                      aggr="sum", attr_range=attr_range)

    u = np.clip(attr, 0, 1) * (ks - 1)
    got = fused_spline_conv(
        jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(nbr),
        jnp.asarray(mask), jnp.asarray(u), jnp.asarray(w),
        kernel_size=ks, ranges=ranges, lookback=lookback,
        lookahead=lookahead, interpret=True)

    ref = np.asarray(ref)
    got = np.asarray(got)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < tol, \
        f"max rel diff {np.abs(got - ref).max() / scale}"


def test_fused_level0_shape(rng):
    """Level-0 operating point: K=15 (self folded out), 3x5 tap range."""
    _compare(rng, n=512, k=15, cin=19, cout=16, span=(0.2, 0.3),
             lookback=256)


def test_fused_full_kernel_range(rng):
    """Full 5x5 taps (pooled-level shape), q=1 packing, with lookahead."""
    _compare(rng, n=256, k=25, cin=82, cout=64, span=(0.5, 0.5),
             lookback=128, lookahead=128)


def test_fused_q8_packing(rng):
    """unit=16 -> 8 destinations per vreg row (level-0 block 2 shape)."""
    _compare(rng, n=384, k=15, cin=16, cout=16, span=(0.2, 0.3),
             lookback=128)


def test_fused_ragged_tail(rng):
    """n not a multiple of the block size."""
    _compare(rng, n=300, k=7, cin=12, cout=8, span=(0.3, 0.3),
             lookback=128)


def test_fused_all_masked_rows(rng):
    """Rows whose slots are all masked produce exactly zero."""
    n, k, cin, cout, ks = 256, 15, 19, 16, 5
    span = (0.2, 0.3)
    ranges = tap_ranges(5, ((0.5 - span[0], 0.5 + span[0]),
                            (0.5 - span[1], 0.5 + span[1])))
    nbr, mask = _window_graph(rng, n, k, 128)
    mask[n // 2:] = False
    x = rng.randn(n, cin).astype(np.float32)
    u = (np.clip(0.5 + (rng.rand(n, k, 2) * 2 - 1) * np.array(span), 0, 1)
         * (ks - 1)).astype(np.float32)
    w = rng.randn(ks * ks, cin, cout).astype(np.float32)
    out = fused_spline_conv(
        jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(nbr),
        jnp.asarray(mask), jnp.asarray(u), jnp.asarray(w),
        kernel_size=ks, ranges=ranges, lookback=128, interpret=True)
    assert (np.asarray(out)[n // 2:] == 0).all()


def _two_block_case(rng, *, block, act, n=300, tol=1e-2, epilogue=False):
    """fused_two_block_prepared vs the XLA block1->BN->act->block2 chain."""
    from eventad_tpu.ops.spline_fused import (fused_two_block_prepared,
                                              prepare_fused)
    n_, k, cin, c1, c2, ks, lookback = n, 15, 19, 16, 16, 5, 128
    span = (0.2, 0.3)
    attr_range = ((0.5 - span[0], 0.5 + span[0]),
                  (0.5 - span[1], 0.5 + span[1]))
    ranges = tap_ranges(ks, attr_range)
    nbr, mask = _window_graph(rng, n_, k, lookback)
    node_mask = rng.rand(n_) > 0.1
    x = rng.randn(n_, cin).astype(np.float32)
    attr = (0.5 + (rng.rand(n_, k, 2) * 2 - 1) * np.array(span)) \
        .astype(np.float32)
    w1 = (rng.randn(ks * ks, cin, c1) / np.sqrt(cin * 4)).astype(np.float32)
    w2 = (rng.randn(ks * ks, c1, c2) / np.sqrt(c1 * 4)).astype(np.float32)
    r1 = (rng.randn(cin, c1) / np.sqrt(cin)).astype(np.float32)
    r2 = (rng.randn(c1, c2) / np.sqrt(c1)).astype(np.float32)
    a = (rng.rand(c1) + 0.5).astype(np.float32)
    b = (rng.randn(c1) * 0.1).astype(np.float32)

    p1 = SplineConvParams(jnp.asarray(w1), jnp.asarray(r1), None)
    p2 = SplineConvParams(jnp.asarray(w2), jnp.asarray(r2), None)
    conv1 = spline_conv(jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(mask),
                        jnp.asarray(attr), p1, kernel_size=ks, aggr="sum",
                        attr_range=attr_range,
                        node_mask=jnp.asarray(node_mask))
    pre = np.asarray(conv1) * a + b
    if act == "relu":
        h_ref = np.maximum(pre, 0.0)
    else:
        h_ref = np.where(pre > 0, pre, np.expm1(pre))
    h_ref = (h_ref * node_mask[:, None]).astype(np.float32)
    out_ref = np.asarray(spline_conv(
        jnp.asarray(h_ref), jnp.asarray(nbr), jnp.asarray(mask),
        jnp.asarray(attr), p2, kernel_size=ks, aggr="sum",
        attr_range=attr_range))

    u = np.clip(attr, 0, 1) * (ks - 1)
    prep = prepare_fused(jnp.asarray(nbr), jnp.asarray(mask),
                         jnp.asarray(u), lookback=lookback, lookahead=0,
                         block=block)
    epi = None
    if epilogue:
        # full layer tail: BN2 + linear-skip + skip-BN + act + mask
        sk = (rng.randn(cin, c2) / np.sqrt(cin)).astype(np.float32)
        a2 = (rng.rand(c2) + 0.5).astype(np.float32)
        b2 = (rng.randn(c2) * 0.1).astype(np.float32)
        a_s = (rng.rand(c2) + 0.5).astype(np.float32)
        b_s = (rng.randn(c2) * 0.1).astype(np.float32)
        epi = tuple(jnp.asarray(v) for v in (sk, a2, b2, a_s, b_s))
        pre2 = out_ref * a2 + b2 + (x @ sk) * a_s + b_s
        if act == "relu":
            out_ref = np.maximum(pre2, 0.0)
        else:
            out_ref = np.where(pre2 > 0, pre2, np.expm1(pre2))
        out_ref = out_ref * node_mask[:, None]
    out2, h = fused_two_block_prepared(
        jnp.asarray(x).astype(jnp.bfloat16), prep, jnp.asarray(w1),
        jnp.asarray(r1), jnp.asarray(a), jnp.asarray(b), jnp.asarray(w2),
        jnp.asarray(r2), jnp.asarray(node_mask), kernel_size=ks,
        ranges=ranges, act=act, epilogue=epi, interpret=True)
    hs = np.abs(h_ref).max() + 1e-6
    osc = np.abs(out_ref).max() + 1e-6
    assert np.abs(np.asarray(h) - h_ref).max() / hs < tol
    assert np.abs(np.asarray(out2, dtype=np.float32) - out_ref).max() \
        / osc < tol


def test_two_block_t128_relu(rng):
    _two_block_case(rng, block=128, act="relu")


def test_two_block_t256_elu(rng):
    """Two own chunks per block (t=256) + non-relu activation."""
    _two_block_case(rng, block=256, act="elu")


def test_two_block_epilogue(rng):
    """In-kernel layer tail (BN2 + linear skip + skip-BN + act + mask)."""
    _two_block_case(rng, block=256, act="elu", epilogue=True, tol=2e-2)

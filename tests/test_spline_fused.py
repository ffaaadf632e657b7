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

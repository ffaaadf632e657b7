#!/usr/bin/env python
"""Micro-benchmark: fused spline-conv kernel vs the XLA formulation, per
backbone level shape. Pipelined device timing (enqueue N, fetch one scalar).

Usage: python tools/bench_fused.py [level0|level1|all] [block]
(``block`` = fused-kernel destination block width, default 128)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np

from eventad_tpu.ops.spline_conv import (SplineConvParams, spline_conv,
                                         tap_ranges)
from eventad_tpu.ops.spline_fused import fused_spline_conv


def bench(fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    for _ in range(3):
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def run_case(name, *, n, k, cin, cout, span, lookback, lookahead=0,
             span_frac=0.15, seed=0, block=128):
    """span_frac: typical true neighbour span as a fraction of lookback
    (drives the per-block nsub bound, like delta_t-bounded streams)."""
    rng = np.random.RandomState(seed)
    ks = 5
    attr_range = ((0.5 - span[0], 0.5 + span[0]),
                  (0.5 - span[1], 0.5 + span[1]))
    ranges = tap_ranges(ks, attr_range)
    true_span = max(int(lookback * span_frac), 1)
    lo = np.maximum(np.arange(n)[:, None] - true_span, 0)
    hi = np.minimum(np.arange(n)[:, None] + lookahead, n - 1)
    nbr = (lo + np.round(rng.rand(n, k) * (hi - lo))).astype(np.int32)
    mask = rng.rand(n, k) > 0.15
    x = rng.randn(n, cin).astype(np.float32)
    attr = (0.5 + (rng.rand(n, k, 2) * 2 - 1) * np.array(span)) \
        .astype(np.float32)
    w = rng.randn(ks * ks, cin, cout).astype(np.float32) * 0.05
    params = SplineConvParams(jnp.asarray(w).astype(jnp.bfloat16), None,
                              None)
    xj = jnp.asarray(x).astype(jnp.bfloat16)
    nbrj, maskj = jnp.asarray(nbr), jnp.asarray(mask)
    attrj = jnp.asarray(attr)
    u = jnp.clip(attrj, 0, 1) * (ks - 1)
    wj = jnp.asarray(w)

    def xla_path(xx):
        return spline_conv(xx, nbrj, maskj, attrj.astype(jnp.bfloat16),
                           params, kernel_size=ks, aggr="sum",
                           attr_range=attr_range).sum()

    def fused_path(xx):
        return fused_spline_conv(xx, nbrj, maskj, u, wj, kernel_size=ks,
                                 ranges=ranges, lookback=lookback,
                                 lookahead=lookahead, block=block).sum()

    ms_x = bench(xla_path, xj)
    ms_f = bench(fused_path, xj)
    print(f"{name:28s} xla {ms_x:7.3f} ms   fused {ms_f:7.3f} ms   "
          f"({ms_x / ms_f:4.2f}x)")


def run_two_block(name, *, n, k, cin, c1, c2, span, lookback,
                  span_frac=0.15, seed=0, block=128):
    """Two single-block fused kernels (+XLA BN/act glue) vs the two-block
    kernel at the level-0 operating point."""
    from eventad_tpu.ops.spline_fused import (fused_two_block_prepared,
                                              prepare_fused,
                                              fused_spline_conv_prepared)
    rng = np.random.RandomState(seed)
    ks = 5
    attr_range = ((0.5 - span[0], 0.5 + span[0]),
                  (0.5 - span[1], 0.5 + span[1]))
    ranges = tap_ranges(ks, attr_range)
    true_span = max(int(lookback * span_frac), 1)
    lo = np.maximum(np.arange(n)[:, None] - true_span, 0)
    nbr = (lo + np.round(rng.rand(n, k) * (np.arange(n)[:, None] - lo))) \
        .astype(np.int32)
    mask = rng.rand(n, k) > 0.15
    node_mask = rng.rand(n) > 0.05
    x = jnp.asarray(rng.randn(n, cin).astype(np.float32)) \
        .astype(jnp.bfloat16)
    attr = (0.5 + (rng.rand(n, k, 2) * 2 - 1) * np.array(span)) \
        .astype(np.float32)
    u = jnp.asarray(np.clip(attr, 0, 1) * (ks - 1))
    w1 = jnp.asarray((rng.randn(ks * ks, cin, c1) / np.sqrt(cin * 4))
                     .astype(np.float32))
    w2 = jnp.asarray((rng.randn(ks * ks, c1, c2) / np.sqrt(c1 * 4))
                     .astype(np.float32))
    r1 = jnp.asarray((rng.randn(cin, c1) / np.sqrt(cin)).astype(np.float32))
    r2 = jnp.asarray((rng.randn(c1, c2) / np.sqrt(c1)).astype(np.float32))
    a1 = jnp.asarray((rng.rand(c1) + 0.5).astype(np.float32))
    b1 = jnp.asarray((rng.randn(c1) * 0.1).astype(np.float32))
    nbrj, maskj, nm = (jnp.asarray(nbr), jnp.asarray(mask),
                       jnp.asarray(node_mask))

    def two_single(xx):
        prep = prepare_fused(nbrj, maskj, u, lookback=lookback, block=block)
        c = fused_spline_conv_prepared(xx, prep, w1, kernel_size=ks,
                                       ranges=ranges)
        h = c + (xx @ r1.astype(jnp.bfloat16)).astype(jnp.float32)
        h = jnp.maximum(h * a1 + b1, 0.0) * nm[:, None]
        h = h.astype(jnp.bfloat16)
        c2_ = fused_spline_conv_prepared(h, prep, w2, kernel_size=ks,
                                         ranges=ranges)
        return (c2_ + (h @ r2.astype(jnp.bfloat16)).astype(jnp.float32)) \
            .sum()

    def fused2(xx):
        prep = prepare_fused(nbrj, maskj, u, lookback=lookback, block=block)
        out, _ = fused_two_block_prepared(
            xx, prep, w1, r1, a1, b1, w2, r2, nm, kernel_size=ks,
            ranges=ranges, act="relu")
        return out.sum()

    ms_s = bench(two_single, x)
    ms_f = bench(fused2, x)
    print(f"{name:28s} 2x1blk {ms_s:7.3f} ms   2blk {ms_f:7.3f} ms   "
          f"({ms_s / ms_f:4.2f}x)")


def run_pooled_case(name, *, grid, cin, cout, span=2, seed=0, block=128):
    """Pooled-level conv at batch-1 streaming-read scale: XLA path with
    dense-shift neighbour rows (what the non-fused pooled path runs) vs the
    fused kernel with the grid window contract.  Decides whether the tiny
    upper levels (560/140/35 cells) should stay on the Pallas kernel or the
    plain XLA formulation in the streaming read."""
    from eventad_tpu.models.graph import neighbor_rows
    from eventad_tpu.ops.spline_fused import (fused_spline_conv_prepared,
                                              prepare_fused)
    rng = np.random.RandomState(seed)
    ks = 5
    nx, ny = grid
    n = nx * ny
    side = 2 * span + 1
    k = side * side
    ranges = ((0, ks - 1), (0, ks - 1))
    # arithmetic neighbour table of the grid (pool_graph's layout)
    cells = np.arange(n)
    cx, cy = cells % nx, cells // nx
    offs = np.arange(k)
    ox, oy = offs % side - span, offs // side - span
    nxs_, nys_ = cx[:, None] + ox[None], cy[:, None] + oy[None]
    in_fov = (nxs_ >= 0) & (nxs_ < nx) & (nys_ >= 0) & (nys_ < ny)
    nbr = (np.clip(nys_, 0, ny - 1) * nx
           + np.clip(nxs_, 0, nx - 1)).astype(np.int32)
    mask = in_fov & (rng.rand(n, k) > 0.3)
    x = jnp.asarray(rng.randn(n, cin).astype(np.float32)) \
        .astype(jnp.bfloat16)
    attr = (rng.rand(n, k, 2)).astype(np.float32)
    attrj = jnp.asarray(attr)
    u = attrj * (ks - 1)
    w = rng.randn(ks * ks, cin, cout).astype(np.float32) * 0.05
    params = SplineConvParams(jnp.asarray(w).astype(jnp.bfloat16), None,
                              None)
    nbrj, maskj = jnp.asarray(nbr), jnp.asarray(mask)
    halo = span * nx + span

    def xla_path(xx):
        xj = neighbor_rows(xx, grid, 1, span)
        return spline_conv(xx, nbrj, maskj, attrj.astype(jnp.bfloat16),
                           params, kernel_size=ks, aggr="sum",
                           x_j=xj).sum()

    def fused_path(xx):
        prep = prepare_fused(nbrj, maskj, u, lookback=halo, lookahead=halo,
                             block=min(block, -(-n // 128) * 128))
        return fused_spline_conv_prepared(xx, prep, jnp.asarray(w),
                                          kernel_size=ks,
                                          ranges=ranges).sum()

    ms_x = bench(xla_path, x)
    ms_f = bench(fused_path, x)
    print(f"{name:28s} xla {ms_x:7.3f} ms   fused {ms_f:7.3f} ms   "
          f"({ms_x / ms_f:4.2f}x)")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    blk = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    if which == "stream":
        # batch-1 pooled tables of the streaming read path
        run_pooled_case("s-l1 (2240,25,82,64)", grid=(56, 40), cin=82,
                        cout=64, block=blk)
        run_pooled_case("s-l2 (560,25,130,64)", grid=(28, 20), cin=130,
                        cout=64, block=blk)
        run_pooled_case("s-l3 (140,25,130,64)", grid=(14, 10), cin=130,
                        cout=64, block=blk)
        run_pooled_case("s-l4 (35,25,130,64)", grid=(7, 5), cin=130,
                        cout=64, block=blk)
        return
    if which in ("two", "all2"):
        run_two_block(f"level0 2blk (98k,15,19,16) t={blk}", n=98304, k=15,
                      cin=19, c1=16, c2=16, span=(0.2, 0.3), lookback=1024,
                      block=blk)
        return
    if which in ("level0", "all"):
        run_case(f"level0 block1 (98k,15,19,16) t={blk}", n=98304, k=15,
                 cin=19, cout=16, span=(0.2, 0.3), lookback=1024, block=blk)
        run_case(f"level0 block2 (98k,15,16,16) t={blk}", n=98304, k=15,
                 cin=16, cout=16, span=(0.2, 0.3), lookback=1024, block=blk)
    if which in ("level1", "all"):
        run_case(f"level1 block1 (13k,25,82,64) t={blk}", n=13440, k=25,
                 cin=82, cout=64, span=(0.5, 0.5), lookback=128,
                 lookahead=128, span_frac=1.0, block=blk)
        run_case(f"level1 block2 (13k,25,64,64) t={blk}", n=13440, k=25,
                 cin=64, cout=64, span=(0.5, 0.5), lookback=128,
                 lookahead=128, span_frac=1.0, block=blk)


if __name__ == "__main__":
    main()

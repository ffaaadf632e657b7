#!/usr/bin/env python
"""Micro-benchmark: windowed Pallas scatter-add (the gather_window VJP)
vs the XLA row scatter, at detector-training level-0 scale.

Usage: python tools/bench_scatter.py [block ...]
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

from eventad_tpu.ops.gather_window import scatter_window_rows


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


def run_case(name, *, n, k, c, lookback, span_frac=0.15, seed=0,
             blocks=(128, 256), parts=2):
    rng = np.random.RandomState(seed)
    true_span = max(int(lookback * span_frac), 1)
    lo = np.maximum(np.arange(n)[:, None] - true_span, 0)
    nbr = (lo + np.round(rng.rand(n, k) * (np.arange(n)[:, None] - lo))) \
        .astype(np.int32)
    mask = rng.rand(n, k) > 0.15
    g = rng.randn(n, k, c).astype(np.float32)
    gj, nbrj, maskj = jnp.asarray(g), jnp.asarray(nbr), jnp.asarray(mask)

    def xla(gv, nb, mk):
        gm = jnp.where(mk[..., None], gv, 0.0)
        return jnp.zeros((n, c), jnp.float32).at[nb].add(gm)

    t_x = bench(xla, gj, nbrj, maskj)
    ref = np.asarray(jax.jit(xla)(gj, nbrj, maskj))
    print(f"[{name}] n={n} k={k} c={c} span~{true_span}")
    print(f"  xla scatter-add      {t_x:7.3f} ms")
    for b in blocks:
        def kern(gv, nb, mk, _b=b):
            return scatter_window_rows(gv, nb, mk, n, block=_b, parts=parts)
        t_k = bench(kern, gj, nbrj, maskj)
        out = np.asarray(jax.jit(kern)(gj, nbrj, maskj))
        err = (np.abs(out - ref).max()
               / max(np.abs(ref).max(), 1e-9))
        print(f"  pallas block={_fmt(b)} {t_k:7.3f} ms  ({t_x / t_k:4.2f}x)"
              f"  rel_err={err:.2e}")


def _fmt(b):
    return f"{b:<4d}"


if __name__ == "__main__":
    blocks = tuple(int(a) for a in sys.argv[1:]) or (128, 256, 512)
    print("devices:", jax.devices())
    # detector level-0 conv blocks: N=98304 events, K=15 slots (self folded)
    run_case("level0 block1", n=98304, k=15, c=19, lookback=1024,
             blocks=blocks)
    run_case("level0 block2", n=98304, k=15, c=16, lookback=1024,
             blocks=blocks)
    # wider spans (stress the forward-window scan)
    run_case("level0 wide-span", n=98304, k=15, c=16, lookback=1024,
             span_frac=0.6, blocks=blocks)

#!/usr/bin/env python
"""Micro-benchmark: the level-0/1 image-feature chain — bilinear upsample of
the two coarse CNN maps to full resolution + per-event row lookup.

The trace at round-3 HEAD attributes ~0.58 ms/iter of pure layout copies to
this chain (copy.773/774, pad_maximum, convolution_bitcast) on top of the
1.24 ms issue-bound gather.  Compares:

  a) current: einsum "Ww,bhwc->bhWc" then "Hh,bhWc->bHWc", concat, gather
     by (batch, y, x)
  b) dot-natural: two dot_generals whose natural row-major outputs are
     [W,b,h,c] then [H,W,b,c]; the gather indexes rows (y, x, b) with the
     channel dim untouched — no layout copies anywhere
  c) b, but concatenating the maps before the H contraction

Usage: python tools/bench_upsample.py
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

from eventad_tpu.models.graph import _interp_matrix

B, H, W = 6, 240, 360
N = 16384
MAPS = [(60, 90, 64), (120, 180, 16)]   # (h', w', c) of image_feats[0..1]
DT = jnp.bfloat16


def bench(fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out).ravel()[0]
    for _ in range(3):
        np.asarray(f(*args)).ravel()[0]
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(outs[-1]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(B, h, w, c).astype(np.float32), DT)
             for h, w, c in MAPS]
    xi = jnp.asarray(rng.randint(0, W, size=N * B), jnp.int32)
    yi = jnp.asarray(rng.randint(0, H, size=N * B), jnp.int32)
    batch = jnp.asarray(np.repeat(np.arange(B), N), jnp.int32)

    mats = {}
    for h, w, c in MAPS:
        mats[(h, w)] = (jnp.asarray(_interp_matrix(H, h), DT),
                        jnp.asarray(_interp_matrix(W, w), DT))

    def chain_current(f0, f1):
        def up(f):
            h, w = f.shape[1:3]
            ay, ax = mats[(h, w)]
            u = jnp.einsum("Ww,bhwc->bhWc", ax, f)
            return jnp.einsum("Hh,bhWc->bHWc", ay, u)
        up01 = jnp.concatenate([up(f0), up(f1)], axis=-1)
        rows = up01[batch, yi, xi]
        return jnp.sum(rows.astype(jnp.float32))

    def up_natural(f):
        h, w = f.shape[1:3]
        ay, ax = mats[(h, w)]
        # W contraction: [Wfull, b, h, c] natural row-major
        uw = jax.lax.dot_general(ax, f, (((1,), (2,)), ((), ())))
        # H contraction: [Hfull, Wfull, b, c]
        return jax.lax.dot_general(ay, uw, (((1,), (2,)), ((), ())))

    def chain_natural(f0, f1):
        up01 = jnp.concatenate([up_natural(f0), up_natural(f1)], axis=-1)
        rows = up01[yi, xi, batch]
        return jnp.sum(rows.astype(jnp.float32))

    for name, fn in [("current (einsum bhWc + gather[b,y,x])", chain_current),
                     ("dot-natural ([H,W,b,c] + gather[y,x,b])",
                      chain_natural)]:
        t = bench(fn, *feats)
        print(f"{name:45s} {t:7.3f} ms")
        v = jax.jit(fn)(*feats)
        print(f"    checksum {float(np.asarray(v)):.3f}")


if __name__ == "__main__":
    main()

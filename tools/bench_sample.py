#!/usr/bin/env python
"""Micro-benchmark: pooled-level bilinear image sampling.

The round-3 trace shows XLA wrapping the levels 2-4 ``sample_image_features``
gathers in transpose pairs ([6,60,90,256] <-> [60,6,90,256], ~0.38 ms/iter
of layout churn).  Compares the current NHWC 4-D gather against a
flat-row-index gather (no operand layout freedom => no transposes).

Usage: python tools/bench_sample.py
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

from eventad_tpu.models.graph import sample_image_features

B, W, H = 6, 360, 240
DT = jnp.bfloat16
# (rows of the pooled table, map h', map w', channels) for levels 2..4
CASES = [(13440, 60, 90, 256), (3360, 30, 45, 256), (840, 15, 23, 256)]


def bench(fn, *args, iters=30):
    f = jax.jit(fn)
    np.asarray(f(*args)).ravel()[0]
    for _ in range(3):
        np.asarray(f(*args)).ravel()[0]
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(outs[-1]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def sample_flat(feat, pos, batch, node_mask, full_width, full_height):
    """sample_image_features with flat-index gathers (layout-pinned)."""
    b, hp, wp, c = feat.shape
    fx = pos[:, 0] * full_width * (wp - 1) / max(full_width - 1, 1)
    fy = pos[:, 1] * full_height * (hp - 1) / max(full_height - 1, 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    feat_r = jnp.concatenate([feat[:, :, 1:], feat[:, :, -1:]], axis=2)
    pair = jnp.concatenate([feat, feat_r], axis=3).reshape(b * hp * wp, 2 * c)

    def tap_pair(yy):
        ok_y = (yy >= 0) & (yy < hp)
        idx = (batch * hp + jnp.clip(yy, 0, hp - 1)) * wp \
            + jnp.clip(x0i, 0, wp - 1)
        v = pair[idx]
        v0, v1 = v[:, :c], v[:, c:]
        v1 = jnp.where((x0i < 0)[:, None], v0, v1)
        okx0 = (x0i >= 0) & (x0i < wp) & ok_y
        okx1 = (x0i + 1 >= 0) & (x0i + 1 < wp) & ok_y
        return (jnp.where(okx0[:, None], v0, 0.0),
                jnp.where(okx1[:, None], v1, 0.0))

    v00, v01 = tap_pair(y0i)
    v10, v11 = tap_pair(y0i + 1)
    tx = tx.astype(feat.dtype)
    ty = ty.astype(feat.dtype)
    out = ((1 - ty) * ((1 - tx) * v00 + tx * v01)
           + ty * ((1 - tx) * v10 + tx * v11))
    return jnp.where(node_mask[:, None], out, 0.0)


def main():
    rng = np.random.RandomState(0)
    for n, hp, wp, c in CASES:
        feat = jnp.asarray(rng.randn(B, hp, wp, c).astype(np.float32), DT)
        pos = jnp.asarray(rng.rand(n, 3).astype(np.float32))
        batch = jnp.asarray(np.repeat(np.arange(B), n // B), jnp.int32)
        mask = jnp.asarray(rng.rand(n) > 0.3)

        def cur(feat, pos):
            return jnp.sum(sample_image_features(
                feat, pos, batch, mask, W, H).astype(jnp.float32))

        def flat(feat, pos):
            return jnp.sum(sample_flat(
                feat, pos, batch, mask, W, H).astype(jnp.float32))

        a = float(np.asarray(jax.jit(cur)(feat, pos)))
        b2 = float(np.asarray(jax.jit(flat)(feat, pos)))
        tc = bench(cur, feat, pos)
        tf = bench(flat, feat, pos)
        print(f"n={n:6d} map={hp}x{wp}x{c}: current {tc:7.3f} ms | "
              f"flat {tf:7.3f} ms | checksums {a:.2f}/{b2:.2f}")


if __name__ == "__main__":
    main()

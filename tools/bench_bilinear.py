#!/usr/bin/env python
"""Micro-benchmark + device exactness: separable-bilinear Pallas sampler
(ops/bilinear_sample.py) vs the XLA upsample+gather chain it replaces
(models/graph.sample_image_features on the full-res upsampled map).

Shapes mirror the headline batch (bench.py): batch 6, 16384 events/item,
coarse map 30x45x64 (layer2 remap) and fine map 120x180x16 (layer1 remap),
sensor 360x240. The XLA chain cost includes its upsample (that is what
the kernel removes).

Usage: python tools/bench_bilinear.py [dtype]   (default bfloat16)
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

from eventad_tpu.models.graph import (lookup_pixel_features,
                                      sample_image_features,
                                      upsample_align_corners)
from eventad_tpu.ops.bilinear_sample import sample_bilinear_mxu

W, H = 360, 240
B, NMAX = 6, 16384


def bench(fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out).ravel()[0]
    for _ in range(3):
        out = f(*args)
        np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(outs[-1]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def run_case(name, hp, wp, c, dt, seed=0):
    rng = np.random.RandomState(seed)
    n = B * NMAX
    feat = jnp.asarray(rng.randn(B, hp, wp, c).astype(np.float32)).astype(dt)
    px = rng.randint(0, W, n) / W
    py = rng.randint(0, H, n) / H
    pos = jnp.asarray(np.stack([px, py, np.zeros(n)], 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) > 0.1)
    batch = jnp.asarray(np.repeat(np.arange(B, dtype=np.int32), NMAX))

    # benched programs return ONE scalar — np.asarray on the full [N, C]
    # output would drag ~25 MB through the tunnel per sync (CLAUDE.md trap)
    def xla_chain(feat, pos, batch, mask):
        up = upsample_align_corners(feat, W, H)
        return lookup_pixel_features(up, pos, batch, mask, W, H) \
            .astype(jnp.float32).sum()

    def sep(feat, pos, mask):
        return sample_bilinear_mxu(feat, pos, mask, full_width=W,
                                   full_height=H, batch_size=B) \
            .astype(jnp.float32).sum()

    want = np.asarray(jax.jit(sample_image_features,
                              static_argnums=(4, 5))(
        feat.astype(jnp.float32), pos, batch, mask, W, H))
    got = np.asarray(sample_bilinear_mxu(
        feat, pos, mask, full_width=W, full_height=H,
        batch_size=B)).astype(np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    err = np.abs(got - want).max() / scale
    tol = 2e-2 if dt == jnp.bfloat16 else 1e-5
    ok = err < tol

    t_xla = bench(xla_chain, feat, pos, batch, mask)
    t_sep = bench(sep, feat, pos, mask)
    print(f"{name}: xla(up+gather) {t_xla:.3f} ms  separable {t_sep:.3f} ms "
          f"({t_xla / t_sep:.2f}x)  rel_err {err:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    dt = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bfloat16") \
        else jnp.float32
    print(f"backend={jax.default_backend()} dtype={dt.__name__}")
    ok = run_case("coarse 30x45x64 ", 30, 45, 64, dt)
    ok &= run_case("fine  120x180x16", 120, 180, 16, dt)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

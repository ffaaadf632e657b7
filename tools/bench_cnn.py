#!/usr/bin/env python
"""Micro-bench the CNN branch (ResNet-50 + remaps) in isolation and try
layout variants.  The xprof trace shows ~1.6 ms/batch of conv fusions plus
per-block layout ping-pong copies ({3,1,2,0} <-> {3,0,2,1}: XLA gives 1x1
convs W-in-sublanes tiles and 3x3 convs H-in-sublanes tiles); this tool
measures whether reformulations remove the churn.

Variants:
  v0   current cnn_branch_forward (NHWC convs)
  v1   1x1 convs as flat [B*H*W, C] dots (stride-2 downsamples slice first)
  v2   batch padded 6 -> 8
  v3   1x1 convs as dots AND batch padded to 8

Usage: python tools/bench_cnn.py [variant ...]
"""
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from eventad_tpu.utils.jaxtools import setup_compilation_cache, wait_for_tpu
wait_for_tpu()
import jax
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np

from eventad_tpu.models import resnet as R


def conv_dot11(x, w, stride=1, padding=None):
    """1x1 convs as a flat dot; others via the regular conv path."""
    if w.shape[0] == 1 and w.shape[1] == 1 and (padding is None or
                                                padding == [(0, 0), (0, 0)]):
        if stride != 1:
            x = x[:, ::stride, ::stride]
        b, h, wd, c = x.shape
        y = x.reshape(b * h * wd, c) @ w.reshape(c, -1)
        return y.reshape(b, h, wd, -1)
    return R._conv_orig(x, w, stride=stride, padding=padding)


def main():
    want = set(sys.argv[1:]) or {"v0", "v1", "v2", "v3"}
    key = jax.random.PRNGKey(0)
    params, state = R.init_cnn_branch(
        key, "resnet50", [16, 16, 16, 16, 16], [256, 256])
    img = jax.random.uniform(jax.random.PRNGKey(1), (6, 240, 360, 3))

    if not hasattr(R, "_conv_orig"):
        R._conv_orig = R._conv

    def run(name, use_dot, batch_pad):
        R._conv = conv_dot11 if use_dot else R._conv_orig
        im = img
        if batch_pad:
            im = jnp.concatenate([img, img[:2]], axis=0)

        def fn_scan_n(n, im):
            def body(c, _):
                feats, outs, _ = R.cnn_branch_forward(
                    params, state, im + c, "resnet50",
                    training=False, compute_dtype="bfloat16")
                s = sum(f[0, 0, 0, :1].astype(jnp.float32).sum()
                        for f in feats + outs)
                return s * 0.0, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        sync = lambda o: np.asarray(o).ravel()[0]
        f1 = jax.jit(partial(fn_scan_n, 8))
        f2 = jax.jit(partial(fn_scan_n, 32))
        del fn_scan_n  # partial binds n statically; jit sees only im
        t0 = time.perf_counter()
        sync(f1(im)); sync(f2(im))
        print(f"  [{name.strip()}] compiled in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

        def best(f, reps=3):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter(); sync(f(im))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        ms = (best(f2) - best(f1)) / 24 * 1e3
        print(f"{name}: {ms:.3f} ms/batch device (batch {im.shape[0]})")
        R._conv = R._conv_orig
        return ms

    if "v0" in want:
        run("v0 current NHWC     ", False, False)
    if "v1" in want:
        run("v1 1x1-as-dot       ", True, False)
    if "v2" in want:
        run("v2 batch 8          ", False, True)
    if "v3" in want:
        run("v3 dot + batch 8    ", True, True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Micro-bench: Pallas flat-layout upsample writer + flat row gather
(ops/upsample_flat.py) vs the XLA upsample_lookup chain.

Usage: python tools/bench_upflat.py
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

from eventad_tpu.models.graph import upsample_lookup
from eventad_tpu.ops.upsample_flat import upsample_flat_lookup

B, H, W = 6, 240, 360
N = 16384
MAPS = [(60, 90, 64), (120, 180, 16)]
DT = jnp.bfloat16


def bench(fn, *args, iters=20, tag="v"):
    f = jax.jit(fn)
    np.asarray(f(*args)).ravel()[0]
    for _ in range(3):
        np.asarray(f(*args)).ravel()[0]
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(outs[-1]).ravel()[0]
    wall = (time.perf_counter() - t0) / iters * 1e3
    from eventad_tpu.utils.jaxtools import trace_device_ms
    try:
        dev = trace_device_ms(lambda: np.asarray(f(*args)).ravel()[0],
                              iters=8, trace_dir=f"/tmp/ev_trace_uf_{tag}")
    except Exception as e:
        print(f"    trace failed: {e}")
        dev = None
    return wall, dev


def main():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(B, h, w, c).astype(np.float32), DT)
             for h, w, c in MAPS]
    xp = rng.randint(0, W, N * B)
    yp = rng.randint(0, H, N * B)
    pos = jnp.asarray(
        np.stack([xp / W, yp / H, np.zeros(N * B)], -1).astype(np.float32))
    batch = jnp.asarray(np.repeat(np.arange(B), N), jnp.int32)
    mask = jnp.ones((N * B,), bool)

    def chain_xla(f0, f1):
        rows = upsample_lookup([f0, f1], pos, batch, mask, W, H,
                               mask_rows=False)
        return jnp.sum(rows.astype(jnp.float32)), rows

    def chain_flat(f0, f1):
        rows = upsample_flat_lookup([f0, f1], pos, batch, mask, W, H)
        return jnp.sum(rows.astype(jnp.float32)), rows

    outs = {}
    for name, fn in [("xla upsample_lookup", chain_xla),
                     ("pallas flat writer + flat gather", chain_flat)]:
        wall, dev = bench(lambda a, b, f=fn: f(a, b)[0], *feats,
                          tag=name.split()[0])
        dev_s = "  n/a" if dev is None else f"{dev:7.3f}"
        print(f"{name:35s} wall {wall:7.3f}  device {dev_s} ms")
        outs[name.split()[0]] = np.asarray(
            jax.jit(fn)(*feats)[1], np.float32)
    a, b = outs["xla"], outs["pallas"]
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
    print(f"max rel diff vs XLA chain: {rel:.2e} "
          f"(bf16 intermediate, different contraction order)")
    assert rel < 0.03, rel


if __name__ == "__main__":
    main()

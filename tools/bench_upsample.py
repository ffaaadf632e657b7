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


def bench(fn, *args, iters=30, tag="v"):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out).ravel()[0]
    for _ in range(3):
        np.asarray(f(*args)).ravel()[0]
    # wall (tunnel-floored, pipelined) AND trace-based device time
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(outs[-1]).ravel()[0]
    wall = (time.perf_counter() - t0) / iters * 1e3
    from eventad_tpu.utils.jaxtools import trace_device_ms
    try:
        dev = trace_device_ms(lambda: np.asarray(f(*args)).ravel()[0],
                              iters=8, trace_dir=f"/tmp/ev_trace_up_{tag}")
    except Exception as e:
        print(f"    trace failed: {e}")
        dev = None
    return wall, dev


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

    # flat8: pad batch to a sublane multiple (8) at the COARSE maps, keep
    # the dot-natural [H, W, Bp, c] output, and view it as a flat
    # [H*W*Bp, c] row table — with Bp a multiple of 8 the reshape is a
    # pure bitcast (identical (8,128) tiling), and the gather becomes a
    # flat 1-D row gather, which the round-2 measurements put at ~3.6
    # ns/row vs ~12.5 for the 3-index 4-D form (CLAUDE.md).
    BP = 8

    def chain_flat8(f0, f1):
        ups = []
        for f in (f0, f1):
            fp = jnp.pad(f, ((0, BP - B), (0, 0), (0, 0), (0, 0)))
            ups.append(up_natural(fp))                  # [H, W, BP, c]
        up01 = jnp.concatenate(ups, axis=-1)
        flat = up01.reshape(H * W * BP, up01.shape[-1])
        rows = flat[(yi * W + xi) * BP + batch]
        return jnp.sum(rows.astype(jnp.float32))

    def up_natural_w(f):
        h, w = f.shape[1:3]
        ay, ax = mats[(h, w)]
        # H contraction first: [Hfull, b, w, c]; then W: [Wfull, Hfull, b, c]
        uh = jax.lax.dot_general(ay, f, (((1,), (1,)), ((), ())))
        return jax.lax.dot_general(ax, uh, (((1,), (2,)), ((), ())))

    def chain_flat8_wmajor(f0, f1):
        ups = []
        for f in (f0, f1):
            fp = jnp.pad(f, ((0, BP - B), (0, 0), (0, 0), (0, 0)))
            ups.append(up_natural_w(fp))                # [W, H, BP, c]
        up01 = jnp.concatenate(ups, axis=-1)
        flat = up01.reshape(H * W * BP, up01.shape[-1])
        rows = flat[(xi * H + yi) * BP + batch]
        return jnp.sum(rows.astype(jnp.float32))

    # flat8-batched: make the LAST contraction a matmul whose N dims are
    # (b, c) — batched over the already-upsampled W axis — so the natural
    # output minor dims are the (8, 128) tile the flat row-gather wants
    # and no relayout copy can appear between the dot and the gather.
    def chain_flat8_bdot(f0, f1):
        ups = []
        for f in (f0, f1):
            h, w, c = f.shape[1:4]
            ay, ax = mats[(h, w)]
            fp = jnp.pad(f, ((0, BP - B), (0, 0), (0, 0), (0, 0)))
            fp = fp.transpose(1, 2, 0, 3)               # [hp, wp, 8, c]
            # W contraction: [Wf, hp, 8, c]
            uw = jax.lax.dot_general(ax, fp, (((1,), (1,)), ((), ())))
            # H contraction BATCHED over Wf: lhs ay broadcast [Wf, Hf, hp];
            # per-Wf matmul [Hf, hp] @ [hp, 8*c] -> [Wf, Hf, 8, c] with
            # (8, c) as the output tile dims
            ayb = jnp.broadcast_to(ay[None], (W,) + ay.shape)
            up = jax.lax.dot_general(ayb, uw,
                                     (((2,), (1,)), ((0,), (0,))))
            ups.append(up)                              # [Wf, Hf, 8, c]
        up01 = jnp.concatenate(ups, axis=-1)
        flat = up01.reshape(W * H * BP, up01.shape[-1])
        rows = flat[(xi * H + yi) * BP + batch]
        return jnp.sum(rows.astype(jnp.float32))

    def chain_flat8_bdot_h(f0, f1):
        ups = []
        for f in (f0, f1):
            h, w, c = f.shape[1:4]
            ay, ax = mats[(h, w)]
            fp = jnp.pad(f, ((0, BP - B), (0, 0), (0, 0), (0, 0)))
            fp = fp.transpose(2, 1, 0, 3)               # [wp, hp, 8, c]
            # H contraction: [Hf, wp, 8, c]
            uh = jax.lax.dot_general(ay, fp, (((1,), (1,)), ((), ())))
            # W contraction batched over Hf -> [Hf, Wf, 8, c]
            axb = jnp.broadcast_to(ax[None], (H,) + ax.shape)
            up = jax.lax.dot_general(axb, uh,
                                     (((2,), (1,)), ((0,), (0,))))
            ups.append(up)                              # [Hf, Wf, 8, c]
        up01 = jnp.concatenate(ups, axis=-1)
        flat = up01.reshape(H * W * BP, up01.shape[-1])
        rows = flat[(yi * W + xi) * BP + batch]
        return jnp.sum(rows.astype(jnp.float32))

    # HbWc: logical [H, b, W, c] row-major is PHYSICALLY the {3,1,2,0}
    # layout the gather prefers for [H, W, b, c] — if XLA keeps the einsum
    # output row-major, the relayout copy between upsample and gather
    # (0.19 ms in the model trace) disappears
    def chain_hbwc(f0, f1):
        ups = []
        for f in (f0, f1):
            h, w = f.shape[1:3]
            ay, ax = mats[(h, w)]
            uw = jnp.einsum("Ww,bhwc->bhWc", ax, f)
            ups.append(jnp.einsum("Hh,bhWc->HbWc", ay, uw))
        up01 = jnp.concatenate(ups, axis=-1)
        rows = up01[yi, batch, xi]
        return jnp.sum(rows.astype(jnp.float32))

    for name, fn in [("HbWc (einsum HbWc + gather[y,b,x])", chain_hbwc),
                     ("current (einsum bhWc + gather[b,y,x])", chain_current),
                     ("dot-natural ([H,W,b,c] + gather[y,x,b])",
                      chain_natural),
                     ("flat8 ([H,W,8,c] bitcast + 1-D row gather)",
                      chain_flat8),
                     ("flat8 w-major ([W,H,8,c] + 1-D row gather)",
                      chain_flat8_wmajor),
                     ("flat8-bdot ([W,H,8,c] batched H-dot)",
                      chain_flat8_bdot),
                     ("flat8-bdot-h ([H,W,8,c] batched W-dot)",
                      chain_flat8_bdot_h)]:
        wall, dev = bench(fn, *feats, tag=name.split()[0])
        dev_s = "  n/a" if dev is None else f"{dev:7.3f}"
        print(f"{name:45s} wall {wall:7.3f}  device {dev_s} ms")
        v = jax.jit(fn)(*feats)
        print(f"    checksum {float(np.asarray(v)):.3f}")


if __name__ == "__main__":
    main()

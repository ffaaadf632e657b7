"""Flat-layout bilinear upsample writer + flat row gather (Pallas TPU).

The level-0/1 image-feature fetch gathers one row per event from the
full-resolution upsampled CNN maps.  The XLA chain (two interpolation dots
-> concat -> gather) has two costs the compiler cannot remove:

* the 3-index gather on the 4-D map runs at ~12.6 ns/row, while the same
  rows gathered from a FLAT 2-D ``[R, C]`` table run at ~9 ns/row
  (tools/bench_upsample.py); but
* no dot/einsum spelling makes XLA emit the flat row-major layout — its
  dot outputs always keep the spatial dims minor, inserting a 0.19 ms
  relayout copy before the gather (measured identical for every operand
  order tried; feeding a Pallas kernel with the XLA H-dot's output costs
  a 0.20 ms input relayout the same way).

This kernel therefore owns the WHOLE upsample: it reads the raw coarse
maps (each fits VMEM), applies the 2-tap align-corners H-interpolation
per output row y (tap indices and weights ride scalar prefetch), does the
W-expansion as one small MXU matmul per (map, y) against the static
interpolation matrix, and writes rows DIRECTLY into the flat table

    flat[(b * Hf + y) * Wf + x, :] = concat_m bilinear_m(x, y, b)

so the flat layout is produced, never relayouted.

Numerics: H-then-W contraction order with a bf16 intermediate, vs the XLA
chain's W-then-H — both are bf16-rounded compositions of the same exact
bilinear operator; closeness to the XLA chain is pinned in
tests/test_upsample_flat.py (CPU interpret mode) and the model-level bf16
claims are tolerance-based (the CPU/f32 paths never use this kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.graph import _interp_matrix


def _taps(dst: int, src: int):
    """Per-output-row 2-tap H-interpolation: (i0, i1, w0, w1) arrays."""
    f = np.arange(dst) * (src - 1) / max(dst - 1, 1)
    i0 = np.floor(f).astype(np.int32)
    t = (f - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, src - 1).astype(np.int32)
    return i0, i1, (1.0 - t).astype(np.float32), t


def _writer_kernel(h0_ref, h1_ref, ww_ref, *refs, by, wf, specs):
    """refs: [f_0..f_{M-1}, ax_0..ax_{M-1}, out].

    f_m block: [1, hp_m, wp_m, c_m] (one batch item's coarse map);
    ax_m: [Wf, wp_m] resident; out block: [by * Wf, c_out].
    h0/h1 [M, Hf] i32 and ww [M, Hf, 2] f32 ride scalar prefetch."""
    m = len(specs)
    fs = refs[:m]
    axs = refs[m:2 * m]
    out_ref = refs[2 * m]
    iy = pl.program_id(1)
    for j in range(by):
        y = iy * by + j
        outs = []
        for mi, (wp, c) in enumerate(specs):
            h0 = h0_ref[mi, y]
            h1 = h1_ref[mi, y]
            w0 = ww_ref[mi, y, 0]
            w1 = ww_ref[mi, y, 1]
            fa = fs[mi][0, h0]                      # [wp, c]
            fb = fs[mi][0, h1]
            u = (fa.astype(jnp.float32) * w0
                 + fb.astype(jnp.float32) * w1).astype(jnp.bfloat16)
            outs.append(jnp.dot(axs[mi][...], u,
                                preferred_element_type=jnp.float32))
        o = outs[0] if m == 1 else jnp.concatenate(outs, axis=1)
        out_ref[j * wf:(j + 1) * wf, :] = o.astype(out_ref.dtype)


def upsample_flat_table(feats, full_width: int, full_height: int,
                        *, by: int = None, interpret: bool = False):
    """``feats``: list of ``[B, hp_m, wp_m, c_m]`` maps (any float dtype;
    computed in bf16).  Returns the flat row table
    ``[B * Hf * Wf, sum c_m]`` bf16 where row ``(b * Hf + y) * Wf + x`` is
    the align-corners bilinear upsample of the channel-concatenated maps
    at pixel (x, y) of item b."""
    b = feats[0].shape[0]
    hf, wf = full_height, full_width
    if by is None:
        # larger y-blocks amortize the per-step grid overhead (v5e sweep:
        # 0.43 ms at by=12 -> 0.39 at by=120 for [6, 240, 360, 80])
        by = next(d for d in (120, 60, 48, 40, 30, 24, 20, 12, 8, 6, 4, 3,
                              2, 1) if hf % d == 0)
    assert hf % by == 0, (hf, by)
    assert wf % 8 == 0, wf
    specs = [(f.shape[2], f.shape[3]) for f in feats]
    c_out = sum(c for _, c in specs)
    m = len(specs)

    h0s = np.zeros((m, hf), np.int32)
    h1s = np.zeros((m, hf), np.int32)
    wws = np.zeros((m, hf, 2), np.float32)
    axs = []
    for mi, f in enumerate(feats):
        hp, wp = f.shape[1], f.shape[2]
        i0, i1, w0, w1 = _taps(hf, hp)
        h0s[mi], h1s[mi] = i0, i1
        wws[mi, :, 0], wws[mi, :, 1] = w0, w1
        axs.append(jnp.asarray(_interp_matrix(wf, wp), jnp.bfloat16))

    kern = functools.partial(_writer_kernel, by=by, wf=wf, specs=specs)
    nby = hf // by
    # index maps receive (grid indices..., scalar-prefetch refs...); item
    # ib contributes nby consecutive output blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, nby),
        in_specs=[
            pl.BlockSpec((1,) + f.shape[1:],
                         lambda ib, iy, *_: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for f in feats
        ] + [
            pl.BlockSpec((wf, wp), lambda ib, iy, *_: (0, 0),
                         memory_space=pltpu.VMEM)
            for (wp, _c) in specs
        ],
        out_specs=pl.BlockSpec(
            (by * wf, c_out),
            lambda ib, iy, *_, n=nby: (ib * n + iy, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * hf * wf, c_out), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(h0s), jnp.asarray(h1s), jnp.asarray(wws),
      *([f.astype(jnp.bfloat16) for f in feats] + axs))
    return out


def upsample_flat_lookup(feats, pos, batch, node_mask, full_width: int,
                         full_height: int, *, by: int = None,
                         interpret: bool = False):
    """Drop-in sibling of :func:`eventad_tpu.models.graph.upsample_lookup`
    (mask_rows=False semantics): flat writer + flat 1-D row gather."""
    flat = upsample_flat_table(feats, full_width, full_height, by=by,
                               interpret=interpret)
    hf, wf = full_height, full_width
    xi = jnp.clip(jnp.round(pos[:, 0] * full_width).astype(jnp.int32),
                  0, wf - 1)
    yi = jnp.clip(jnp.round(pos[:, 1] * full_height).astype(jnp.int32),
                  0, hf - 1)
    return flat[(batch * hf + yi) * wf + xi]

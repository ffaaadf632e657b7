"""Fused spline-convolution Pallas TPU kernel (transposed layout).

One kernel performs, entirely in VMEM, what the XLA path spells out as
gather -> edge-attr basis -> coefficient scatter -> z-contraction -> kernel
matmul (replacing the per-edge hot loop of the reference,
src/dagr/model/layers/spline_conv.py:39-47):

    out[n, o] = sum_{k,m} coeff[n,k,m] * x[nbr[n,k], :] @ W[m][:, o]

Design (why it is fast on TPU):

* **Transposed operands: channels on sublanes, destinations on lanes.**
  Channel counts here (16..130) only part-fill 128-lane vregs, so any
  ``[*, C]``-shaped VPU op wastes most of the machine — that is what made
  the z-contraction look like a 5.4 ms "VPU floor" in XLA.  With the source
  table stored ``[C, N]``, a block processes 128 destinations per lane row:
  the per-(slot, tap) coefficient is a ``[1, T]`` lane vector that
  broadcasts over the C sublanes for free, and every FMA runs at full lane
  utilization for ANY C.

* **Windowed one-hot gather on the MXU.** The graph contract bounds every
  neighbour of destination ``i`` to stream rows ``[i-lookback,
  i+lookahead]`` (level 0: lookahead 0, ev_graph.cu:62; pooled levels:
  +-span rows of the grid-ordered cell table).  The window is DMA'd in
  128-event chunks and neighbour columns are selected by
  ``win[C, 128] @ onehot[128, T]`` — the ``[N, K, C]`` neighbour tensor
  never exists in HBM.  A scalar-prefetched per-block bound from the true
  neighbour span skips dead chunks.

* **Static kernel-tap sub-rectangle.** The caller passes per-edge spline
  coordinates ``u = clip(attr,0,1) * (K-1)`` and static tap ranges
  (ops/spline_conv.tap_ranges); at level 0 the graph radius bounds attrs
  to a 3x5 sub-rectangle of the 5x5 kernel — 15 instead of 25 slots.

* The level-0 self edge is folded out by the caller (slot-0 attr is
  exactly 0.5 -> its kernel is the constant center matrix, added to the
  root linear), shrinking K to 15.

bfloat16 only: this is the production inference path; training and CPU
fall back to the XLA formulation in ops/spline_conv.py (same math, tested
against it in tests/test_spline_fused.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 128      # window chunk (events per DMA)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _fused_kernel(nsub_ref, relq_ref, uxq_ref, uyq_ref, srcT_hbm, wT_ref,
                  out_ref, win, sem, xjT, *, t, k, ks, c8,
                  nxs, nys, mx0, my0, w_total):
    """Per destination block of ``t`` lanes:

    relq/uxq/uyq: ``[K, t]`` window-relative neighbour index (-1 = masked)
    and per-edge spline coordinates.
    srcT_hbm: ``[W_chunks, C8, 128]`` transposed chunked source table;
    chunks ``[i*t/128, i*t/128 + w_total/128)`` are block ``i``'s window
    (chunk index leads so the DMA slice stays off the tiled dims).
    wT: ``[m_sub, O8, C8]`` kernel-tap weights (transposed).
    out: ``[O8, t]``.
    """
    i = pl.program_id(0)
    n_sub = nsub_ref[i]
    base_chunk = i * (t // _SUB)
    m_sub = nxs * nys

    def dma(slot, s):
        ci = base_chunk + (w_total // _SUB) - 1 - s
        return pltpu.make_async_copy(
            srcT_hbm.at[ci], win.at[slot], sem.at[slot])

    xjT[...] = jnp.zeros_like(xjT)
    dma(0, 0).start()

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB, t), 1)
    rel_all = relq_ref[...]                          # [K, t]
    rel3 = rel_all.reshape(k, 1, t)

    def sub_body(s, _):
        slot = s % 2

        @pl.when(s + 1 < n_sub)
        def _():
            dma((s + 1) % 2, s + 1).start()

        dma(slot, s).wait()
        w0 = w_total - (s + 1) * _SUB
        win_b = win[slot]                            # [C8, SUB] bf16
        # one-hot for ALL slots in one compare+cast over [K, SUB, t]
        oh3 = (rel3 == w_iota + w0).astype(jnp.bfloat16)
        for kk in range(k):
            xjT[kk] += jnp.dot(win_b, oh3[kk],
                               preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_sub, sub_body, 0)

    # ---- spline basis for all slots at once ([K, t] dense lanes) ----
    ux = uxq_ref[...]
    uy = uyq_ref[...]
    ix0 = jnp.clip(jnp.floor(ux).astype(jnp.int32), 0, ks - 2)
    iy0 = jnp.clip(jnp.floor(uy).astype(jnp.int32), 0, ks - 2)
    frx = ux - ix0.astype(jnp.float32)
    fry = uy - iy0.astype(jnp.float32)
    lx = ix0 - mx0
    ly = iy0 - my0
    cxs = [jnp.where(lx == mx, 1.0 - frx, 0.0)
           + jnp.where(lx == mx - 1, frx, 0.0) for mx in range(nxs)]
    cys = [jnp.where(ly == my, 1.0 - fry, 0.0)
           + jnp.where(ly == my - 1, fry, 0.0) for my in range(nys)]

    # ---- z-contraction + kernel matmul: [1, t] coefficient rows
    # broadcast over the C8 sublanes; z_m accumulates functionally (no
    # scratch read-modify-write), then one MXU matmul per tap ----
    acc = jnp.zeros((out_ref.shape[0], t), jnp.float32)
    for my in range(nys):
        for mx in range(nxs):
            cm = cys[my] * cxs[mx]               # [K, t], one op per tap
            z = jnp.zeros((c8, t), jnp.float32)
            for kk in range(k):
                z += cm[kk:kk + 1, :] * xjT[kk]
            acc += jnp.dot(wT_ref[my * nxs + mx], z.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    out_ref[...] = acc


class FusedPrep(NamedTuple):
    """Source-independent kernel inputs (shared by the two conv blocks of a
    layer — they use the same neighbour tables and attrs)."""
    nsub: jnp.ndarray    # [n_blocks] per-block one-hot chunk bound
    relq: jnp.ndarray    # [K, n_pad] window-relative indices (-1 masked)
    uxq: jnp.ndarray     # [K, n_pad] spline coordinates
    uyq: jnp.ndarray
    n: int
    t: int
    lb: int
    lf: int
    w_total: int


def prepare_fused(nbr: jnp.ndarray, nbr_mask: jnp.ndarray, u: jnp.ndarray,
                  *, lookback: int, lookahead: int = 0,
                  block: int = 128) -> FusedPrep:
    """Builds the transposed index/coordinate operands.

    nbr/nbr_mask: ``[N, K]``; every ``nbr[i,k]`` must lie in
    ``[i - lookback, i + lookahead]``.
    u: ``[N, K, 2]`` f32 spline coordinates ``clip(attr,0,1)*(K-1)``
    (values at masked slots are irrelevant — their one-hot row is empty,
    so they contribute exact zeros)."""
    n, kk = nbr.shape
    t = block
    assert t % _SUB == 0
    lb = -(-max(lookback, 1) // _SUB) * _SUB
    lf = -(-lookahead // _SUB) * _SUB if lookahead > 0 else 0
    n_blocks = -(-n // t)
    n_pad = n_blocks * t
    w_total = lb + t + lf
    nsub_max = w_total // _SUB

    blk = (jnp.arange(n, dtype=jnp.int32) // t) * t
    rel = jnp.where(nbr_mask, nbr + lb - blk[:, None], -1)

    def packT(a, fill, dtype):
        ap = jnp.pad(a.astype(dtype), ((0, n_pad - n), (0, 0)),
                     constant_values=fill)
        return ap.T                                   # [K, n_pad]

    relq = packT(rel, -1, jnp.int32)
    uxq = packT(u[..., 0], 0.0, jnp.float32)
    uyq = packT(u[..., 1], 0.0, jnp.float32)

    # per-block one-hot bound from the true neighbour span
    relp = jnp.pad(jnp.where(rel >= 0, rel, w_total - 1),
                   ((0, n_pad - n), (0, 0)), constant_values=w_total - 1)
    w_min = jnp.min(relp.reshape(n_blocks, t * kk), axis=1)
    nsub = jnp.clip(-(-(w_total - w_min) // _SUB), 1, nsub_max) \
        .astype(jnp.int32)
    return FusedPrep(nsub, relq, uxq, uyq, n, t, lb, lf, w_total)


def fused_spline_conv_prepared(src: jnp.ndarray,
                               prep: FusedPrep,
                               weight: jnp.ndarray,
                               *,
                               kernel_size: int,
                               ranges,
                               interpret: bool = False) -> jnp.ndarray:
    """Fused neighbour aggregation: returns
    ``out[n, o] = sum_{k,m} coeff[n,k,m] * src[nbr[n,k]] @ W_sub[m]``.

    Root linear / bias / BN / activation stay with the caller (cheap XLA
    matmul + elementwise).  Args:

      src: ``[N, C]`` source table (cast to bf16 internally).
      prep: from :func:`prepare_fused` (same N).
      weight: ``[ks*ks, C, O]`` full kernel; the tap sub-rectangle
        ``ranges`` (from ops/spline_conv.tap_ranges) is selected here.
      ranges: ``((mx0, mx1), (my0, my1))`` static tap bounds.

    Returns ``[N, O]`` float32.
    """
    n, c = src.shape
    assert n == prep.n
    kk = prep.relq.shape[0]
    ks = kernel_size
    (mx0, mx1), (my0, my1) = ranges
    nxs, nys = mx1 - mx0 + 1, my1 - my0 + 1
    m_sub = nxs * nys
    cout = weight.shape[-1]
    c8 = _pad8(c)
    o8 = _pad8(cout)
    t = prep.t
    n_pad = prep.relq.shape[1]
    n_blocks = n_pad // t
    w_total = prep.w_total

    # transposed, chunked source: [(lb+n_pad+lf)/128, C8, 128] — chunk
    # index leads (untiled dim) so the per-chunk DMA slices cleanly
    n_tot = prep.lb + n_pad + prep.lf
    srcT = jnp.zeros((c8, n_tot), jnp.bfloat16)
    srcT = jax.lax.dynamic_update_slice(
        srcT, src.astype(jnp.bfloat16).T, (0, prep.lb))
    srcT = srcT.reshape(c8, n_tot // _SUB, _SUB).transpose(1, 0, 2)

    # tap sub-rectangle, transposed [m_sub, O8, C8] bf16
    from .spline_conv import sub_kernel_index
    sub = sub_kernel_index(ks, ranges)
    w_sub = weight[sub].astype(jnp.bfloat16)          # [m_sub, C, O]
    wT = jnp.zeros((m_sub, o8, c8), jnp.bfloat16)
    wT = jax.lax.dynamic_update_slice(wT, w_sub.transpose(0, 2, 1),
                                      (0, 0, 0))

    kern = functools.partial(
        _fused_kernel, t=t, k=kk, ks=ks, c8=c8, nxs=nxs, nys=nys,
        mx0=mx0, my0=my0, w_total=w_total)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((kk, t), lambda i, ns: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, t), lambda i, ns: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, t), lambda i, ns: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((m_sub, o8, c8), lambda i, ns: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((o8, t), lambda i, ns: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, c8, _SUB), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((kk, c8, t), jnp.float32),
        ],
    )
    outT = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((o8, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MiB VMEM; the Mosaic default scoped limit (16 MiB)
            # undercounts the unrolled slot loops' temporaries
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prep.nsub, prep.relq, prep.uxq, prep.uyq, srcT, wT)
    return outT[:cout, :n].T


def fused_spline_conv(src, nbr, nbr_mask, u, weight, *, kernel_size,
                      ranges, lookback, lookahead=0, block=128,
                      interpret=False):
    """One-shot convenience wrapper: prepare + run (see
    :func:`fused_spline_conv_prepared`)."""
    prep = prepare_fused(nbr, nbr_mask, u, lookback=lookback,
                         lookahead=lookahead, block=block)
    return fused_spline_conv_prepared(src, prep, weight,
                                      kernel_size=kernel_size,
                                      ranges=ranges, interpret=interpret)

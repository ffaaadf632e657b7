"""Windowed row-gather as a Pallas TPU kernel.

The level-0 spline conv needs, per destination event, the feature rows of
its K neighbours. An XLA gather fetches a full memory tile (~4 KB) per
index, so ``x[nbr]`` at 98k events x 16 slots moves ~6.3 GB of HBM per
conv — the single largest traffic term of the batched forward
(replaces the per-edge access of the reference hot loop,
src/dagr/model/layers/spline_conv.py:39-47).

This kernel exploits the graph contract (ops/event_graph.py): every
neighbour of destination ``i`` lies in ``[i - lookback, i]``. For a block of
``T`` destinations the candidate window is the ``lookback + T`` preceding
rows. The gather then becomes MXU work instead of HBM traffic:

    rows[e, :] = onehot(rel[e])[w] @ window[w, :]

with the one-hot matrix BUILT IN VMEM (it never exists in HBM) and the
window DMA'd once per block. Because a one-hot matmul selects exactly one
value per output, splitting the f32 window into bf16 (hi, lo[, lo2]) parts
and summing the part-products reconstructs the f32 value to ~2^-16 relative
(2 parts, default) or exactly (3 parts) — MXU bf16 passes instead of an
f32 gather.

A per-block scalar-prefetched bound ``nsub`` (from the block's true
neighbour span) limits the one-hot width to the sub-blocks that can contain
matches; typical event streams have spans far below the worst case.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 128       # one-hot sub-block width (lanes)
_P = 128         # padded feature width


def _gather_kernel(nsub_ref, rel_ref, src_hbm, out_ref, win, sem,
                   acc, *, t_rows, k, w_total, parts):
    """rel_ref: [T, K] window-relative indices (-1 = masked).
    src_hbm: padded source table in HBM/ANY, rows [i*T, i*T + W) are the
    window of block i. out_ref: [T*K, 128] gathered rows."""
    i = pl.program_id(0)
    n_sub = nsub_ref[i]
    base = i * t_rows

    rel = rel_ref[...]                                  # [T, K]
    rel3 = jax.lax.broadcasted_iota(jnp.int32, (t_rows, k, _SUB), 2) * 0 \
        + rel[:, :, None]
    ids = jax.lax.broadcasted_iota(jnp.int32, (t_rows, k, _SUB), 2)

    def dma(slot, s):
        # sub-block s covers window rows [W - (s+1)*SUB, W - s*SUB);
        # start is always a multiple of SUB — assert it for Mosaic's
        # tile-alignment proof (bf16 tiles need it)
        w0 = pl.multiple_of(base + w_total - (s + 1) * _SUB, _SUB)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(w0, _SUB), :], win.at[slot], sem.at[slot])

    acc[...] = jnp.zeros_like(acc)
    dma(0, 0).start()

    def body(s, _):
        slot = s % 2

        @pl.when(s + 1 < n_sub)
        def _():
            dma((s + 1) % 2, s + 1).start()

        dma(slot, s).wait()
        w0 = w_total - (s + 1) * _SUB
        oh = (rel3 == ids + w0).astype(jnp.bfloat16).reshape(t_rows * k, _SUB)
        w_src = win[slot]
        if w_src.dtype == jnp.bfloat16:
            # bf16 source: the one-hot selection is exact in one pass
            out = jnp.dot(oh, w_src, preferred_element_type=jnp.float32)
        else:
            hi = w_src.astype(jnp.bfloat16)
            out = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
            if parts >= 2:
                r1 = w_src - hi.astype(jnp.float32)
                lo = r1.astype(jnp.bfloat16)
                out = out + jnp.dot(oh, lo,
                                    preferred_element_type=jnp.float32)
                if parts >= 3:
                    lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
                    out = out + jnp.dot(oh, lo2,
                                        preferred_element_type=jnp.float32)
        acc[...] += out
        return 0

    jax.lax.fori_loop(0, n_sub, body, 0)
    out_ref[...] = acc[...].astype(out_ref.dtype)


def gather_window_rows(src: jnp.ndarray,
                       nbr: jnp.ndarray,
                       nbr_mask: jnp.ndarray,
                       *,
                       lookback: int,
                       block: int = 128,
                       parts: int = 2,
                       interpret: bool = False) -> jnp.ndarray:
    """``src[nbr]`` with masked rows zeroed, for window-local ``nbr``.

    Args:
      src: ``[N, C]`` float32 source table, C <= 128.
      nbr: ``[N, K]`` int32, each ``nbr[i, k] in [i - lookback, i]``
        (the event-graph contract; out-of-window indices are clamped into
        the window and must be masked).
      nbr_mask: ``[N, K]`` bool.
      lookback: window depth; rounded up to a multiple of 128.
      parts: bf16 split depth (2 ~ 2^-16 relative error, 3 ~ exact).

    Returns ``[N, K, C]`` in ``src.dtype`` (masked slots zero). bf16
    sources gather exactly in a single matmul pass.
    """
    n, c = src.shape
    k = nbr.shape[1]
    t = block
    lb = -(-max(lookback, 1) // _SUB) * _SUB
    n_blocks = -(-n // t)
    n_pad = n_blocks * t
    w_total = lb + t
    nsub_max = w_total // _SUB

    src_pad = jnp.zeros((lb + n_pad, _P), src.dtype)
    src_pad = jax.lax.dynamic_update_slice(src_pad, src, (lb, 0))

    blk = (jnp.arange(n, dtype=jnp.int32) // t) * t
    rel = jnp.where(nbr_mask, nbr + lb - blk[:, None], -1)
    rel = jnp.pad(rel, ((0, n_pad - n), (0, 0)), constant_values=-1)

    # per-block one-hot bound from the true neighbour span
    w_min = jnp.min(jnp.where(rel >= 0, rel, w_total - 1)
                    .reshape(n_blocks, t * k), axis=1)
    nsub = jnp.clip(-(-(w_total - w_min) // _SUB), 1, nsub_max) \
        .astype(jnp.int32)

    kern = functools.partial(_gather_kernel, t_rows=t, k=k,
                             w_total=w_total, parts=parts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((t, k), lambda i, ns: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t * k, _P), lambda i, ns: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, _SUB, _P), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((t * k, _P), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad * k, _P), src.dtype),
        interpret=interpret,
    )(nsub, rel, src_pad)
    return out.reshape(n_pad, k, _P)[:n, :, :c]


def _scatter_kernel(nfwd_ref, g_hbm, nbrt_hbm, out_ref, gwin, nwin,
                    gsem, nsem, acc, *, t_rows, ek, subs_per_t):
    """Transpose of :func:`_gather_kernel`: scatter-add per-edge rows back
    to their source nodes.  Grid over T-row SOURCE blocks; inner loop over
    the destination sub-blocks that can reference this block (``nbr <= i``
    plus the per-block bound ``nfwd`` from the true forward span).

    g_hbm: [n_sub*SUB*k, 128] bf16 FLAT edge rows (edge e = dst*k + slot),
    lanes packing the hi/lo split parts side by side — one matmul
    accumulates every part, and the caller recombines part lane groups.
    nbrt_hbm: [n_sub, 8, SUB*k] absolute neighbour index per flat edge
    (row 0; rows 1-7 sublane padding), -1 for masked/padded edges."""
    i = pl.program_id(0)
    nd = nfwd_ref[i]
    base_d = i * subs_per_t
    s0 = i * t_rows

    def dma_g(slot, d):
        r0 = pl.multiple_of((base_d + d) * ek, _SUB)
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(r0, ek), :], gwin.at[slot], gsem.at[slot])

    def dma_n(slot, d):
        return pltpu.make_async_copy(
            nbrt_hbm.at[base_d + d], nwin.at[slot], nsem.at[slot])

    acc[...] = jnp.zeros_like(acc)
    dma_g(0, 0).start()
    dma_n(0, 0).start()
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_rows, ek), 0) + s0

    def body(d, _):
        slot = d % 2

        @pl.when(d + 1 < nd)
        def _():
            dma_g((d + 1) % 2, d + 1).start()
            dma_n((d + 1) % 2, d + 1).start()

        dma_g(slot, d).wait()
        dma_n(slot, d).wait()
        # oh[t, e] = 1 iff flat edge e points at source s0 + t
        oh = (iota_t == nwin[slot][0:1, :]).astype(jnp.bfloat16)
        acc[...] += jnp.dot(oh, gwin[slot],
                            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nd, body, 0)
    out_ref[...] = acc[...]


def scatter_window_rows(g: jnp.ndarray,
                        nbr: jnp.ndarray,
                        nbr_mask: jnp.ndarray,
                        n_src: int,
                        *,
                        block: int = 256,
                        parts: int = 2,
                        out_dtype=jnp.float32,
                        interpret: bool = False) -> jnp.ndarray:
    """``zeros([n_src, C]).at[nbr].add(where(mask, g, 0))`` for window-local
    ``nbr`` — the transpose of :func:`gather_window_rows` and the VJP of the
    level-0 conv's neighbour fetch.  An XLA scatter-add over N*K edge rows
    dominates the detector's backward pass (~20 ms per conv block at 98k
    events); here each source block accumulates its incoming edges as
    one-hot MXU matmuls over the bounded forward window (``nbr[i, k] <= i``
    means only destinations in ``[s0, s0 + T + span)`` can contribute).

    The f32 cotangent is split into bf16 parts in XLA (bandwidth-bound
    pass, fuses with the lane pad) and the parts ride SIDE BY SIDE in the
    128 lanes of one flat edge row: a single one-hot matmul scatters every
    part at once and the part sums are recombined lane-wise afterwards —
    requires ``parts * C <= 128``.

    Args:
      g: ``[N_dst, K, C]`` per-edge cotangent rows (f32 or bf16).
      nbr: ``[N_dst, K]`` int32 absolute source index, ``nbr[i, k] <= i``.
      nbr_mask: ``[N_dst, K]`` bool.
      n_src: source-table row count.
      parts: bf16 split depth of the f32 cotangent (2 ~ 2^-16 relative).

    Returns ``[n_src, C]`` in ``out_dtype``.
    """
    n_dst, k, c = g.shape
    t = block
    assert t % _SUB == 0
    if g.dtype == jnp.bfloat16:
        parts = 1
    assert parts * c <= _P, (parts, c)
    subs_per_t = t // _SUB
    n_src_blocks = -(-n_src // t)
    n_sub = max(-(-n_dst // _SUB), n_src_blocks * subs_per_t)
    n_dst_pad = n_sub * _SUB
    # k padded to the bf16 sublane tile: [N, K16, 128] -> [N*K16, 128] is
    # then tile-compatible, so the flat reshape is a free bitcast instead
    # of a 377 MB merge pass
    k_eff = -(-k // 16) * 16
    ek = _SUB * k_eff

    # masked / padded edges get nbr = -1: they can never match a one-hot
    # row, so the mask never touches the (fat) grad operand
    nbr_eff = jnp.where(nbr_mask, nbr, -1)
    nbr_eff = jnp.pad(nbr_eff, ((0, n_dst_pad - n_dst), (0, k_eff - k)),
                      constant_values=-1)
    nbrt = jnp.pad(nbr_eff.reshape(n_sub, 1, ek), ((0, 0), (0, 7), (0, 0)),
                   constant_values=-1)

    if g.dtype == jnp.bfloat16:
        gparts = [g]
    else:
        # reduce_precision, NOT astype round-trips: XLA elides
        # f32->bf16->f32 conversion pairs (excess-precision folding), which
        # silently zeroes the lo parts
        hi_f = jax.lax.reduce_precision(g, 8, 7)
        gparts = [hi_f.astype(jnp.bfloat16)]
        if parts >= 2:
            r1 = g - hi_f
            lo_f = jax.lax.reduce_precision(r1, 8, 7)
            gparts.append(lo_f.astype(jnp.bfloat16))
            if parts >= 3:
                gparts.append((r1 - lo_f).astype(jnp.bfloat16))
    # split/concat/pad while still [N, K, *] (elementwise + lane ops fuse
    # into the one materialization pass); the flat reshape comes last
    g_pack = jnp.concatenate(gparts, axis=-1)
    g_pack = jnp.pad(g_pack, ((0, n_dst_pad - n_dst), (0, k_eff - k),
                              (0, _P - parts * c)))
    g_pack = g_pack.reshape(n_dst_pad * k_eff, _P)

    # per-source-block destination scan bound from the true forward span
    big = jnp.int32(2 ** 30)
    mval = jnp.min(jnp.where(nbr_eff >= 0, nbr_eff, big)
                   .reshape(n_sub, ek), axis=1)
    d_idx = jnp.arange(n_sub, dtype=jnp.int32)
    s_arr = jnp.arange(n_src_blocks, dtype=jnp.int32)
    ds0 = s_arr * subs_per_t
    cond = (mval[None, :] < (s_arr[:, None] + 1) * t) \
        & (d_idx[None, :] >= ds0[:, None])
    dlast = jnp.max(jnp.where(cond, d_idx[None, :], ds0[:, None]), axis=1)
    nfwd = jnp.clip(dlast - ds0 + 1, 1, n_sub - ds0).astype(jnp.int32)

    kern = functools.partial(_scatter_kernel, t_rows=t, ek=ek,
                             subs_per_t=subs_per_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_src_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t, _P), lambda i, ns: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ek, _P), jnp.bfloat16),
            pltpu.VMEM((2, 8, ek), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((t, _P), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_src_blocks * t, _P), jnp.float32),
        interpret=interpret,
    )(nfwd, g_pack, nbrt)
    res = out[:n_src, :c]
    for p in range(1, parts):
        res = res + out[:n_src, p * c:(p + 1) * c]
    return res.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gather_window_diff(src, nbr, nbr_mask, lookback, interpret=False,
                        parts=2):
    return gather_window_rows(src, nbr, nbr_mask, lookback=lookback,
                              interpret=interpret, parts=parts)


def _gather_window_fwd(src, nbr, nbr_mask, lookback, interpret=False,
                       parts=2):
    out = gather_window_rows(src, nbr, nbr_mask, lookback=lookback,
                             interpret=interpret, parts=parts)
    return out, (nbr, nbr_mask, jax.ShapeDtypeStruct(src.shape, src.dtype))


def _gather_window_bwd(lookback, interpret, parts, res, g):
    # the gather is linear in src: transpose = masked row scatter-add
    # (pallas_call has no autodiff rule; the detector trains THROUGH the
    # backbone, unlike the frozen-DAGR anomaly path).  An XLA scatter-add
    # costs ~20 ms per conv block at event scale — the windowed Pallas
    # scatter exploits the same ``nbr[i, k] in [i - lookback, i]`` contract
    # as the forward.
    nbr, nbr_mask, src_sds = res
    bwd_parts = 1 if g.dtype == jnp.bfloat16 else max(parts, 2)
    if (interpret or jax.default_backend() == "tpu") \
            and g.dtype in (jnp.float32, jnp.bfloat16) \
            and bwd_parts * g.shape[-1] <= _P:
        d_src = scatter_window_rows(
            g, nbr, nbr_mask, src_sds.shape[0], parts=max(parts, 2),
            out_dtype=src_sds.dtype, interpret=interpret)
        return d_src, None, None
    gm = jnp.where(nbr_mask[..., None], g, 0).astype(src_sds.dtype)
    d_src = jnp.zeros(src_sds.shape, src_sds.dtype).at[nbr].add(gm)
    return d_src, None, None


_gather_window_diff.defvjp(_gather_window_fwd, _gather_window_bwd)


def gather_rows_auto(src, nbr, nbr_mask, *, lookback: int = 0,
                     parts: int = 2):
    """Dispatch: windowed Pallas kernel on TPU when a window contract is
    declared (lookback > 0), plain XLA gather otherwise. Differentiable in
    ``src`` (custom VJP — the transpose is a masked row scatter-add).
    ``parts=3`` makes the f32 reconstruction exact — required when exact
    values (e.g. positions feeding floor-based cell assignment) ride the
    gathered row."""
    if (lookback > 0 and src.dtype in (jnp.float32, jnp.bfloat16)
            and jax.default_backend() == "tpu"):
        return _gather_window_diff(src, nbr, nbr_mask, lookback, False,
                                   parts)
    return jnp.where(nbr_mask[..., None], src[nbr], 0.0)

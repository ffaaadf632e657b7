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
    # backbone, unlike the frozen-DAGR anomaly path)
    nbr, nbr_mask, src_sds = res
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

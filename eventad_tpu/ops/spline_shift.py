"""Pooled-level fused spline conv: shift-sliced windows, statically pruned
taps (Pallas TPU kernel).

At pooled levels the neighbour table is pure arithmetic: slot ``s`` of cell
``(b, cy, cx)`` is cell ``(b, cy+oy, cx+ox)`` with ``(oy, ox) = (s//side -
span, s%side - span)`` (ops/pooling.pool_graph builds it exactly so;
reference analog: the dedup'd cluster edges of
src/dagr/model/layers/pooling.py:58-64 always land within +-span cells).
Two structural facts make a much leaner kernel than the generic windowed
one-hot gather of ops/spline_fused.py:

* **The gather is a constant flat shift.**  Neighbour ``s`` of destination
  row ``n`` is row ``n + oy*nx + ox`` of the SAME table (row-wrap /
  cross-item reads are masked edges).  Inside the kernel the neighbour
  block is a STATIC lane slice of the DMA'd window — no one-hot compares,
  no gather matmuls.

* **The (slot, tap) coefficient matrix is statically sparse.**  Pooled
  positions are pixel-rounded means confined to their cell
  (pooling.py:47-49 semantics), so slot ``s``'s Cartesian attr lives within
  +-(1 cell + 1px) of its nominal grid offset; the bilinear spline basis of
  that band touches a static ~3-tap window per axis instead of all
  ``kernel_size`` taps (:func:`tap_windows`).  The z-contraction — the VPU
  floor of the pooled conv — shrinks ~2.8x (625 -> ~225 FMA rows for a 5x5
  kernel at span 2).

The kernel also runs the whole block tail (root matmul, eval-BN affine,
optional linear skip + skip-BN, activation, node mask) in VMEM, emitting
the finished bf16 block output (reference conv.py:10-72 ConvBlock /
ConvBlockWithSkip).  bf16 inference only; training/CPU use the XLA
formulation in ops/spline_conv.py (tested against it in
tests/test_spline_shift.py).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spline_basis import ACTS, axis_weights

_SUB = 128


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


@functools.lru_cache(maxsize=None)
def tap_windows(grid: tuple, span: int, cart_max: float, width: int,
                height: int, kernel_size: int):
    """Static per-slot spline-tap windows from the pooled-graph geometry.

    For slot offset ``o`` (cells) on an axis with ``ncells`` cells over
    ``full_px`` pixels, the edge attr is ``(pos_dst - pos_src)/(2*cart_max)
    + 0.5`` where both positions are pixel-rounded means inside their cell
    (+1px rounding slack), so ``dx in (-o*cw - cw - m, -o*cw + cw + m)``
    with ``cw = 1/ncells``, ``m = 2/full_px``.  The bilinear basis of that
    band touches taps ``[floor(u_lo) .. floor(u_hi)+1]`` only.

    Returns ``((x_lo, x_hi), (y_lo, y_hi))`` inclusive tap bounds per slot,
    slot order matching models/graph.neighbor_rows.
    """
    nx, ny = grid
    side = 2 * span + 1
    ks = kernel_size

    def axis_win(o: int, ncells: int, full_px: int):
        cw = 1.0 / ncells
        m = 2.0 / full_px
        lo, hi = [], []
        for d in (-o * cw - cw - m, -o * cw + cw + m):
            a = min(max(d / (2.0 * cart_max) + 0.5, 0.0), 1.0)
            u = a * (ks - 1)
            lo.append(u)
        u_lo, u_hi = min(lo), max(lo)
        i_lo = min(max(int(math.floor(u_lo)), 0), ks - 2)
        i_hi = min(max(int(math.floor(u_hi)), 0), ks - 2)
        return (i_lo, i_hi + 1)

    wins = []
    for s in range(side * side):
        oy, ox = s // side - span, s % side - span
        wins.append((axis_win(ox, nx, width), axis_win(oy, ny, height)))
    return tuple(wins)


class ShiftPrep(NamedTuple):
    """Source-independent operands, shared by both conv blocks of a layer."""
    uxq: jnp.ndarray       # [S, n_pad] f32 spline x-coordinates
    uyq: jnp.ndarray       # [S, n_pad]
    mq: jnp.ndarray        # [S, n_pad] f32 edge mask (0/1)
    nodeq: jnp.ndarray     # [1, n_pad] f32 node mask
    n: int
    t: int
    lb: int                # window pad columns (>= halo, 128-multiple)
    d_offs: Tuple[int, ...]       # per-slot flat row offset oy*nx+ox
    tap_wins: tuple               # per-slot ((x_lo,x_hi),(y_lo,y_hi))


def prepare_shift(u: jnp.ndarray, nbr_mask: jnp.ndarray,
                  node_mask: jnp.ndarray, *, grid: tuple, span: int,
                  cart_max: float, width: int, height: int,
                  kernel_size: int, block: int = 256) -> ShiftPrep:
    """u: ``[N, S, 2]`` f32 spline coords ``clip(attr,0,1)*(ks-1)`` in
    neighbor_rows slot order; N = batch_size * ny * nx."""
    nx, ny = grid
    side = 2 * span + 1
    s_slots = side * side
    n = u.shape[0]
    t = min(block, -(-n // _SUB) * _SUB)
    n_pad = -(-n // t) * t
    halo = span * nx + span
    lb = -(-halo // _SUB) * _SUB

    def packT(a, fill):
        ap = jnp.pad(a.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                     constant_values=fill)
        return ap.T

    uxq = packT(u[..., 0], 0.0)
    uyq = packT(u[..., 1], 0.0)
    mq = packT(nbr_mask, False)
    nodeq = jnp.pad(node_mask.astype(jnp.float32), (0, n_pad - n))[None]
    d_offs = tuple(
        (s // side - span) * nx + (s % side - span) for s in range(s_slots))
    wins = tap_windows((nx, ny), span, cart_max, width, height, kernel_size)
    return ShiftPrep(uxq, uyq, mq, nodeq, n, t, lb, d_offs, wins)


def _shift_kernel(uxq_ref, uyq_ref, mq_ref, nodeq_ref, srcT_hbm, wT_ref,
                  rT_ref, ab_ref, *rest, t, ks, c8, lb, w_chunks, d_offs,
                  tap_slots, act, has_skip):
    """One conv block over shift-sliced windows.

    tap_slots: static tuple over taps ``(my*ks + mx within the used
    sub-rectangle order of wT)`` of (my, mx, slot tuple)."""
    if has_skip:
        xo_ref, skT_ref, out_ref, win, sem, xjT = rest
    else:
        xo_ref = skT_ref = None
        out_ref, win, sem, xjT = rest
    i = pl.program_id(0)
    base_chunk = i * (t // _SUB)

    for j in range(w_chunks):
        pltpu.make_async_copy(srcT_hbm.at[base_chunk + j], win.at[j],
                              sem.at[j]).start()
    for j in range(w_chunks):
        pltpu.make_async_copy(srcT_hbm.at[base_chunk + j], win.at[j],
                              sem.at[j]).wait()
    xwin = jnp.concatenate([win[j] for j in range(w_chunks)], axis=1)

    # neighbour blocks: static lane slices of the window (f32 once)
    for k, d in enumerate(d_offs):
        xjT[k] = xwin[:, lb + d:lb + d + t].astype(jnp.float32)

    cxs, cys = axis_weights(uxq_ref[...], uyq_ref[...], ks)
    mqv = mq_ref[...]
    # edge mask folds into the x-axis factor once
    cxs = [c * mqv for c in cxs]

    acc = jnp.zeros((out_ref.shape[0], t), jnp.float32)
    for mi, (my, mx, slots) in enumerate(tap_slots):
        cm = cys[my] * cxs[mx]
        z = jnp.zeros((c8, t), jnp.float32)
        for k in slots:
            z += cm[k:k + 1, :] * xjT[k]
        acc += jnp.dot(wT_ref[mi], z.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    # root matmul on the own columns + folded eval-BN affine (+ skip) +
    # activation + node mask, all in VMEM
    own = xwin[:, lb:lb + t]
    acc += jnp.dot(rT_ref[...], own, preferred_element_type=jnp.float32)
    pre = acc * ab_ref[:, 0:1] + ab_ref[:, 1:2]
    if has_skip:
        skip = jnp.dot(skT_ref[...], xo_ref[...],
                       preferred_element_type=jnp.float32)
        pre = pre + skip * ab_ref[:, 2:3] + ab_ref[:, 3:4]
    out_ref[...] = (ACTS[act](pre) * nodeq_ref[...]).astype(out_ref.dtype)


def shift_spline_conv(src: jnp.ndarray, prep: ShiftPrep,
                      weight: jnp.ndarray, root: jnp.ndarray,
                      a: jnp.ndarray, b: jnp.ndarray, *,
                      kernel_size: int, act: Optional[str],
                      skip: Optional[tuple] = None,
                      out_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jnp.ndarray:
    """One pooled-level conv block, epilogue included.

    Computes ``act(a * (spline_conv(src) + src@root) + b [+ a_s *
    (x_skip@skip_lin) + b_s]) * node_mask`` where ``a``/``b`` is the folded
    eval-BN affine (conv bias pre-folded into ``b`` by the caller) and
    ``skip = (x_skip [N, Cx], skip_lin [Cx, O], a_s, b_s)`` adds the
    ConvBlockWithSkip linear branch (reference conv.py:34-56).

    src: ``[N, C]`` cell table in grid order; masked rows must be zero.
    weight: ``[ks*ks, C, O]``.  Returns ``[N, O]`` in ``out_dtype``.
    """
    n, c = src.shape
    assert n == prep.n
    ks = kernel_size
    cout = weight.shape[-1]
    c8 = _pad8(c)
    o8 = _pad8(cout)
    t = prep.t
    n_pad = prep.uxq.shape[1]
    n_blocks = n_pad // t
    lb = prep.lb
    w_total = lb + t + lb
    w_chunks = w_total // _SUB

    # transposed chunked source with lb zero pad on both sides
    srcT = jnp.zeros((c8, lb + n_pad + lb), jnp.bfloat16)
    srcT = jax.lax.dynamic_update_slice(
        srcT, src.astype(jnp.bfloat16).T, (0, lb))
    srcT = srcT.reshape(c8, -1, _SUB).transpose(1, 0, 2)

    # static (tap -> contributing slots) sets; taps with no slots vanish
    tap_slots = []
    for my in range(ks):
        for mx in range(ks):
            slots = tuple(
                k for k, ((xl, xh), (yl, yh)) in enumerate(prep.tap_wins)
                if xl <= mx <= xh and yl <= my <= yh)
            if slots:
                tap_slots.append((my, mx, slots))
    tap_slots = tuple(tap_slots)

    wT = jnp.zeros((len(tap_slots), o8, c8), jnp.bfloat16)
    w_sel = weight[jnp.asarray([my * ks + mx for my, mx, _ in tap_slots])]
    wT = jax.lax.dynamic_update_slice(
        wT, w_sel.astype(jnp.bfloat16).transpose(0, 2, 1), (0, 0, 0))
    rT = jnp.zeros((o8, c8), jnp.bfloat16)
    rT = jax.lax.dynamic_update_slice(rT, root.astype(jnp.bfloat16).T,
                                      (0, 0))

    has_skip = skip is not None
    ab_cols = []
    if has_skip:
        x_skip, skip_lin, a_s, b_s = skip
        cx8 = _pad8(x_skip.shape[1])
        xoT = jnp.zeros((cx8, n_pad), jnp.bfloat16)
        xoT = jax.lax.dynamic_update_slice(
            xoT, x_skip.astype(jnp.bfloat16).T, (0, 0))
        skT = jnp.zeros((o8, cx8), jnp.bfloat16)
        skT = jax.lax.dynamic_update_slice(
            skT, skip_lin.astype(jnp.bfloat16).T, (0, 0))
        ab_cols = [a_s, b_s]
    ab = jnp.zeros((o8, 4), jnp.float32)
    ab = jax.lax.dynamic_update_slice(
        ab, jnp.stack([a, b] + ab_cols, axis=1).astype(jnp.float32), (0, 0))

    kern = functools.partial(
        _shift_kernel, t=t, ks=ks, c8=c8, lb=lb, w_chunks=w_chunks,
        d_offs=prep.d_offs, tap_slots=tap_slots, act=act,
        has_skip=has_skip)
    s_slots = len(prep.d_offs)
    in_specs = [
        pl.BlockSpec((s_slots, t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s_slots, t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s_slots, t), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((len(tap_slots), o8, c8), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((o8, c8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((o8, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [prep.uxq, prep.uyq, prep.mq, prep.nodeq, srcT, wT, rT, ab]
    if has_skip:
        in_specs += [
            pl.BlockSpec((cx8, t), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o8, cx8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [xoT, skT]
    outT = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((o8, t), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((o8, n_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((w_chunks, c8, _SUB), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((w_chunks,)),
            pltpu.VMEM((s_slots, c8, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return outT[:cout, :prep.n].T

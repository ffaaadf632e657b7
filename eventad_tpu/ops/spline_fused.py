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

from .spline_basis import ACTS, axis_weights

_SUB = 128      # window chunk (events per DMA)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _fused_kernel(nsub_ref, kmax_ref, relq_ref, uxq_ref, uyq_ref, srcT_hbm,
                  wT_ref, out_ref, win, sem, xjT, *, t, k, ks, c8,
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
    km = kmax_ref[i]        # slots >= km have no edge in this block
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
        for kk in range(k):
            @pl.when(kk < km)
            def _(kk=kk):
                oh = (rel3[kk] == w_iota[0] + w0).astype(jnp.bfloat16)
                xjT[kk] += jnp.dot(win_b, oh,
                                   preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_sub, sub_body, 0)

    # ---- spline basis for all slots at once ([K, t] dense lanes) ----
    cxs, cys = axis_weights(uxq_ref[...], uyq_ref[...], ks,
                            mx0=mx0, my0=my0, nxs=nxs, nys=nys)

    # ---- z-contraction + kernel matmul: [1, t] coefficient rows
    # broadcast over the C8 sublanes; the slot loop runs only to the
    # block's top-slot bound km (xjT rows above it are exact zeros) ----
    # (a km-bounded dynamic fori here was tried and measured SLOWER —
    # 30 tiny dynamic loops' overhead exceeds the saved FMAs; the static
    # unrolled form pipelines better)
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
    kmax: jnp.ndarray    # [n_blocks] per-block top-slot bound (see below)
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
    # per-block top-SLOT bound: slots >= kmax have no edge anywhere in the
    # block, so their one-hot build + gather matmuls are provably zero and
    # the kernels skip them (orthogonal to the temporal span bound nsub —
    # delta_t-sparse streams fill ~2 of 15 slots at the benchmark
    # operating point, measured mean 0.15 neighbours/event)
    usedk = jnp.pad(rel >= 0, ((0, n_pad - n), (0, 0)))
    per_block = usedk.reshape(n_blocks, t, kk).any(axis=1)   # [n_blocks, K]
    kmax = (per_block * jnp.arange(1, kk + 1, dtype=jnp.int32)) \
        .max(axis=1).astype(jnp.int32)
    return FusedPrep(nsub, kmax, relq, uxq, uyq, n, t, lb, lf, w_total)


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
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((kk, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((m_sub, o8, c8), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((o8, t), lambda i, *_: (0, i)),
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
    )(prep.nsub, prep.kmax, prep.relq, prep.uxq, prep.uyq, srcT, wT)
    return outT[:cout, :n].T


# ---------------------------------------------------------------------------
# Two-block fused layer kernel (level 0): conv1 -> BN -> act -> conv2 in one
# pass, sharing the one-hot compare between the blocks.
# ---------------------------------------------------------------------------

def _fused2_kernel(nsub_ref, kmax_ref, relq_ref, uxq_ref, uyq_ref, mask_ref,
                   srcT_hbm, w1T_ref, r1T_ref, ab1_ref, w2T_ref, r2T_ref,
                   *rest, t, k, ks, nxs, nys, mx0, my0, w_total, act, epi):
    """Two spline-conv blocks over one shared neighbour window.

    Requires lookahead == 0 (level-0 graph contract: edges point old->new),
    so every h row block2 needs is either produced in this grid step or was
    written to ``h_hbm`` by an earlier (sequential) step.  The one-hot
    columns of the two gathers are identical, so the compare — the dominant
    VPU cost of the single-block kernel — is built once.
    """
    if epi:
        (skT_ref, ab2_ref, out_ref, h_hbm,
         win, sem, winh, semh, hck, semw, ohs, xjT1, xjT2, xownT) = rest
    else:
        skT_ref = ab2_ref = None
        (out_ref, h_hbm,
         win, sem, winh, semh, hck, semw, ohs, xjT1, xjT2, xownT) = rest
    i = pl.program_id(0)
    own = t // _SUB
    # root1 consumes ALL own rows, so the window floor is the own chunks
    # even when the true neighbour span is smaller
    n_sub = jnp.maximum(nsub_ref[i], own)
    # per-block top-slot bound: slots >= km have no edge in this block —
    # their one-hot compares and gather matmuls are skipped (the xjT
    # scratches are zero-initialized, so skipping contributes exact zeros)
    km = kmax_ref[i]
    base_chunk = i * own

    def dma_x(slot, s):
        ci = base_chunk + (w_total // _SUB) - 1 - s
        return pltpu.make_async_copy(
            srcT_hbm.at[ci], win.at[slot], sem.at[slot])

    def dma_h(slot, s):
        ci = base_chunk + (w_total // _SUB) - 1 - s
        return pltpu.make_async_copy(
            h_hbm.at[ci], winh.at[slot], semh.at[slot])

    xjT1[...] = jnp.zeros_like(xjT1)
    xjT2[...] = jnp.zeros_like(xjT2)
    dma_x(0, 0).start()

    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _SUB, t), 1)
    rel3 = relq_ref[...].reshape(k, 1, t)

    # ---- own chunks (static s: lane-sliced stores need static offsets) ----
    for s in range(own):
        @pl.when(s + 1 < n_sub)
        def _():
            dma_x((s + 1) % 2, s + 1).start()

        @pl.when(s < n_sub)
        def _():
            dma_x(s % 2, s).wait()
            w0 = w_total - (s + 1) * _SUB
            win_b = win[s % 2]
            xownT[:, t - (s + 1) * _SUB:t - s * _SUB] = win_b
            for kk in range(k):
                @pl.when(kk < km)
                def _(kk=kk):
                    oh = (rel3[kk] == w_iota[0] + w0).astype(jnp.bfloat16)
                    ohs[s, kk] = oh
                    xjT1[kk] += jnp.dot(win_b, oh,
                                        preferred_element_type=jnp.float32)

    # ---- older chunks: x and h windows ride the same one-hot ----
    @pl.when(own < n_sub)
    def _():
        dma_h(own % 2, own).start()

    def older_body(s, _):
        @pl.when(s + 1 < n_sub)
        def _():
            dma_x((s + 1) % 2, s + 1).start()
            dma_h((s + 1) % 2, s + 1).start()

        dma_x(s % 2, s).wait()
        dma_h(s % 2, s).wait()
        w0 = w_total - (s + 1) * _SUB
        win_b = win[s % 2]
        winh_b = winh[s % 2]
        for kk in range(k):
            @pl.when(kk < km)
            def _(kk=kk):
                oh = (rel3[kk] == w_iota[0] + w0).astype(jnp.bfloat16)
                xjT1[kk] += jnp.dot(win_b, oh,
                                    preferred_element_type=jnp.float32)
                xjT2[kk] += jnp.dot(winh_b, oh,
                                    preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(own, n_sub, older_body, 0)

    # ---- spline basis (shared by both blocks) ----
    cxs, cys = axis_weights(uxq_ref[...], uyq_ref[...], ks,
                            mx0=mx0, my0=my0, nxs=nxs, nys=nys)

    def taps(xj_ref, wT_ref, o8):
        # static unrolled slot loop: a km-bounded dynamic fori was tried
        # and measured SLOWER (30 tiny dynamic loops' overhead exceeds the
        # saved FMAs); the window gather above IS km-bounded, so xj rows
        # beyond the block's top slot are exact zeros here
        cdim = xj_ref.shape[1]
        acc = jnp.zeros((o8, t), jnp.float32)
        for my in range(nys):
            for mx in range(nxs):
                cm = cys[my] * cxs[mx]
                z = jnp.zeros((cdim, t), jnp.float32)
                for kk in range(k):
                    z += cm[kk:kk + 1, :] * xj_ref[kk]
                acc += jnp.dot(wT_ref[my * nxs + mx],
                               z.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        return acc

    # ---- block 1: conv + root + BN affine + act, all in VMEM ----
    acc1 = taps(xjT1, w1T_ref, r1T_ref.shape[0])
    acc1 += jnp.dot(r1T_ref[...], xownT[...],
                    preferred_element_type=jnp.float32)
    a1 = ab1_ref[:, 0:1]
    b1 = ab1_ref[:, 1:2]
    hh = ACTS[act](acc1 * a1 + b1) * mask_ref[...]
    hh_bf = hh.astype(jnp.bfloat16)

    # publish h chunks (next grid steps read them as block2's window)
    for j in range(own):
        hck[j] = hh_bf[:, j * _SUB:(j + 1) * _SUB]
        pltpu.make_async_copy(
            hck.at[j], h_hbm.at[base_chunk + (w_total - t) // _SUB + j],
            semw.at[j]).start()

    # deferred own-chunk h gather through the stored one-hots (the same
    # slot predicate: ohs rows above km were never written)
    for s in range(own):
        @pl.when(s < n_sub)
        def _(s=s):
            j = own - 1 - s
            hw = hh_bf[:, j * _SUB:(j + 1) * _SUB]
            for kk in range(k):
                @pl.when(kk < km)
                def _(kk=kk):
                    xjT2[kk] += jnp.dot(hw, ohs[s, kk],
                                        preferred_element_type=jnp.float32)

    # ---- block 2: conv + root ----
    acc2 = taps(xjT2, w2T_ref, out_ref.shape[0])
    acc2 += jnp.dot(r2T_ref[...], hh_bf,
                    preferred_element_type=jnp.float32)
    if epi:
        # full layer tail in VMEM: skip = x_in @ skip_lin rides the own
        # window already resident as xownT; BN2 / skip-BN are folded eval
        # affines (biases folded by the caller); one activation + mask,
        # emitted bf16 — the [N, O] f32 intermediate never exists in HBM
        skip = jnp.dot(skT_ref[...], xownT[...],
                       preferred_element_type=jnp.float32)
        pre = (acc2 * ab2_ref[:, 0:1] + ab2_ref[:, 1:2]
               + skip * ab2_ref[:, 2:3] + ab2_ref[:, 3:4])
        out_ref[...] = (ACTS[act](pre) * mask_ref[...]) \
            .astype(out_ref.dtype)
    else:
        out_ref[...] = acc2

    for j in range(own):
        pltpu.make_async_copy(
            hck.at[j], h_hbm.at[base_chunk + (w_total - t) // _SUB + j],
            semw.at[j]).wait()


def fused_two_block_prepared(src: jnp.ndarray, prep: FusedPrep,
                             w1: jnp.ndarray, root1: jnp.ndarray,
                             a1: jnp.ndarray, b1: jnp.ndarray,
                             w2: jnp.ndarray, root2: jnp.ndarray,
                             node_mask: jnp.ndarray,
                             *, kernel_size: int, ranges, act: str = "relu",
                             epilogue=None,
                             interpret: bool = False):
    """Both conv blocks of a level-0 layer in one kernel.

    Computes ``h = act(bn1(conv1(src) + src@root1))`` (``a1``/``b1`` the
    folded eval-BN affine, any conv bias folded into ``b1`` by the caller)
    and returns ``(out2, h)`` where ``out2[n, o] = conv2(h) + h @ root2``
    (f32; caller adds bias2/BN2/skip/act) and ``h`` is ``[N, C1]`` bf16.

    With ``epilogue=(skip_lin, a2, b2, a_s, b_s)`` the WHOLE layer tail runs
    in the kernel instead (reference conv.py:59-72 ConvBlockWithSkip):
    ``out2 = act(a2*raw2 + b2 + a_s*(src @ skip_lin) + b_s) * node_mask``
    where ``a*/b*`` are the folded eval-BN affines of block 2 and the skip
    branch (conv2 bias / skip bias pre-folded into ``b2``/``b_s`` by the
    caller).  ``out2`` is then bfloat16 — the raw f32 layer intermediate
    never reaches HBM.

    Requires ``prep.lf == 0`` (level-0 window contract).
    """
    assert prep.lf == 0, "two-block fusion needs lookahead == 0"
    n, c = src.shape
    assert n == prep.n
    kk = prep.relq.shape[0]
    ks = kernel_size
    (mx0, mx1), (my0, my1) = ranges
    nxs, nys = mx1 - mx0 + 1, my1 - my0 + 1
    m_sub = nxs * nys
    c1 = w2.shape[1]
    cout = w2.shape[-1]
    c8 = _pad8(c)
    c18 = _pad8(c1)
    o8 = _pad8(cout)
    t = prep.t
    n_pad = prep.relq.shape[1]
    n_blocks = n_pad // t
    w_total = prep.w_total

    srcT = jnp.zeros((c8, prep.lb + n_pad), jnp.bfloat16)
    srcT = jax.lax.dynamic_update_slice(
        srcT, src.astype(jnp.bfloat16).T, (0, prep.lb))
    srcT = srcT.reshape(c8, -1, _SUB).transpose(1, 0, 2)

    from .spline_conv import sub_kernel_index
    sub = sub_kernel_index(ks, ranges)

    def packw(w, ci8, co8):
        ws = w[sub].astype(jnp.bfloat16)              # [m_sub, Ci, Co]
        out = jnp.zeros((m_sub, co8, ci8), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(out, ws.transpose(0, 2, 1),
                                            (0, 0, 0))

    w1T = packw(w1, c8, c18)
    w2T = packw(w2, c18, o8)

    def packr(r, ci8, co8):
        out = jnp.zeros((co8, ci8), jnp.bfloat16)
        return jax.lax.dynamic_update_slice(
            out, r.astype(jnp.bfloat16).T, (0, 0))

    r1T = packr(root1, c8, c18)
    r2T = packr(root2, c18, o8)

    ab1 = jnp.zeros((c18, 2), jnp.float32)
    ab1 = jax.lax.dynamic_update_slice(
        ab1, jnp.stack([a1, b1], axis=1).astype(jnp.float32), (0, 0))

    maskf = jnp.pad(node_mask.astype(jnp.float32), (0, n_pad - n))[None]

    epi = epilogue is not None
    extra_in, extra_specs = [], []
    if epi:
        skip_lin, a2, b2, a_s, b_s = epilogue
        skT = packr(skip_lin, c8, o8)
        ab2 = jnp.zeros((o8, 4), jnp.float32)
        ab2 = jax.lax.dynamic_update_slice(
            ab2, jnp.stack([a2, b2, a_s, b_s], axis=1).astype(jnp.float32),
            (0, 0))
        extra_in = [skT, ab2]
        extra_specs = [
            pl.BlockSpec((o8, c8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o8, 4), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kern = functools.partial(
        _fused2_kernel, t=t, k=kk, ks=ks, nxs=nxs, nys=nys,
        mx0=mx0, my0=my0, w_total=w_total, act=act, epi=epi)
    own = t // _SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((kk, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((m_sub, c18, c8), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c18, c8), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c18, 2), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_sub, o8, c18), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o8, c18), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=[
            pl.BlockSpec((o8, t), lambda i, *_: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c8, _SUB), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, c18, _SUB), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((own, c18, _SUB), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((own,)),
            pltpu.VMEM((own, kk, _SUB, t), jnp.bfloat16),
            pltpu.VMEM((kk, c8, t), jnp.float32),
            pltpu.VMEM((kk, c18, t), jnp.float32),
            pltpu.VMEM((c8, t), jnp.bfloat16),
        ],
    )
    outT, hck = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((o8, n_pad),
                                 jnp.bfloat16 if epi else jnp.float32),
            jax.ShapeDtypeStruct(((prep.lb + n_pad) // _SUB, c18, _SUB),
                                 jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prep.nsub, prep.kmax, prep.relq, prep.uxq, prep.uyq, maskf, srcT,
      w1T, r1T, ab1, w2T, r2T, *extra_in)
    h = hck.transpose(1, 0, 2).reshape(c18, -1)[:c1, prep.lb:prep.lb + n].T
    return outT[:cout, :n].T, h


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

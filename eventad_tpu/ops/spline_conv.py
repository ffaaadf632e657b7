"""Spline convolution over fixed-K neighbour tables.

Replaces the reference's ``MySplineConv`` LUT fast path
(src/dagr/model/layers/spline_conv.py:9-78). Rather than gathering a per-edge
``[Cin, Cout]`` kernel from a LUT and running a per-edge einsum (the CUDA-era
formulation), we exploit that every edge touches at most 4 of the
``kernel_size**2`` kernel slots (degree-1 spline):

    z[n, m, c]  = sum_k coeff[n, k, m] * x[nbr[n, k], c]     (VPU/MXU batched)
    out[n, o]   = z[n, :, :].reshape(M*Cin) @ W[M*Cin, Cout]  (one MXU matmul)

which is mathematically identical to SplineConv (and to the LUT path when
pseudo-coordinates are quantized pixel offsets) but keeps the FLOPs in one
large dense matmul.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spline import spline_basis


class SplineConvParams(NamedTuple):
    weight: jnp.ndarray          # [K*K, Cin, Cout]
    root: Optional[jnp.ndarray]  # [Cin, Cout] (PyG root lin, bias-free)
    bias: Optional[jnp.ndarray]  # [Cout] or None


def init_spline_conv(key, in_channels: int, out_channels: int,
                     kernel_size: int, root_weight: bool = True,
                     bias: bool = False, dtype=jnp.float32) -> SplineConvParams:
    """PyG SplineConv init: weight ~ U(-s, s) with s = 1/sqrt(Cin * kernel
    support size) (torch 'size' uniform init); root lin uses the same."""
    k1, k2, k3 = jax.random.split(key, 3)
    m = kernel_size * kernel_size
    s = 1.0 / (in_channels * m) ** 0.5
    weight = jax.random.uniform(k1, (m, in_channels, out_channels),
                                minval=-s, maxval=s, dtype=dtype)
    root = None
    if root_weight:
        sr = 1.0 / in_channels ** 0.5
        root = jax.random.uniform(k2, (in_channels, out_channels),
                                  minval=-sr, maxval=sr, dtype=dtype)
    b = jnp.zeros((out_channels,), dtype=dtype) if bias else None
    return SplineConvParams(weight, root, b)


def cartesian_attr(pos: jnp.ndarray, nbr: jnp.ndarray, nbr_mask: jnp.ndarray,
                   max_value: float, clamp: bool = True,
                   pos_dst: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pseudo-coordinates of each (dst, slot) edge: PyG ``T.Cartesian``
    (norm=True, cat=False) computes ``(pos[dst] - pos[src]) / (2*max) + 0.5``
    (reference net.py:71,75-95 + components.py:25-35).

    Args: pos ``[N, >=2]`` normalized float positions; nbr/nbr_mask ``[N, K]``.
    Returns attr ``[N, K, 2]``.
    """
    pd = pos if pos_dst is None else pos_dst
    d = pd[:, None, :2] - pos[nbr][..., :2]
    attr = d / (2.0 * max_value) + 0.5
    if clamp:  # reference net.py:121 clamps layer-1 attrs into [0, 1]
        attr = jnp.clip(attr, 0.0, 1.0)
    return jnp.where(nbr_mask[..., None], attr, 0.5)


def tap_ranges(kernel_size: int,
               attr_range) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Static per-axis kernel tap bounds implied by static attr bounds.

    For degree-1 splines an attr value ``a`` only touches taps
    ``floor(a*(K-1))`` and ``+1``; when the attr range is narrow (level 0:
    pixel offsets bounded by the graph radius map to attrs near 0.5) most of
    the ``K x K`` kernel is provably untouched and the contraction can skip
    it (the reference LUT pays the full kernel, spline_conv.py:39-47).

    Args: attr_range ``((ax_lo, ax_hi), (ay_lo, ay_hi))``.
    Returns inclusive ``((mx_lo, mx_hi), (my_lo, my_hi))``.
    """
    k = kernel_size
    out = []
    for lo, hi in attr_range:
        u_lo = min(max(float(lo), 0.0), 1.0) * (k - 1)
        u_hi = min(max(float(hi), 0.0), 1.0) * (k - 1)
        i0 = max(min(math.floor(u_lo - 1e-5), k - 2), 0)
        i1 = max(min(math.floor(u_hi + 1e-5), k - 2), 0)
        out.append((i0, min(i1 + 1, k - 1)))
    return tuple(out)


def center_index(kernel_size: int) -> int:
    """Flat kernel slot hit by ``attr == 0.5`` with weight 1 (odd K)."""
    c = (kernel_size - 1) // 2
    return c + c * kernel_size


def sub_kernel_index(kernel_size: int, ranges) -> np.ndarray:
    """Flat kernel indices of the tap sub-rectangle (x fastest)."""
    (mx0, mx1), (my0, my1) = ranges
    return (np.arange(my0, my1 + 1)[:, None] * kernel_size
            + np.arange(mx0, mx1 + 1)[None, :]).reshape(-1)


def spline_coeff_sep(attr: jnp.ndarray, kernel_size: int, ranges,
                     dtype=jnp.float32):
    """Separable dense tap weights ``(cx [..., nxs], cy [..., nys])`` with
    ``coeff[..., my*nxs + mx] = cy[..., my] * cx[..., mx]`` equal to the
    dense scatter of :func:`spline_basis` restricted to ``ranges``."""
    (mx0, mx1), (my0, my1) = ranges
    k = kernel_size
    u = jnp.clip(attr, 0.0, 1.0) * (k - 1)

    def axis(ud, m0, nsub):
        i0 = jnp.clip(jnp.floor(ud).astype(jnp.int32), 0, k - 2)
        fr = (ud - i0).astype(dtype)
        loc = i0 - m0
        return (jax.nn.one_hot(loc, nsub, dtype=dtype) * (1.0 - fr)[..., None]
                + jax.nn.one_hot(loc + 1, nsub, dtype=dtype) * fr[..., None])

    return (axis(u[..., 0], mx0, mx1 - mx0 + 1),
            axis(u[..., 1], my0, my1 - my0 + 1))


def offset_attr(off: jnp.ndarray, nbr_mask: jnp.ndarray, max_value: float,
                width: int, height: int) -> jnp.ndarray:
    """Pseudo-coordinates from integer pixel offsets ``(dst - src)``
    (decoded from the search kernel's spiral key): equals
    :func:`cartesian_attr` on the gathered normalized positions up to float
    rounding, with zero gathers.  Args: off ``[N, K, 2]`` int32."""
    s = jnp.asarray([1.0 / (2.0 * max_value * width),
                     1.0 / (2.0 * max_value * height)], jnp.float32)
    a = off.astype(jnp.float32) * s + 0.5
    a = jnp.clip(a, 0.0, 1.0)
    return jnp.where(nbr_mask[..., None], a, 0.5)


def spline_conv(x: jnp.ndarray,
                nbr: jnp.ndarray,
                nbr_mask: jnp.ndarray,
                attr: jnp.ndarray,
                params: SplineConvParams,
                *,
                kernel_size: int,
                aggr: str = "sum",
                node_mask: Optional[jnp.ndarray] = None,
                x_dst: Optional[jnp.ndarray] = None,
                x_j: Optional[jnp.ndarray] = None,
                attr_range=None,
                add_center_to_root: bool = False) -> jnp.ndarray:
    """Args:
      x: ``[N, Cin]`` node features.
      nbr: ``[N, K]`` int32 source index per (destination, slot).
      nbr_mask: ``[N, K]`` bool.
      attr: ``[N, K, 2]`` pseudo-coordinates in [0, 1].
      aggr: 'sum' or 'mean' over incoming edges (reference args.aggr).
      node_mask: optional ``[N]`` bool; output zeroed at invalid nodes.
      x_dst: optional ``[N_dst, Cin]`` destination features when the
        destination rows are a subset of the gather source ``x`` (the
        incremental streaming path); ``nbr`` then has ``N_dst`` rows.
      x_j: optional pre-gathered neighbour features ``[N_dst, K, Cin]`` —
        TPU gathers cost a full memory tile per index, so callers that
        already gathered a combined row (positions + features) pass the
        slice here instead of triggering a second gather.
      attr_range: optional static ``((ax_lo, ax_hi), (ay_lo, ay_hi))`` attr
        bounds; the contraction is restricted to the implied kernel-tap
        sub-rectangle (:func:`tap_ranges`) — exact, not an approximation.
      add_center_to_root: the caller removed the self edge (slot 0, attr
        exactly 0.5 so its basis is the single center tap with weight 1)
        from the tables; its contribution ``x_dst @ weight[center]`` is
        folded into the root matmul instead.  Only valid for ``aggr='sum'``
        with the downstream masking matching the removed slot's mask.

    Returns ``[N_dst, Cout]`` (``N_dst = nbr.shape[0]``).
    """
    n, k = nbr.shape
    cin = x.shape[1]
    xd = x if x_dst is None else x_dst
    if attr_range is None:
        ranges = ((0, kernel_size - 1), (0, kernel_size - 1))
    else:
        ranges = tap_ranges(kernel_size, attr_range)
    (mx0, mx1), (my0, my1) = ranges
    nxs, nys = mx1 - mx0 + 1, my1 - my0 + 1
    m_sub = nxs * nys

    cx, cy = spline_coeff_sep(attr, kernel_size, ranges, dtype=x.dtype)
    cx = cx * nbr_mask[..., None]
    if aggr == "mean":
        deg = jnp.maximum(nbr_mask.sum(axis=1, keepdims=True), 1)
        cx = cx / deg[..., None]
    coeff = (cy[..., :, None] * cx[..., None, :]).reshape(n, k, m_sub)
    if x_j is None:
        x_j = x[nbr]                                   # [N, K, Cin]
    if n * k >= 1 << 20:
        # XLA lowers the einsum to N tiny batched matmuls ([M,K]@[K,C] per
        # node) — latency-bound at event scale (measured 7.2 ms at 98k
        # nodes vs 3.1 ms for the fused broadcast-reduce)
        z = (coeff[:, :, :, None] * x_j[:, :, None, :]).sum(axis=1)
    else:
        z = jnp.einsum("nkm,nkc->nmc", coeff, x_j)     # [N, M_sub, Cin]
    if m_sub < kernel_size * kernel_size:
        w_sub = params.weight[sub_kernel_index(kernel_size, ranges)]
    else:
        w_sub = params.weight
    out = z.reshape(n, m_sub * cin) @ w_sub.reshape(m_sub * cin, -1)
    root = params.root
    if add_center_to_root:
        assert aggr == "sum", "self-edge fold requires sum aggregation"
        wc = params.weight[center_index(kernel_size)]
        root = wc if root is None else root + wc
    if root is not None:
        out = out + xd @ root
    if params.bias is not None:
        out = out + params.bias
    if node_mask is not None:
        out = jnp.where(node_mask[:, None], out, 0.0)
    return out


def spline_conv_reference(x, nbr, nbr_mask, attr, params, *, kernel_size,
                          aggr="sum"):
    """Slow per-edge formulation (mirrors PyG message+aggregate) for tests."""
    w, idx = spline_basis(attr, kernel_size)
    kernels = params.weight[idx]                       # [N, K, 4, Ci, Co]
    msg = jnp.einsum("nkm,nkmio,nki->nko", w, kernels, x[nbr])
    msg = msg * nbr_mask[..., None]
    out = msg.sum(axis=1)
    if aggr == "mean":
        out = out / jnp.maximum(nbr_mask.sum(axis=1, keepdims=True), 1)
    if params.root is not None:
        out = out + x @ params.root
    if params.bias is not None:
        out = out + params.bias
    return out

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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

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
                x_j: Optional[jnp.ndarray] = None) -> jnp.ndarray:
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

    Returns ``[N_dst, Cout]`` (``N_dst = nbr.shape[0]``).
    """
    n, k = nbr.shape
    cin = x.shape[1]
    xd = x if x_dst is None else x_dst
    m = kernel_size * kernel_size
    w, idx = spline_basis(attr, kernel_size)           # [N, K, 4]
    w = w * nbr_mask[..., None]
    if aggr == "mean":
        deg = jnp.maximum(nbr_mask.sum(axis=1, keepdims=True), 1)
        w = w / deg[..., None]
    # coeff[n, k, m]: 4 scatter slots -> accumulate via one_hot matmuls
    coeff = jnp.zeros((n, k, m), dtype=x.dtype)
    for s in range(4):
        coeff = coeff + jax.nn.one_hot(idx[..., s], m, dtype=x.dtype) \
            * w[..., s][..., None]
    if x_j is None:
        x_j = x[nbr]                                   # [N, K, Cin]
    if n * k >= 1 << 20:
        # XLA lowers the einsum to N tiny batched matmuls ([M,K]@[K,C] per
        # node) — latency-bound at event scale (measured 7.2 ms at 98k
        # nodes vs 3.1 ms for the fused broadcast-reduce)
        z = (coeff[:, :, :, None] * x_j[:, :, None, :]).sum(axis=1)
    else:
        z = jnp.einsum("nkm,nkc->nmc", coeff, x_j)     # [N, M, Cin]
    out = z.reshape(n, m * cin) @ params.weight.reshape(m * cin, -1)
    if params.root is not None:
        out = out + xd @ params.root
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

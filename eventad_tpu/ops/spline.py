"""Degree-1 open B-spline basis (replaces torch_spline_conv.spline_basis used
by the reference at src/dagr/model/layers/spline_conv.py:32).

For 2-D pseudo-coordinates ``attr`` in [0, 1] and kernel size ``K`` per dim,
each edge activates at most 2^2 = 4 kernel slots:

  u_d      = attr_d * (K_d - 1)
  lo_d     = floor(u_d), fr_d = u_d - lo_d
  for bits (b0, b1) in {0,1}^2:
      weight = prod_d (fr_d if b_d else 1 - fr_d)
      flat   = (lo_0 + b_0) + (lo_1 + b_1) * K_0      # dim 0 fastest

This framework's canonical kernel layout is ``weight[K_0 * K_1, Cin, Cout]``
with dim-0 (the x offset) fastest; the torch->JAX checkpoint converter is the
single place that has to map torch_spline_conv's layout onto this one.
"""
from __future__ import annotations

import jax.numpy as jnp


def spline_basis(attr: jnp.ndarray, kernel_size: int):
    """Args: ``attr [..., 2]`` in [0, 1]. Returns ``(w [..., 4], idx [..., 4])``
    with ``idx`` flat kernel indices in ``[0, kernel_size**2)``."""
    k = kernel_size
    u = jnp.clip(attr, 0.0, 1.0) * (k - 1)
    lo = jnp.floor(u)
    fr = u - lo
    lo = lo.astype(jnp.int32)

    ws = []
    idxs = []
    for b0 in (0, 1):
        for b1 in (0, 1):
            w = ((fr[..., 0] if b0 else 1.0 - fr[..., 0])
                 * (fr[..., 1] if b1 else 1.0 - fr[..., 1]))
            i0 = jnp.clip(lo[..., 0] + b0, 0, k - 1)
            i1 = jnp.clip(lo[..., 1] + b1, 0, k - 1)
            ws.append(w)
            idxs.append(i0 + i1 * k)
    return jnp.stack(ws, axis=-1), jnp.stack(idxs, axis=-1)


def build_lut(weight: jnp.ndarray, kernel_size: int, rx: int, ry: int,
              mx: float, my: float, width: int, height: int) -> jnp.ndarray:
    """Tabulated kernels for every integer pixel offset, identical math to the
    reference ``init_lut`` (spline_conv.py:16-37):
    ``attr = (dxy / (2 M W)) + 0.5`` for dx in [-rx, rx], dy in [-ry, ry].

    Returns ``lut [2rx+1, 2ry+1, Cin, Cout]``. Useful for the streaming path
    and for testing the basis-decomposition conv against the LUT conv."""
    dx = jnp.arange(-rx, rx + 1, dtype=jnp.float32)
    dy = jnp.arange(-ry, ry + 1, dtype=jnp.float32)
    ax = dx / (2 * mx * width) + 0.5
    ay = dy / (2 * my * height) + 0.5
    attr = jnp.stack(jnp.meshgrid(ax, ay, indexing="ij"), axis=-1)  # [X, Y, 2]
    w, idx = spline_basis(attr, kernel_size)                       # [X, Y, 4]
    kernels = weight[idx]                                          # [X,Y,4,Ci,Co]
    return (kernels * w[..., None, None]).sum(axis=2)

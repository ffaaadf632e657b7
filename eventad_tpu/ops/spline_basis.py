"""Shared pieces of the fused spline-conv Pallas kernels.

The linear B-spline basis (reference hot loop
``/root/reference/src/dagr/model/layers/spline_conv.py:39-47``; basis
decomposition proven equal to the reference LUT in
``tests/test_spline_conv.py``) and the activation table were previously
copy-pasted across ``spline_fused.py`` (two kernels) and
``spline_shift.py`` — a basis fix or a new activation had to land in three
places. Pure ``jnp`` on values, so usable inside Pallas kernel bodies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ACTS = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "elu": lambda x: jnp.where(x > 0, x, jnp.expm1(x)),
    "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
    "silu": lambda x: x * jax.nn.sigmoid(x),
}


def axis_weights(ux, uy, ks: int, *, mx0: int = 0, my0: int = 0,
                 nxs: int = None, nys: int = None):
    """Per-axis linear-spline tap weights for normalized attrs in [0, ks-1].

    ``ux/uy`` are pre-scaled attributes (attr * (ks-1)), any shape. Each
    coordinate contributes weight ``1-fr`` to its floor tap and ``fr`` to
    the next; taps are restricted to the static sub-rectangle
    ``[mx0, mx0+nxs) x [my0, my0+nys)`` (see ``spline_conv.tap_ranges``).
    Returns ``(cxs, cys)``: lists of per-tap weight arrays (length
    ``nxs``/``nys``); the (my, mx) tap coefficient is ``cys[my]*cxs[mx]``.
    """
    nxs = ks if nxs is None else nxs
    nys = ks if nys is None else nys
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
    return cxs, cys

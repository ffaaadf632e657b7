"""Separable bilinear image-feature sampling as a Pallas TPU kernel.

The batched forward fetches CNN features for every level-0 event
(reference ``sample_features``, src/dagr/model/networks/net.py:200-228).
The XLA formulation (models/graph.py) upsamples the two sampled maps to
full sensor resolution (two static interp matmuls) and then does ONE
integer row gather per event — but that gather is *issue*-bound on TPU
(~12 cycles per row regardless of row width), costing ~1.2 ms at 98k
events, plus ~0.4 ms of upsample einsums and layout copies feeding it.

This kernel removes both the gather and the upsample by applying the two
bilinear interpolation axes separably, per 128-event block, entirely in
VMEM:

  1. y axis on the MXU: a [hp, 128] two-tap weight matrix (built in VMEM
     from ``floor(fy)`` / ``frac(fy)`` one-hot compares) contracts the
     item's feature map, pre-transposed to ``[wp*C, hp]``, into
     ``G[wp*C, 128]`` — every event's full feature *column strip*,
     y-interpolated, with events on lanes.
  2. x axis on the VPU: ``G`` reshaped ``[wp, C, 128]`` (a no-op layout
     split of the sublane dim) is weighted by the matching two-tap
     ``[wp, 1, 128]`` x-weights and summed over ``wp`` — a dense
     broadcast-reduce, no per-event lane slicing.

Events ride the lane dimension throughout (channels on sublanes), so the
narrow-C maps (16/64 channels) never waste lane slots — the same
transposed-operand insight as ops/spline_fused.py.

Semantics match :func:`eventad_tpu.models.graph.sample_image_features`
(torch ``grid_sample(align_corners=True)`` with zero padding): out-of-map
taps contribute zero, masked events return zero rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 128      # events per block (lanes)


def _kernel(map_ref, q_ref, out_ref, *, hp, wp, c, hpp):
    """map_ref: [1, wp*c, hpp] (transposed per-item map, y padded);
    q_ref: [1, 1, 3, BLK] f32 (sublane rows: fy, fx, mask); out:
    [1, c, BLK]."""
    fy = q_ref[0, 0, 0:1]                              # [1, BLK]
    fx = q_ref[0, 0, 1:2]
    m = q_ref[0, 0, 2:3]

    y0f = jnp.floor(fy)
    ty = fy - y0f
    y0 = y0f.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hpp, _BLK), 0)
    oky0 = ((y0 >= 0) & (y0 < hp)).astype(fy.dtype) * m
    oky1 = ((y0 + 1 >= 0) & (y0 + 1 < hp)).astype(fy.dtype) * m
    wy = (jnp.where(rows == y0, (1.0 - ty) * oky0, 0.0)
          + jnp.where(rows == y0 + 1, ty * oky1, 0.0))  # [hpp, BLK]

    mt = map_ref[0]                                     # [wp*c, hpp]
    g = jax.lax.dot_general(mt, wy.astype(mt.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    x0f = jnp.floor(fx)
    tx = fx - x0f
    x0 = x0f.astype(jnp.int32)
    okx0 = ((x0 >= 0) & (x0 < wp)).astype(fx.dtype)
    okx1 = ((x0 + 1 >= 0) & (x0 + 1 < wp)).astype(fx.dtype)
    # x weights expanded to strip-row granularity (row j holds x index
    # j // c): stays 2-D — Mosaic has no lowering for the 3-D
    # reshape+broadcast-reduce form (it lowers to an unsupported gather)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (wp * c, _BLK), 0) // c
    wxe = (jnp.where(rows_w == x0, (1.0 - tx) * okx0, 0.0)
           + jnp.where(rows_w == x0 + 1, tx * okx1, 0.0))  # [wp*c, BLK]

    # per-channel strided row sum as one MXU contraction with the static
    # channel-selection matrix S[ch, j] = (j mod c == ch)
    jmod = jax.lax.broadcasted_iota(jnp.int32, (c, wp * c), 1) % c
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, wp * c), 0)
    sel = (jmod == ch).astype(jnp.float32)
    out = jax.lax.dot_general(sel, g * wxe, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("full_width", "full_height",
                                    "batch_size", "interpret"))
def sample_bilinear_mxu(feat: jnp.ndarray,
                        pos: jnp.ndarray,
                        node_mask: jnp.ndarray,
                        *,
                        full_width: int,
                        full_height: int,
                        batch_size: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Bilinear sample ``feat`` at event positions, separable MXU/VPU form.

    Args:
      feat: ``[B, hp, wp, C]`` feature map (f32 or bf16; the y contraction
        runs in this dtype).
      pos: ``[N, >=2]`` normalized positions, ``N = B * n_max`` with
        events of item ``b`` in rows ``[b*n_max, (b+1)*n_max)`` (the
        level-0 table layout, models/dagr.py:93) and ``n_max % 128 == 0``.
      node_mask: ``[N]`` bool; masked rows return zeros.

    Returns ``[N, C]`` in ``feat.dtype``. Equals
    :func:`~eventad_tpu.models.graph.sample_image_features` (f32: ~1e-6;
    bf16: the two-tap weights are rounded to bf16).
    """
    b, hp, wp, c = feat.shape
    n = pos.shape[0]
    assert n % batch_size == 0, (n, batch_size)
    n_max = n // batch_size
    assert n_max % _BLK == 0, n_max
    assert c % 8 == 0, c
    hpp = -(-hp // _BLK) * _BLK

    # [B, hp, wp, C] -> [B, wp*C, hpp]: x-major strips, channels minor,
    # y on lanes for the contraction
    mt = jnp.pad(feat.transpose(0, 2, 3, 1).reshape(b, wp * c, hp),
                 ((0, 0), (0, 0), (0, hpp - hp)))

    fdt = jnp.float32
    fx = (pos[:, 0].astype(fdt) * full_width * (wp - 1)
          / max(full_width - 1, 1)).reshape(b, n_max // _BLK, _BLK)
    fy = (pos[:, 1].astype(fdt) * full_height * (hp - 1)
          / max(full_height - 1, 1)).reshape(b, n_max // _BLK, _BLK)
    msk = node_mask.astype(fdt).reshape(b, n_max // _BLK, _BLK)
    # one (8,128)-tileable query array: sublane rows fy / fx / mask
    q = jnp.stack([fy, fx, msk], axis=2)               # [b, nblk, 3, BLK]

    kern = functools.partial(_kernel, hp=hp, wp=wp, c=c, hpp=hpp)
    out = pl.pallas_call(
        kern,
        grid=(b, n_max // _BLK),
        in_specs=[
            pl.BlockSpec((1, wp * c, hpp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, _BLK), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _BLK), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, c, n_max), feat.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mt, q)
    # [B, C, n_max] -> [N, C]
    return out.transpose(0, 2, 1).reshape(n, c)

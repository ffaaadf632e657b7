"""Masked batch normalization over node features.

Replaces the reference ``BatchNormData`` (src/dagr/model/layers/components.py:9,
a torch BatchNorm1d over ``data.x``). Our node arrays carry padding/inactive
slots, so training statistics must be computed over *valid* nodes only; the
reference operates on compacted arrays where every row is valid, so masked
statistics are the faithful equivalent.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BatchNormParams(NamedTuple):
    scale: jnp.ndarray   # gamma [C]
    offset: jnp.ndarray  # beta  [C]


class BatchNormState(NamedTuple):
    mean: jnp.ndarray    # running mean [C]
    var: jnp.ndarray     # running var  [C]


def init_batch_norm(channels: int, dtype=jnp.float32):
    params = BatchNormParams(jnp.ones((channels,), dtype),
                             jnp.zeros((channels,), dtype))
    state = BatchNormState(jnp.zeros((channels,), dtype),
                           jnp.ones((channels,), dtype))
    return params, state


def batch_norm(x: jnp.ndarray,
               mask: jnp.ndarray,
               params: BatchNormParams,
               state: BatchNormState,
               *,
               training: bool,
               eps: float = 1e-5,
               momentum: float = 0.1):
    """Args: x ``[N, C]``, mask ``[N]`` bool. Returns (y, new_state).

    Matches torch.nn.BatchNorm1d semantics: biased variance for
    normalization, unbiased for the running estimate, running = (1-m)*running
    + m*batch.
    """
    if training:
        xf = x.astype(jnp.float32)          # stats always in f32
        m = mask[:, None].astype(jnp.float32)
        cnt = jnp.maximum(m.sum(), 1.0)
        mean = (xf * m).sum(axis=0) / cnt
        d = (xf - mean) * m
        var = (d * d).sum(axis=0) / cnt
        unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
        new_state = BatchNormState(
            (1 - momentum) * state.mean + momentum * mean,
            (1 - momentum) * state.var + momentum * unbiased)
    else:
        mean, var = state.mean, state.var
        new_state = state
    if x.dtype == jnp.float32:
        # torch-order arithmetic (bit-comparable to the reference modules)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
        y = y * params.scale + params.offset
    else:
        # bf16 compute path: fold into one affine in f32, apply in x.dtype
        a = params.scale * jnp.reciprocal(jnp.sqrt(var + eps))
        b = params.offset - mean * a
        y = x * a.astype(x.dtype) + b.astype(x.dtype)
    y = jnp.where(mask[:, None], y, 0.0)
    return y, new_state

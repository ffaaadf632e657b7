"""Multi-layer GRU with torch.nn.GRU semantics, vectorized over track slots.

Reference: ``Event_GRUNet``/``Cor_GRUNet`` (models/EventAD.py:62-97) run one
torch GRU step per bounding box inside a Python loop; here a single step
processes all ``max_boxes+1`` slots as one batched matmul.

Gate math (torch convention):
    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh  (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
Init mirrors the reference: zero biases, kaiming-normal W_ih, orthogonal W_hh
(EventAD.py:68-74,87-93).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class GRULayerParams(NamedTuple):
    w_ih: jnp.ndarray   # [In, 3H]  (r, z, n blocks along last axis)
    w_hh: jnp.ndarray   # [H, 3H]
    b_ih: jnp.ndarray   # [3H]
    b_hh: jnp.ndarray   # [3H]


class GRUParams(NamedTuple):
    layers: Tuple[GRULayerParams, ...]


def _kaiming_normal(key, shape):
    # torch kaiming_normal_ default: fan_in = shape[0] for a [out, in] matrix;
    # torch GRU weights are [3H, In]; ours are transposed, so fan_in = rows of
    # the torch layout = 3H? torch kaiming uses fan_in of the tensor as
    # declared: for weight_ih [3H, In], fan_in = In.
    fan_in = shape[0]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape) * std


def _orthogonal(key, shape):
    return jax.nn.initializers.orthogonal()(key, shape)


def init_gru(key, input_dim: int, hidden_dim: int, n_layers: int) -> GRUParams:
    layers = []
    for i in range(n_layers):
        k1, k2, key = jax.random.split(key, 3)
        ind = input_dim if i == 0 else hidden_dim
        w_ih = _kaiming_normal(k1, (ind, 3 * hidden_dim))
        w_hh = jnp.concatenate(
            [_orthogonal(k, (hidden_dim, hidden_dim))
             for k in jax.random.split(k2, 3)], axis=1)
        layers.append(GRULayerParams(w_ih, w_hh,
                                     jnp.zeros((3 * hidden_dim,)),
                                     jnp.zeros((3 * hidden_dim,))))
    return GRUParams(tuple(layers))


def gru_step(params: GRUParams,
             x: jnp.ndarray,
             h: jnp.ndarray,
             *,
             dropout: float = 0.0,
             rng: Optional[jax.Array] = None):
    """One time step.

    Args:
      x: ``[B, In]`` inputs (B = slot batch).
      h: ``[B, L, H]`` per-layer hidden states.
      dropout: inter-layer dropout rate (torch applies it to every layer's
        output except the last; active only when ``rng`` is given).

    Returns ``(out [B, H], h' [B, L, H])``.
    """
    hs = []
    inp = x
    n_layers = len(params.layers)
    for i, p in enumerate(params.layers):
        hd = p.w_hh.shape[0]
        gi = inp @ p.w_ih + p.b_ih
        gh = h[:, i, :] @ p.w_hh + p.b_hh
        ir, iz, inn = jnp.split(gi, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        hi = (1.0 - z) * n + z * h[:, i, :]
        hs.append(hi)
        inp = hi
        if dropout > 0.0 and rng is not None and i < n_layers - 1:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, inp.shape)
            inp = jnp.where(keep, inp / (1.0 - dropout), 0.0)
    return inp, jnp.stack(hs, axis=1)

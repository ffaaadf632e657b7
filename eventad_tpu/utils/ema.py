"""Exponential moving average of parameters.

Reference: ``ModelEMA`` (src/dagr/model/networks/ema.py:6-51): decay ramps as
``0.9999 * (1 - exp(-updates / 2000))``; the published DAGR checkpoint is
loaded from its ``['ema']`` entry (reference utils/model.py:31-32)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: object
    updates: jnp.ndarray    # scalar int32


def ema_init(params) -> EMAState:
    return EMAState(jax.tree.map(jnp.asarray, params),
                    jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, decay: float = 0.9999,
               tau: float = 2000.0) -> EMAState:
    n = state.updates + 1
    d = decay * (1.0 - jnp.exp(-n.astype(jnp.float32) / tau))
    new = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                       state.params, params)
    return EMAState(new, n)

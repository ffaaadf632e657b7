"""Model-axis parameter sharding (tensor/FSDP parallelism) over the mesh.

The reference is strictly single-GPU (SURVEY.md 2.12); this module is the
TPU-native scaling story for the *model* dimension, complementing the
data-parallel batch sharding in :mod:`.mesh`.  Strategy: every large weight
is physically sharded over the mesh's ``'model'`` axis along its widest
divisible dimension (channel-out for convs / spline kernels / linears),
and the train/eval step is jitted with those shardings on the parameter
arguments.  XLA's SPMD partitioner then chooses per-op between

* **tensor parallelism** — keep the weight sharded and shard the op's
  output channel dim (the following op consumes the sharded activation,
  contracting ops insert ``psum``/reduce-scatter), or
* **FSDP-style gather** — all-gather the weight just before use when
  sharded compute would cost more than the gather,

whichever its cost model prefers, with collectives riding ICI.  Parameter,
gradient, and optimizer-state memory stay sharded either way (the updates
are elementwise, so jit keeps them in the input sharding) — per-device
parameter memory scales as 1/m on an ``n x m`` mesh.

Pipeline and expert parallelism are deliberately NOT offered: the whole
detector is 27.7M params (ResNet-50 dominated) with no MoE layers — at
this scale pp would only add bubble overhead and ep has no experts to
place.  dp x (tp|fsdp) covers the model family.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def model_axis_spec(shape, axis_size: int, *, min_size: int = 8192,
                    axis: str = "model") -> P:
    """PartitionSpec sharding the widest divisible dim over ``axis``.

    Dims are scanned widest-first with the LAST axis winning ties — conv
    kernels ``[kh, kw, Cin, Cout]``, spline kernels ``[K, Cin, Cout]`` and
    linears ``[Cin, Cout]`` all shard channel-out, which chains into
    Megatron-style column-parallel layers when XLA shards the compute.
    Leaves smaller than ``min_size`` elements (biases, BN affines, scalar
    hyperparams) stay replicated: sharding them saves nothing and forces
    per-op collectives.
    """
    size = 1
    for d in shape:
        size *= d
    if size < min_size or axis_size <= 1:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % axis_size == 0 and (best is None or d >= shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def param_shardings(params, mesh: Mesh, *, axis: str = "model",
                    min_size: int = 8192):
    """NamedSharding tree for a parameter pytree (replicated over 'data')."""
    m = mesh.shape[axis]

    def leaf(x):
        return NamedSharding(mesh, model_axis_spec(x.shape, m,
                                                   min_size=min_size,
                                                   axis=axis))
    return jax.tree.map(leaf, params)


def shard_params(params, mesh: Mesh, *, axis: str = "model",
                 min_size: int = 8192):
    """device_put a parameter pytree with :func:`param_shardings`."""
    return jax.tree.map(jax.device_put, params,
                        param_shardings(params, mesh, axis=axis,
                                        min_size=min_size))


def sharded_init(init_fn, params, mesh: Optional[Mesh], *,
                 axis: str = "model", min_size: int = 8192):
    """Run an optimizer/EMA ``init_fn(params)`` so its state inherits the
    parameter shardings (moments are elementwise images of the params;
    jitting the init lets SPMD place them without a host round-trip)."""
    if mesh is None:
        return init_fn(params)
    return jax.jit(init_fn)(params)

"""Device-mesh helpers.

The reference is strictly single-GPU (SURVEY.md 2.12); scaling here is
JAX-native: a ``Mesh`` over ('data', 'model') axes, batch arrays sharded on
'data', parameters replicated (the trained head is ~1M params — DP is the
right parallelism for this workload; 'model' axis exists for the larger
fusion/GRU matmuls if ever needed and for multi-chip dry-runs)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec: str = "1", devices: Optional[Sequence] = None) -> Mesh:
    """spec: "N" (data only) or "NxM" (data x model)."""
    devices = list(devices if devices is not None else jax.devices())
    if "x" in spec:
        d, m = map(int, spec.split("x"))
    else:
        d, m = int(spec), 1
    n = d * m
    if n > len(devices):
        # Degrade gracefully: fewer devices than the spec asks for means a
        # pure-DP mesh over what is available (params are replicated, so a
        # smaller mesh is always valid — just less parallel).
        import warnings
        warnings.warn(f"mesh {spec} needs {n} devices but only "
                      f"{len(devices)} available; degrading to "
                      f"{len(devices)}x1 data-parallel mesh")
        d, m = len(devices), 1
        n = d * m
    arr = np.array(devices[:n]).reshape(d, m)
    return Mesh(arr, ("data", "model"))


# batch fields whose item axis is NOT the leading one (none at present —
# EventBatch.image_s2d ships NCHW with batch leading; the hook remains for
# any future staged field with a non-leading item axis)
_FIELD_SPECS: dict = {}


def _field_pspec(batch, default):
    """Per-field PartitionSpec tree for an EventBatch-like NamedTuple (None
    fields keep None so the tree structures match); plain trees fall back to
    a uniform leading-axis spec."""
    if hasattr(batch, "_fields"):
        return type(batch)(**{
            k: (None if v is None
                else jax.tree.map(
                    lambda _, s=_FIELD_SPECS.get(k, default): s, v))
            for k, v in batch._asdict().items()})
    return jax.tree.map(lambda _: default, batch)


def batch_pspec(batch) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec tree: item axis of every batch array on 'data'."""
    return _field_pspec(batch, P("data"))


def shard_batch(batch, mesh: Mesh):
    specs = batch_pspec(batch)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        batch, specs)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())

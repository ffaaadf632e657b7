#!/usr/bin/env python
"""Integration exactness check for the fused bf16 Pallas conv paths on the
REAL device: full model_forward at the flagship operating point with each
fused flavor toggled, all compared against the f32 truth.  The
kernel-level interpret tests (tests/test_spline_fused.py,
tests/test_spline_shift.py) cannot catch Mosaic-specific lowering bugs;
this drives the exact integration glue (self-edge fold, BN/bias folding,
skip path, pooled-geometry tap windows) that the default flips enable.

Checked flavors (all bf16):
  base       fused level-0 single-block + pooled XLA formulation
  two_block  + both level-0 conv blocks in one kernel (fused_two_block)
  shift      + pooled levels via the shift-sliced kernel (fused_shift)
  default    the shipping flag set (two_block + shift)

A bf16 flavor passes if its error vs the f32 truth is within ~1.5x the
base flavor's own bf16 error band (all are bf16 programs with different
rounding points; none should be an outlier).

Usage: python tools/check_fused.py [n_events]
Prints per-flavor rel error; exits nonzero above tolerance.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import (graph_static_config, init_model,
                                         model_forward)

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    cfg = Config(batch_size=6, use_image=True, compute_dtype="bfloat16",
                 event_buckets=(n_events,))
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))

    def run(bc_):
        @jax.jit
        def fwd(params, state, batch):
            out, _ = model_forward(params, state, batch, bc_, mc, gsc,
                                   img_net=cfg.img_net, training=False)
            return out.logits
        return np.asarray(fwd(params, state, batch)).astype(np.float64)

    f32 = run(bc._replace(compute_dtype="float32"))
    scale = np.abs(f32).max() + 1e-9

    flavors = {
        "base": bc._replace(fused_two_block=False, fused_shift=False),
        "two_block": bc._replace(fused_two_block=True, fused_shift=False),
        "shift": bc._replace(fused_two_block=False, fused_shift=True),
        "default": bc,
    }
    rel = {}
    for name, bc_ in flavors.items():
        rel[name] = np.abs(run(bc_) - f32).max() / scale
        print(f"{name:>10}: rel vs f32 = {rel[name]:.3e}")

    band = max(1.5 * rel["base"], 2e-2)
    bad = [n for n, r in rel.items() if r > band]
    print("OK" if not bad
          else f"FAIL: {bad} diverge beyond the bf16 band {band:.3e}")
    sys.exit(0 if not bad else 1)


if __name__ == "__main__":
    main()

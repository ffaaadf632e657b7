#!/usr/bin/env python
"""Integration exactness check for the two-block fused level-0 kernel on
the REAL device: full model_forward with ``fused_two_block`` on vs off
(both bf16) at the flagship operating point.  The kernel-level interpret
tests (tests/test_spline_fused.py) cannot catch Mosaic-specific lowering
bugs; this drives the exact integration glue (self-edge fold, BN1/bias
folding, skip path) that the default flip enables.

Usage: python tools/check_two_block.py [n_events] [block]
Prints max abs/rel logit diff; exits nonzero above tolerance.
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
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 128
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

    bc = bc._replace(fused_block=block)
    base = run(bc._replace(fused_two_block=False))
    two = run(bc._replace(fused_two_block=True))
    scale = np.abs(base).max() + 1e-9
    rdiff = np.abs(two - base).max() / scale
    print(f"two-block vs single: rel={rdiff:.3e} (logit scale {scale:.3f})")

    # decisive question: is the two-block path FURTHER from f32 truth than
    # the single-block bf16 path is?  (the single path rounds the root
    # matmul to bf16 — XLA default output dtype — where the fused kernel
    # accumulates it in f32, so the two bf16 paths legitimately differ)
    f32 = run(bc._replace(fused_two_block=False,
                          compute_dtype="float32"))
    s32 = np.abs(f32).max() + 1e-9
    r_single = np.abs(base - f32).max() / s32
    r_two = np.abs(two - f32).max() / s32
    print(f"vs f32 truth: single rel={r_single:.3e}  two-block "
          f"rel={r_two:.3e}")
    # pass if the two-block path is no worse than ~1.5x the single path's
    # own bf16 error band (both are bf16 programs with different rounding)
    ok = r_two < max(1.5 * r_single, 2e-2)
    print("OK" if ok else "FAIL: two-block diverges beyond the bf16 band")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

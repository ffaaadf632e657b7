#!/usr/bin/env python
"""Integration exactness check for the two-block fused level-0 kernel on
the REAL device: full model_forward with ``fused_two_block`` on vs off
(both bf16) at the flagship operating point.  The kernel-level interpret
tests (tests/test_spline_fused.py) cannot catch Mosaic-specific lowering
bugs; this drives the exact integration glue (self-edge fold, BN1/bias
folding, skip path) that the default flip enables.

Usage: python tools/check_two_block.py [n_events]
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

    base = run(bc._replace(fused_two_block=False))
    two = run(bc._replace(fused_two_block=True))
    adiff = np.abs(two - base).max()
    scale = np.abs(base).max() + 1e-9
    rdiff = adiff / scale
    print(f"two-block integration: max_abs_diff={adiff:.3e} "
          f"rel={rdiff:.3e} (logit scale {scale:.3f})")
    # both paths are bf16 kernels with different reduction orders; a few
    # bf16 ulps through the head is the expected band
    ok = rdiff < 2e-2
    print("OK" if ok else "FAIL: two-block diverges from single-block path")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

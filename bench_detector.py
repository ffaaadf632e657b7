#!/usr/bin/env python
"""DAGR detector throughput at the flagship operating point (one chip).

Full detection forward: event graph -> CNN+GNN backbone -> hybrid YOLOX
head -> decode -> class-offset NMS. Prints ONE JSON line (images/s; the
reference has no committed detector-throughput artifact, so no
vs_baseline field).

Usage: python bench_detector.py [n_events] [compute_dtype]
"""
import json
import sys
import time

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.detector import detector_forward, init_detector

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cfg = Config(batch_size=6, use_image=True, compute_dtype=dtype,
                 event_buckets=(n_events,))
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))

    @jax.jit
    def fwd(params, state, batch):
        # inference throughput: eval mode (running-stats BN, bf16 CNN head)
        dets, decoded, _ = detector_forward(params, state, batch, cfg, bc,
                                            training=False)
        return dets["scores"], dets["mask"]

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    sync(fwd(params, state, batch))
    for _ in range(5):
        sync(fwd(params, state, batch))
    iters = 20
    t0 = time.perf_counter()
    outs = [fwd(params, state, batch) for _ in range(iters)]
    sync(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "detector_images_per_sec",
        "value": round(cfg.batch_size / dt, 2),
        "unit": "images/s",
        "batch_ms": round(dt * 1e3, 2),
        "events_per_item": n_events,
        "compute_dtype": dtype,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Full-gradient detector training-step bench (one chip).

Unlike tools/bench_train.py (frozen-DAGR anomaly head), this differentiates
THROUGH the whole detector — backbone spline convs included — i.e. the
reference's dagr.py:76-86 training regime.

Usage: python tools/bench_train_detector.py [n_events] [iters] [dtype]
       python tools/bench_train_detector.py --trace [n_events]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
import numpy as np
import optax

TRACE_DIR = "/tmp/jax_trace_dtrain"


def main():
    argv = [a for a in sys.argv[1:] if a != "--trace"]
    trace = "--trace" in sys.argv[1:]
    n_events = int(argv[0]) if len(argv) > 0 else 16384
    iters = int(argv[1]) if len(argv) > 1 else 20
    dtype = argv[2] if len(argv) > 2 else "float32"

    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.detector import detector_forward, init_detector
    from eventad_tpu.models.yolox_loss import (convert_to_training_format,
                                               make_anchor_geometry,
                                               yolox_loss)
    from eventad_tpu.utils.ema import ema_init, ema_update
    from eventad_tpu.utils.schedules import (make_detector_optimizer,
                                             yolox_schedule)

    cfg = Config(batch_size=6, use_image=True, event_buckets=(n_events,),
                 compute_dtype=dtype)
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg)
    grids = [bc.grids[2], bc.grids[3]]
    strides = [int(round(bc.height / g[1])) for g in grids]
    geom = make_anchor_geometry(grids, strides)
    schedule = yolox_schedule(cfg.lr, warmup_steps=10, total_steps=1000)
    optimizer = make_detector_optimizer(cfg.optimizer, schedule,
                                        cfg.weight_decay, cfg.clip)
    opt_state = optimizer.init(params)
    ema = ema_init(params)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))

    def loss_fn(params, state, batch, l1_weight):
        _dets, decoded, new_state = detector_forward(
            params, state, batch, cfg, bc, training=True)
        logits = decoded.at[..., 4:].set(
            jnp.log(jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6))
            - jnp.log1p(-jnp.clip(decoded[..., 4:], 1e-6, 1 - 1e-6)))
        tgt, tmask = convert_to_training_format(batch.bbox, batch.bbox_mask)
        losses = yolox_loss(logits, tgt, tmask, geom, l1_weight=l1_weight)
        return losses["total"], (losses, new_state)

    @jax.jit
    def train_step(params, state, opt_state, ema, batch):
        (loss, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, jnp.float32(0.0))
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = ema_update(ema, new_params)
        return new_params, new_state, new_opt, new_ema, losses

    def run(p, s, o, e):
        return train_step(p, s, o, e, batch)

    p, s, o, e, m = run(params, state, opt_state, ema)
    np.asarray(m["total"]).ravel()[0]
    for _ in range(3):
        p, s, o, e, m = run(p, s, o, e)
    np.asarray(m["total"]).ravel()[0]

    if trace:
        os.system(f"rm -rf {TRACE_DIR}")
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(3):
                p, s, o, e, m = run(p, s, o, e)
            np.asarray(m["total"]).ravel()[0]
        print(f"traced to {TRACE_DIR}; parse with "
              f"tools/trace_forward.py --parse {TRACE_DIR}")
        return

    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, o, e, m = run(p, s, o, e)
    np.asarray(m["total"]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    bs = cfg.batch_size
    print(f"detector train step ({dtype}): {dt*1e3:.2f} ms/batch, "
          f"{bs/dt:.1f} items/s  (n_events={n_events}, batch={bs}, "
          f"loss={float(np.asarray(m['total'])):.3f})")


if __name__ == "__main__":
    main()

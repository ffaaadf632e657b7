#!/usr/bin/env python
"""Training-step throughput at the flagship operating point (one chip).

Head-only gradients, frozen DAGR (the reference's training regime).
Usage: python tools/bench_train.py [n_events] [iters] [compute_dtype]

The frozen feature path runs eval-mode inside the train step (reference
EventAD.py:149-150 keeps DAGR in eval), so ``bfloat16`` legally enables the
fused inference kernels during training — gradients stop at the features.
f32 stays the default (the reference's training numerics).
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


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import graph_static_config, init_model
    from eventad_tpu.parallel.train_step import (make_optimizer,
                                                 make_train_fns)

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    cfg = Config(batch_size=6, use_image=True, event_buckets=(n_events,),
                 compute_dtype=dtype)
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))
    opt = make_optimizer(1e-3, 1e-5, 1.0)
    opt_state = opt.init(params.head)
    fns = make_train_fns(cfg, bc, mc, gsc, opt)
    rng = jax.random.PRNGKey(1)

    def run(p, s, o):
        return fns.train_step(p, s, o, batch, rng)

    p, s, o, m = run(params, state, opt_state)     # compile
    np.asarray(m["loss"])
    for _ in range(3):
        p, s, o, m = run(p, s, o)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, o, m = run(p, s, o)
    np.asarray(m["loss"])                           # one final sync
    dt = (time.perf_counter() - t0) / iters
    print(f"train step ({dtype}): {dt*1e3:.2f} ms/batch, "
          f"{cfg.batch_size/dt:.1f} items/s pipelined")

    # scan-amortised device time: N optimizer steps inside ONE program, so
    # the ~10 ms/dispatch tunnel enqueue rate drops out. The params carry
    # serialises the steps; the batch is additionally perturbed by a
    # dynamically-zero scalar chained off the loss so batch-only stages
    # (graph build, CNN branch) cannot be hoisted as loop-invariant — in
    # real training every step sees a fresh batch.
    from eventad_tpu.utils.jaxtools import dynamic_zero_perturb

    def make_scan(n):
        @jax.jit
        def train_scan(p, s, o):
            def body(carry, _):
                p, s, o, c = carry
                b2 = dynamic_zero_perturb(batch, c)
                p, s, o, m = fns.train_step(p, s, o, b2, rng)
                return (p, s, o, (m["loss"] * 0.0).astype(jnp.float32)), ()
            (p, s, o, c), _ = jax.lax.scan(
                body, (p, s, o, jnp.float32(0.0)), None, length=n)
            return c
        return train_scan

    n1, n2 = 5, 20
    scan1, scan2 = make_scan(n1), make_scan(n2)
    np.asarray(scan1(p, s, o))                      # compile
    np.asarray(scan2(p, s, o))

    def best_wall(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(p, s, o))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    scan_ms = (best_wall(scan2) - best_wall(scan1)) / (n2 - n1) * 1e3
    print(f"train step ({dtype}): {scan_ms:.2f} ms/batch device "
          f"(scan-amortised), {cfg.batch_size/scan_ms*1e3:.1f} items/s")


if __name__ == "__main__":
    main()

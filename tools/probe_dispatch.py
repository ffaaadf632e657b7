#!/usr/bin/env python
"""Dispatch-overhead decomposition for the streaming step (round-4 item 3).

The per-dispatch "device_step_ms" reported by pipelined timing mixes three
things: true device compute, the tunnel's per-dispatch host enqueue cost,
and any per-buffer marshalling that scales with the state pytree.  This
probe measures, in ONE process:

  1. pipelined rate of a trivial jit (scalar add)          -> dispatch floor
  2. pipelined rate of a state-sized identity jit          -> +buffer cost
  3. pipelined rate of the real step / append / read        -> +compute
  4. a profiler trace of the SINGLE-dispatch step program   -> true device ms

Usage: python tools/probe_dispatch.py [n_chunk]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    from eventad_tpu.utils.jaxtools import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    from eventad_tpu.config import Config
    from eventad_tpu.models.backbone import make_backbone_config
    from eventad_tpu.models.dagr import graph_static_config, init_model
    from eventad_tpu.models.eventad import EventADConfig
    from eventad_tpu.streaming.incremental import (init_incremental_state,
                                                   insert_raw,
                                                   make_incremental_step,
                                                   update_image)

    n_buf = 16384
    cfg = Config(batch_size=1, use_image=True, event_buckets=(n_buf,),
                 compute_dtype="bfloat16")
    params, state, bc0, _ = init_model(jax.random.PRNGKey(0), cfg)
    cfg1 = cfg.replace(batch_size=1)
    bc = make_backbone_config(cfg1)
    mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                       max_boxes=cfg.max_boxes)
    gsc = graph_static_config(cfg1)
    s1 = cfg.max_boxes + 1
    rng = np.random.RandomState(0)
    st = init_incremental_state(n_buf, bc, mc,
                                max_neighbors=cfg.max_neighbors)
    img = jnp.asarray(rng.rand(cfg.model_height, cfg.model_width, 3)
                      .astype(np.float32))
    st = update_image(params, state, st, img, cfg.img_net)
    refresh, step = make_incremental_step(params, state, bc, mc, gsc,
                                          n_chunk=n_chunk, n_buf=n_buf)
    boxes = np.zeros((s1, 4), np.float32)
    present = np.zeros((s1,), bool)
    for k in range(4):
        boxes[k + 1] = (10 + 20 * k, 10, 30, 30)
        present[k + 1] = True
    boxes, present = jnp.asarray(boxes), jnp.asarray(present)
    t_base = [1_000_000]

    def chunk():
        ev = np.zeros((n_chunk, 3), np.int32)
        ev[:, 0] = rng.randint(0, cfg.model_width, n_chunk)
        ev[:, 1] = rng.randint(0, cfg.model_height, n_chunk)
        ev[:, 2] = t_base[0] + np.sort(rng.randint(0, 2000, n_chunk))
        t_base[0] += 2000
        return jnp.asarray(ev)

    ones = jnp.ones((n_chunk,))
    for _ in range(n_buf // n_chunk):
        st = insert_raw(st, chunk(), ones, jnp.int32(n_chunk))
    st = refresh(st)
    _ = np.asarray(st.t_now).ravel()

    def pipelined(fn, n=30):
        s2, last = fn(st)
        _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(n):
            s2, last = fn(s2)
        _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
        return (time.perf_counter() - t0) / n * 1e3

    # 1. trivial scalar jit
    triv = jax.jit(lambda x: x + 1.0)
    x0 = jnp.float32(0.0)
    _ = np.asarray(triv(x0))
    t0 = time.perf_counter()
    y = x0
    for _ in range(50):
        y = triv(y)
    _ = np.asarray(y)
    floor_ms = (time.perf_counter() - t0) / 50 * 1e3
    print(f"dispatch_floor_scalar_ms {floor_ms:.3f}", flush=True)

    # 2. state-sized identity (same pytree in and out, donated)
    @jax.jit
    def ident(s):
        return s._replace(t_now=s.t_now + 1), s.t_now
    print(f"dispatch_state_identity_ms {pipelined(ident):.3f}", flush=True)

    # 3. real programs
    print(f"dispatch_step_ms "
          f"{pipelined(lambda s: step(s, chunk(), ones, jnp.int32(n_chunk), boxes, present)):.3f}",
          flush=True)
    print(f"dispatch_append_ms "
          f"{pipelined(lambda s: (step.append(s, chunk(), ones, jnp.int32(n_chunk)), jnp.float32(0))):.3f}",
          flush=True)
    print(f"dispatch_read_ms "
          f"{pipelined(lambda s: (s, step.read_scores(s, boxes, present)[1])):.3f}",
          flush=True)

    # 4. profiler trace of the single-dispatch step
    tdir = "/tmp/jax_trace_singlestep"
    os.system(f"rm -rf {tdir}")
    ITERS = 10
    with jax.profiler.trace(tdir):
        s2 = st
        for _ in range(ITERS):
            s2, logits = step(s2, chunk(), ones, jnp.int32(n_chunk), boxes,
                              present)
            _ = np.asarray(logits).ravel()[0]
    from trace_forward import parse
    print(f"\n===== single-dispatch step trace ({ITERS} iters) =====",
          flush=True)
    parse(tdir, iters=ITERS, top=25)


if __name__ == "__main__":
    main()

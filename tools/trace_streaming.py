#!/usr/bin/env python
"""Per-op device profile of the incremental streaming path.

Captures separate traces for the three jitted programs (append /
read_scores / refresh) so each op list is attributable, then prints the
same hlo_stats tables as tools/trace_forward.py.

Usage:
  python tools/trace_streaming.py [n_chunk] [append|read|refresh|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_forward import parse  # noqa: E402  (same dir)

TRACE_BASE = "/tmp/jax_trace_stream"
ITERS = 5


def main():
    args = sys.argv[1:]
    n_chunk = int(args[0]) if args else 512
    which = args[1] if len(args) > 1 else "all"

    import jax
    from eventad_tpu.utils.jaxtools import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from eventad_tpu.config import Config
    from eventad_tpu.models.backbone import make_backbone_config
    from eventad_tpu.models.dagr import graph_static_config, init_model
    from eventad_tpu.models.eventad import EventADConfig
    from eventad_tpu.streaming.incremental import (init_incremental_state,
                                                   insert_raw,
                                                   make_incremental_step)
    from eventad_tpu.streaming.incremental import update_image

    n_buf = int(os.environ.get("EVENTAD_TRACE_NBUF", 16384))
    cfg = Config(batch_size=1, use_image=True, event_buckets=(n_buf,),
                 compute_dtype="bfloat16")
    params, state, bc, mc0 = init_model(jax.random.PRNGKey(0), cfg)
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

    def run_append():
        nonlocal st
        st = step.append(st, chunk(), ones, jnp.int32(n_chunk))
        return st.t_now

    def run_read():
        _, logits = step.read_scores(st, boxes, present)
        return logits

    def run_refresh():
        nonlocal st
        st = refresh(st)
        return st.t_now

    m_scan = 8

    def run_stepscan():
        """One dispatch = m_scan full frames (append + score read): the
        north-star program.  Reported times are for m_scan frames."""
        nonlocal st
        pcs = jnp.stack([chunk() for _ in range(m_scan)])
        pls = jnp.ones((m_scan, n_chunk))
        cnts = jnp.full((m_scan,), n_chunk, jnp.int32)
        bxs = jnp.broadcast_to(boxes, (m_scan,) + boxes.shape)
        bps = jnp.broadcast_to(present, (m_scan,) + present.shape)
        st, logits = step.many(st, pcs, pls, cnts, bxs, bps)
        return logits

    def run_detect():
        from eventad_tpu.models.detector import init_detector
        from eventad_tpu.streaming.detect import (make_incremental_detector,
                                                  update_image_detector)
        dparams, dstate, dbc = init_detector(jax.random.PRNGKey(0), cfg1)
        st2 = init_incremental_state(n_buf, dbc, mc,
                                     max_neighbors=cfg.max_neighbors)
        st2 = update_image_detector(dparams, dstate, st2, img, dbc,
                                    cfg.img_net)
        drefresh, _dappend, read_det = make_incremental_detector(
            dparams, dstate, dbc, gsc, n_chunk=n_chunk, n_buf=n_buf)
        for _ in range(n_buf // n_chunk):
            st2 = insert_raw(st2, chunk(), ones, jnp.int32(n_chunk))
        st2 = drefresh(st2)

        def go():
            dets, _dec = read_det(st2)
            return dets["scores"]
        return go

    progs = {"append": run_append, "read": run_read,
             "refresh": run_refresh, "stepscan": run_stepscan}
    names = list(progs) + ["detect"] if which == "all" else [which]
    for name in names:
        fn = run_detect() if name == "detect" else progs[name]
        _ = np.asarray(fn()).ravel()[0]   # compile + warm
        _ = np.asarray(fn()).ravel()[0]
        tdir = f"{TRACE_BASE}_{name}"
        os.system(f"rm -rf {tdir}")
        with jax.profiler.trace(tdir):
            for _ in range(ITERS):
                _ = np.asarray(fn()).ravel()[0]
        extra = f", {m_scan} frames/iter" if name == "stepscan" else ""
        print(f"\n===== {name} (chunk={n_chunk}{extra}) =====")
        parse(tdir, iters=ITERS, top=30)


if __name__ == "__main__":
    main()

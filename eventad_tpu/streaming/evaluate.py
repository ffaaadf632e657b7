"""Streaming-mode evaluation harness: latency bench + sync-vs-streaming
consistency check + FLOP comparison.

Reference: ``evaluate_flops`` (src/dagr/asynchronous/evaluate_flops.py:82-261)
— it runs the dense model and the asynchronous model on the same data and
reports per-layer activation differences (the de-facto correctness test of
the async runtime, SURVEY.md 4.1) plus dense-vs-sparse FLOPs.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import make_backbone_config
from ..models.dagr import ModelParams, ModelState, graph_static_config, \
    model_forward
from ..utils.flops import backbone_flops
from .runner import make_stream_step, update_image
from .state import init_streaming_state


def consistency_check(params: ModelParams, state: ModelState, cfg,
                      events_pos: np.ndarray, events_pol: np.ndarray,
                      boxes: np.ndarray, box_present: np.ndarray,
                      *, n_chunks: int = 4, atol: float = 1e-3):
    """Feed one window through the batch path and through the streaming path
    in ``n_chunks`` pieces; compare the final per-slot logits.

    Exact equality is expected when the stream buffer covers the full
    window: the graph construction sees identical candidate sets and the
    head runs one recurrent step either way.
    Returns (max_abs_diff, batch_logits, stream_logits)."""
    bc = make_backbone_config(cfg.replace(batch_size=1))
    mc_cfg = cfg.replace(batch_size=1)
    from ..models.eventad import EventADConfig
    mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                       max_boxes=cfg.max_boxes)
    gsc = graph_static_config(mc_cfg)

    n = len(events_pol)
    # ---- batch path (single forward over the whole window) ----
    from ..data.batching import EventBatch
    s1 = cfg.max_boxes + 1
    t_now = int(events_pos[:, 2].max())
    pos_rel = events_pos.copy()
    pos_rel[:, 2] = events_pos[:, 2] - t_now + cfg.time_window_us
    from .. import native
    ranks = native.queue_ranks(pos_rel[:, 0], pos_rel[:, 1],
                               cfg.model_width, cfg.model_height)
    batch = EventBatch(
        pos=pos_rel[None], polarity=events_pol[None],
        valid=np.ones((1, n), bool), rank=ranks[None],
        image=np.zeros((1, cfg.model_height, cfg.model_width, 3),
                       np.float32),
        boxes=np.broadcast_to(boxes[None, None], (1, 2, s1, 4)).copy(),
        box_present=np.broadcast_to(box_present[None, None],
                                    (1, 2, s1)).copy(),
        box_labels=np.zeros((1, s1), np.int32),
        bbox=np.zeros((1, 1, 6), np.float32),
        bbox_mask=np.ones((1, 1), bool),
        bbox0=np.zeros((1, 1, 6), np.float32),
        bbox0_mask=np.ones((1, 1), bool))
    out, _ = model_forward(params, state, jax.tree.map(jnp.asarray, batch),
                           bc, mc, gsc, img_net=cfg.img_net, training=False)
    batch_logits = np.asarray(out.logits[0])

    # ---- streaming path: same events fed in chunks, logits at the end ----
    chunk = -(-n // n_chunks)
    sstate = init_streaming_state(n_buf=n, max_boxes=cfg.max_boxes,
                                  h_dim=cfg.h_dim)
    if bc.use_image:
        sstate = update_image(params, state, sstate,
                              jnp.asarray(batch.image[0]), cfg.img_net)
    step = make_stream_step(params, state, bc, mc, gsc, n_chunk=chunk)
    logits = None
    for ci in range(n_chunks):
        lo, hi = ci * chunk, min((ci + 1) * chunk, n)
        buf_pos = np.zeros((chunk, 3), np.int32)
        buf_pol = np.zeros((chunk,), np.float32)
        buf_pos[: hi - lo] = events_pos[lo:hi]
        buf_pol[: hi - lo] = events_pol[lo:hi]
        if ci < n_chunks - 1:
            # intermediate chunks: no boxes yet (scores only at frame time)
            sstate, _ = step(sstate, jnp.asarray(buf_pos),
                             jnp.asarray(buf_pol), jnp.int32(hi - lo),
                             jnp.zeros((s1, 4)), jnp.zeros((s1,), bool))
        else:
            sstate, logits = step(sstate, jnp.asarray(buf_pos),
                                  jnp.asarray(buf_pol), jnp.int32(hi - lo),
                                  jnp.asarray(boxes),
                                  jnp.asarray(box_present))
    stream_logits = np.asarray(logits)
    valid = np.asarray(out.valid[0])
    diff = np.abs(np.where(valid[:, None], batch_logits, 0)
                  - np.where(valid[:, None], stream_logits, 0)).max()
    return float(diff), batch_logits, stream_logits


def latency_bench(params: ModelParams, state: ModelState, cfg, *,
                  n_buf: int = 16384, n_chunk: int = 512,
                  iters: int = 50, boxes_per_frame: int = 4, seed: int = 0):
    """p50/p99 per-chunk latency of the jitted streaming step (the ~ms
    response-time claim, BASELINE.md north star)."""
    rng = np.random.RandomState(seed)
    bc = make_backbone_config(cfg.replace(batch_size=1))
    from ..models.eventad import EventADConfig
    mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                       max_boxes=cfg.max_boxes)
    gsc = graph_static_config(cfg.replace(batch_size=1))
    s1 = cfg.max_boxes + 1
    sstate = init_streaming_state(n_buf=n_buf, max_boxes=cfg.max_boxes,
                                  h_dim=cfg.h_dim)
    if bc.use_image:
        img = jnp.asarray(rng.rand(cfg.model_height, cfg.model_width, 3)
                          .astype(np.float32))
        sstate = update_image(params, state, sstate, img, cfg.img_net)
    step = make_stream_step(params, state, bc, mc, gsc, n_chunk=n_chunk)

    boxes = np.zeros((s1, 4), np.float32)
    present = np.zeros((s1,), bool)
    for k in range(boxes_per_frame):
        boxes[k + 1] = (10 + 20 * k, 10, 30, 30)
        present[k + 1] = True
    boxes = jnp.asarray(boxes)
    present = jnp.asarray(present)

    t_base = 1_000_000
    times = []
    for i in range(iters + 5):
        ev = np.zeros((n_chunk, 3), np.int32)
        ev[:, 0] = rng.randint(0, cfg.model_width, n_chunk)
        ev[:, 1] = rng.randint(0, cfg.model_height, n_chunk)
        ev[:, 2] = t_base + np.sort(rng.randint(0, 2000, n_chunk))
        t_base += 2000
        t0 = time.perf_counter()
        sstate, logits = step(sstate, jnp.asarray(ev),
                              jnp.ones((n_chunk,), jnp.float32),
                              jnp.int32(n_chunk), boxes, present)
        _ = np.asarray(logits).ravel()[0]   # force full sync
        if i >= 5:
            times.append(time.perf_counter() - t0)
    times = np.sort(np.array(times))
    return {
        "p50_ms": float(times[len(times) // 2] * 1e3),
        "p99_ms": float(times[int(len(times) * 0.99) - 1] * 1e3),
        "mean_ms": float(times.mean() * 1e3),
        "events_per_chunk": n_chunk,
    }


def latency_bench_incremental(params: ModelParams, state: ModelState, cfg,
                              *, n_buf: int = 16384, n_chunk: int = 512,
                              iters: int = 50, boxes_per_frame: int = 4,
                              seed: int = 0):
    """p50/p99 per-chunk latency of the *incremental* streaming step
    (cached level-0 activations; the reference async runtime analog)."""
    from .incremental import (init_incremental_state, insert_raw,
                              make_incremental_step)
    from .incremental import update_image as inc_update_image
    rng = np.random.RandomState(seed)
    cfg1 = cfg.replace(batch_size=1)
    bc = make_backbone_config(cfg1)
    from ..models.eventad import EventADConfig
    mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                       max_boxes=cfg.max_boxes)
    gsc = graph_static_config(cfg1)
    s1 = cfg.max_boxes + 1
    st = init_incremental_state(n_buf, bc, mc,
                                max_neighbors=cfg.max_neighbors)
    if bc.use_image:
        img = jnp.asarray(rng.rand(cfg.model_height, cfg.model_width, 3)
                          .astype(np.float32))
        st = inc_update_image(params, state, st, img, cfg.img_net)
    refresh, step = make_incremental_step(params, state, bc, mc, gsc,
                                          n_chunk=n_chunk, n_buf=n_buf)

    boxes = np.zeros((s1, 4), np.float32)
    present = np.zeros((s1,), bool)
    for k in range(boxes_per_frame):
        boxes[k + 1] = (10 + 20 * k, 10, 30, 30)
        present[k + 1] = True
    boxes = jnp.asarray(boxes)
    present = jnp.asarray(present)

    def chunk(t_base):
        ev = np.zeros((n_chunk, 3), np.int32)
        ev[:, 0] = rng.randint(0, cfg.model_width, n_chunk)
        ev[:, 1] = rng.randint(0, cfg.model_height, n_chunk)
        ev[:, 2] = t_base + np.sort(rng.randint(0, 2000, n_chunk))
        return jnp.asarray(ev)

    t_base = 1_000_000
    # fill the buffer, then refresh once (the per-frame rebuild)
    for _ in range(n_buf // n_chunk):
        st = insert_raw(st, chunk(t_base), jnp.ones((n_chunk,)),
                        jnp.int32(n_chunk))
        t_base += 2000
    st = refresh(st)                      # compile
    _ = np.asarray(st.h1).ravel()[0]
    t0 = time.perf_counter()
    st = refresh(st)
    _ = np.asarray(st.h1).ravel()[0]
    refresh_ms = (time.perf_counter() - t0) * 1e3

    times, atimes = [], []
    for i in range(iters + 5):
        ev = chunk(t_base)
        t_base += 2000
        t0 = time.perf_counter()
        st, logits = step(st, ev, jnp.ones((n_chunk,)), jnp.int32(n_chunk),
                          boxes, present)
        _ = np.asarray(logits).ravel()[0]
        if i >= 5:
            times.append(time.perf_counter() - t0)
        # append-only hot path (no score read)
        ev = chunk(t_base)
        t_base += 2000
        t0 = time.perf_counter()
        st = step.append(st, ev, jnp.ones((n_chunk,)), jnp.int32(n_chunk))
        _ = np.asarray(st.t_now).ravel()[0]
        if i >= 5:
            atimes.append(time.perf_counter() - t0)
    times = np.sort(np.array(times))
    atimes = np.sort(np.array(atimes))

    # per-dispatch estimates: enqueue a run of steps, one final sync — the
    # per-call timings above pay a ~35-40 ms host round-trip through the
    # dev tunnel per step, which colocated deployment would not.  Inputs
    # are STAGED ON DEVICE before timing (with live, advancing
    # timestamps): generating + transferring each chunk inside the timed
    # loop costs ~3 ms of host work per dispatch through the tunnel and
    # was the round-3 inflation of this number (4.9 "device" ms that were
    # neither device nor dispatch).  What remains per dispatch is device
    # compute + the tunnel's irreducible enqueue floor (measured below as
    # dispatch_floor_ms; tools/probe_dispatch.py decomposition).
    ones_dev = jnp.ones((n_chunk,))
    nnew_dev = jnp.int32(n_chunk)

    def staged(n):
        nonlocal t_base
        cks = [chunk(t_base + 2000 * i) for i in range(n)]
        t_base += 2000 * n          # keep the event clock live across calls
        return cks

    def pipelined_staged(fn, n=30):
        """fn(state, chunk) -> (state, last_output); chunks pre-staged."""
        cks = staged(n + 1)
        s2, last = fn(st, cks[0])          # compile + warm
        _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
        t0 = time.perf_counter()
        for i in range(n):
            s2, last = fn(s2, cks[i + 1])
        _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
        return (time.perf_counter() - t0) / n * 1e3

    dev_step = pipelined_staged(
        lambda s, ck: step(s, ck, ones_dev, nnew_dev, boxes, present))
    dev_append = pipelined_staged(
        lambda s, ck: (step.append(s, ck, ones_dev, nnew_dev),) * 2)
    dev_read = pipelined_staged(
        lambda s, _ck: step.read_scores(s, boxes, present))

    # the tunnel's per-dispatch enqueue floor: even a scalar add cannot
    # dispatch faster than this (colocated deployment would be ~0.1 ms)
    triv = jax.jit(lambda x: x + 1.0)
    y = jnp.float32(0.0)
    _ = np.asarray(triv(y))
    t0 = time.perf_counter()
    for _ in range(50):
        y = triv(y)
    _ = np.asarray(y)
    dispatch_floor = (time.perf_counter() - t0) / 50 * 1e3

    # true single-dispatch DEVICE latency from the profiler (the number
    # the tunnel cannot distort): one full frame step per dispatch
    from ..utils.jaxtools import trace_device_ms
    trace_warm, trace_iters = 3, 8
    tcks = staged(trace_warm + trace_iters)   # exactly one chunk per call
    tstate = [st]

    def one_step():
        s2, logits = step(tstate[0], tcks.pop(0), ones_dev, nnew_dev,
                          boxes, present)
        tstate[0] = s2
        _ = np.asarray(logits).ravel()[0]
    for _ in range(trace_warm):
        one_step()      # bring the candidate window to steady state
    try:
        dev_step_trace = trace_device_ms(one_step, iters=trace_iters)
    except Exception as e:
        print(f"streaming trace failed ({type(e).__name__}: {e}); "
              "device_step_trace_ms will be null", file=sys.stderr)
        dev_step_trace = None

    # scan-amortized rates: M frames per dispatch.  Honesty requires two
    # things an earlier version got wrong.  (1) M must be large enough
    # that device work dominates the per-dispatch HOST enqueue (~10 ms
    # through the tunnel) — at M=8 the quotient mostly measured enqueue
    # rate, not device time.  (2) chunk timestamps must be REBASED
    # in-program off the advancing state clock: reusing absolute-time
    # chunks across the chained dispatches goes stale (events age out of
    # the delta_t window, and the data-dependent search/conv bounds do
    # less work than a live stream would).
    m_scan = 128
    rel = jnp.asarray(np.stack(
        [np.asarray(chunk(2000 * j)) for j in range(m_scan)]))
    pls = jnp.ones((m_scan, n_chunk))
    cnts = jnp.full((m_scan,), n_chunk, jnp.int32)
    bxs = jnp.broadcast_to(boxes, (m_scan,) + boxes.shape)
    bps = jnp.broadcast_to(present, (m_scan,) + present.shape)

    @jax.jit
    def append_scan_fresh(s):
        pcs = rel.at[:, :, 2].add(s.t_now.astype(rel.dtype) + 1)
        return step.append_many(s, pcs, pls, cnts)

    @jax.jit
    def step_scan_fresh(s):
        pcs = rel.at[:, :, 2].add(s.t_now.astype(rel.dtype) + 1)
        return step.many(s, pcs, pls, cnts, bxs, bps)

    def pipelined_scan(fn, n=6):
        """fn(state) -> (state, last); no per-call inputs (the scan
        programs rebase their chunk timestamps in-program)."""
        s2, last = fn(st)                 # compile + warm
        _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(n):
            s2, last = fn(s2)
        _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
        return (time.perf_counter() - t0) / n * 1e3

    dev_append_scan = pipelined_scan(
        lambda s: (append_scan_fresh(s),) * 2, n=6) / m_scan
    dev_step_scan = pipelined_scan(lambda s: step_scan_fresh(s),
                                   n=6) / m_scan

    return {
        "p50_ms": float(times[len(times) // 2] * 1e3),
        "p99_ms": float(times[int(len(times) * 0.99) - 1] * 1e3),
        "mean_ms": float(times.mean() * 1e3),
        "append_p50_ms": float(atimes[len(atimes) // 2] * 1e3),
        "refresh_ms": refresh_ms,
        "device_step_ms": dev_step,
        "device_step_trace_ms": dev_step_trace,
        "dispatch_floor_ms": dispatch_floor,
        "device_step_scan_ms": dev_step_scan,
        "device_append_ms": dev_append,
        "device_append_scan_ms": dev_append_scan,
        "device_read_ms": dev_read,
        "events_per_chunk": n_chunk,
    }


def latency_bench_detect(cfg, *, n_buf: int = 16384, n_chunk: int = 512,
                         iters: int = 20, seed: int = 0):
    """Pipelined device time of the streaming DETECTION read-out
    (read_detections: pool + upper levels + GNN head + fusion + decode +
    NMS from cached level-0 state)."""
    import jax
    from ..models.detector import init_detector
    from ..models.eventad import EventADConfig
    from .detect import make_incremental_detector, update_image_detector
    from .incremental import init_incremental_state, insert_raw
    rng = np.random.RandomState(seed)
    cfg1 = cfg.replace(batch_size=1)
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg1)
    gsc = graph_static_config(cfg1)
    st = init_incremental_state(n_buf, bc, EventADConfig(),
                                max_neighbors=cfg.max_neighbors)
    refresh, append, read_det = make_incremental_detector(
        params, state, bc, gsc, n_chunk=n_chunk, n_buf=n_buf)
    if bc.use_image:
        img = jnp.asarray(rng.rand(cfg.model_height, cfg.model_width, 3)
                          .astype(np.float32))
        st = update_image_detector(params, state, st, img, bc, cfg.img_net)
    t_base = 1_000_000
    for _ in range(n_buf // n_chunk):
        ev = np.zeros((n_chunk, 3), np.int32)
        ev[:, 0] = rng.randint(0, cfg.model_width, n_chunk)
        ev[:, 1] = rng.randint(0, cfg.model_height, n_chunk)
        ev[:, 2] = t_base + np.sort(rng.randint(0, 2000, n_chunk))
        t_base += 2000
        st = insert_raw(st, jnp.asarray(ev), jnp.ones((n_chunk,)),
                        jnp.int32(n_chunk))
    st = refresh(st)
    dets, _ = read_det(st)                 # compile
    _ = np.asarray(dets["scores"]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        dets, _ = read_det(st)
    _ = np.asarray(dets["scores"]).ravel()[0]
    return {"device_read_detections_ms":
            (time.perf_counter() - t0) / iters * 1e3}


def flops_report(cfg, n_events: int, changed_events: int):
    """Dense vs incremental FLOP comparison (evaluate_flops analog)."""
    bc = make_backbone_config(cfg)
    dense = backbone_flops(bc, n_events)
    delta = backbone_flops(bc, n_events, streaming_changed=changed_events)
    return {
        "dense_mflops": dense.total() / 1e6,
        "delta_mflops": delta.total() / 1e6,
        "ratio": delta.total() / max(dense.total(), 1.0),
        "dense_by_layer": dense.by_layer(),
        "delta_by_layer": delta.by_layer(),
    }

#!/usr/bin/env python
"""Headline benchmark: batched inference throughput of the full EventAD
pipeline at the reference's operating point (360x240, batch 6, dagr-S,
ResNet-50 fusion), measured like the reference FPS harness (bounding boxes
per second, utils/fps.py:58).

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: 595.48 bboxes/s (reference committed run, BASELINE.md).

Timeout resilience (the round-3 driver run timed out before printing
anything, BENCH_r03.json rc=124): the sync + pipelined headline is printed
and FLUSHED as soon as it is measured; the scan-amortized device metrics
and their extra compiles only run within a wall-clock budget
(EVENTAD_BENCH_BUDGET_S, default 300 s measured from process start) and any
failure there still leaves the first parseable record.  The final line is a
superset of the first (same headline values).
"""
import json
import os
import sys
import time

T_START = time.monotonic()
# Hard total guard (headline-inclusive).  The tunnel preamble alone has
# been measured anywhere from 80 to 780 s between runs (same code, same
# cache) — so the scan/train extras are gated on time SINCE THE HEADLINE
# FLUSHED (EVENTAD_BENCH_EXTRA_S), not on process age: a slow-tunnel day
# should not silently drop the device-true metrics, and every print is a
# superset of the previous one, so even a driver timeout mid-extras keeps
# everything already measured.
BUDGET_S = float(os.environ.get("EVENTAD_BENCH_BUDGET_S", "1800"))
EXTRA_S = float(os.environ.get("EVENTAD_BENCH_EXTRA_S", "300"))

from eventad_tpu.utils.jaxtools import setup_compilation_cache, wait_for_tpu
wait_for_tpu()   # bounded wait if the axon tunnel is down (vs hanging)
import jax

setup_compilation_cache()
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 595.48


def _log(msg):
    print(f"bench[{time.monotonic() - T_START:6.1f}s]: {msg}",
          file=sys.stderr, flush=True)


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import (graph_static_config, init_model,
                                         model_forward)

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    # bf16 frozen-feature path is the production inference mode (validated
    # vs f32 in tests/test_bf16_path.py at trained logit scale); pass
    # "float32" as argv[2] for the strict-f32 number
    cfg = Config(batch_size=6, use_image=True, compute_dtype=dtype,
                 event_buckets=(n_events,))   # 1080/3 x 720/3 = 360x240
    # Device init costs ~100 s of tiny RNG dispatches through the tunnel,
    # but BOTH attempted shortcuts wedge under the axon plugin (round 4):
    # an in-process CPU-backend init hangs outright, and the packed
    # eval_shape+numpy init (jaxtools.packed_random_like — correct and
    # CPU-tested) stalled on its unpack compile through the tunnel.  The
    # driver path stays on the plain, proven init; set
    # EVENTAD_BENCH_FAST_INIT=1 to opt into the packed path.
    if os.environ.get("EVENTAD_BENCH_FAST_INIT") == "1":
        from eventad_tpu.models.backbone import make_backbone_config
        from eventad_tpu.models.eventad import EventADConfig
        from eventad_tpu.utils.jaxtools import packed_random_like
        _log("initializing model (packed fast init)...")
        params, state = packed_random_like(
            lambda: init_model(jax.random.PRNGKey(0), cfg)[:2])
        bc = make_backbone_config(cfg)
        mc = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                           max_boxes=cfg.max_boxes)
    else:
        _log("initializing model...")
        params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))

    @jax.jit
    def fwd(params, state, batch):
        out, _ = model_forward(params, state, batch, bc, mc, gsc,
                               img_net=cfg.img_net, training=False)
        return out.logits

    # bboxes per batch, counted like the reference (bbox + bbox0)
    n_boxes = int(np.asarray(batch.bbox_mask).sum()
                  + np.asarray(batch.bbox0_mask).sum())

    def sync(out):
        # a tiny device->host fetch is the only reliable full sync through
        # the axon tunnel (block_until_ready alone returns early there)
        np.asarray(out).ravel()[0]

    _log("compiling forward...")
    sync(fwd(params, state, batch))   # compile
    _log("forward compiled")
    warmup, iters = 5, 20
    for _ in range(warmup):
        sync(fwd(params, state, batch))

    # reference protocol: per-batch synchronization (utils/fps.py:62-72
    # brackets every batch with cuda.synchronize); median per-call time
    # dampens host-tunnel latency spikes
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fwd(params, state, batch))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) * iters

    # pipelined protocol: enqueue all batches, one final sync — how a
    # production serving loop runs; excludes per-call host round-trips.
    # (device execution is in-order, so fetching the last output implies
    # all previous batches completed)
    t0 = time.perf_counter()
    outs = [fwd(params, state, batch) for _ in range(iters)]
    sync(outs[-1])
    dt_pipe = time.perf_counter() - t0

    fps = n_boxes * iters / dt
    per_batch_ms = dt / iters * 1e3
    device_ms = dt_pipe / iters * 1e3
    result = {
        "metric": "inference_bboxes_per_sec",
        "value": round(fps, 2),
        "unit": "bboxes/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "batch_ms": round(per_batch_ms, 2),
        "pipelined_bboxes_per_sec": round(n_boxes * iters / dt_pipe, 2),
        "pipelined_vs_baseline": round(n_boxes * iters / dt_pipe
                                       / BASELINE_FPS, 3),
        "events_per_item": n_events,
        "frames_per_sec": round(cfg.batch_size * iters / dt, 2),
        # sync-number decomposition: per-call time = device time + host
        # round-trip; the RTT term is the axon tunnel's (32-50 ms, +-40%
        # between processes) and is NOT controllable from this repo.
        # NOTE: bounded by the tunnel's ~10 ms/dispatch host enqueue rate,
        # not the chip — the device-true number is scan_device_ms_per_batch
        # (key was "device_ms_per_batch" through BENCH_r02)
        "pipelined_ms_per_batch": round(device_ms, 2),
    }
    # FIRST parseable record: a later timeout/crash cannot erase this
    print(json.dumps(result), flush=True)
    t_headline = time.monotonic()

    def within_budget():
        return (time.monotonic() - t_headline < EXTRA_S
                and time.monotonic() - T_START < BUDGET_S)

    _log("headline printed; computing roofline + scan metrics")

    # ---- analytic roofline (model flops, minimum HBM bytes) -------------
    # XLA's cost model cannot see the Pallas custom calls and its "bytes
    # accessed" is pre-fusion logical volume (BENCH_r02's number implied
    # 2.1x the physical HBM peak) — utils/roofline.py derives both
    # numerators from the architecture instead; XLA's figures are kept as
    # auxiliary fields for comparison.
    from eventad_tpu.utils.roofline import forward_roofline, roofline_rates
    roof = forward_roofline(cfg, n_events)
    try:
        cost = fwd.lower(params, state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        result["xla_gflops_per_batch"] = round(
            float(cost.get("flops", 0.0)) / 1e9, 1)
        result["xla_gbytes_per_batch"] = round(
            float(cost.get("bytes accessed", 0.0)) / 1e9, 2)
    except Exception as e:
        _log(f"cost analysis unavailable: {e}")

    # scan-amortized device time: run the forward N times inside ONE
    # program (lax.scan with a serialising scalar carry), so the host
    # enqueue rate (~10 ms/dispatch through the axon tunnel, which BOUNDS
    # the pipelined protocol above) drops out entirely. The carry perturbs
    # EVERY batch input by a dynamically-zero scalar (add-0 / xor-false are
    # not foldable when the operand is dynamic), so no stage of the model —
    # graph build, CNN branch, image gather — is loop-invariant and nothing
    # can be hoisted out of the scan. Parameters stay invariant, which is
    # the real serving situation. Two scan lengths make the host round-trip
    # cancel exactly: device_ms = (T_n2 - T_n1) / (n2 - n1).
    from eventad_tpu.utils.jaxtools import dynamic_zero_perturb as perturb

    def make_scan(n):
        @jax.jit
        def fwd_scan(params, state, batch):
            def body(c, _):
                out, _ = model_forward(params, state, perturb(batch, c),
                                       bc, mc, gsc,
                                       img_net=cfg.img_net, training=False)
                return (out.logits[0, 0].sum() * 0.0).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return fwd_scan

    def best_wall(f, reps=4):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(params, state, batch))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    scan_device_ms = None
    scan_single_program = False
    try:
        # 10/50 with best-of-4: the host round-trip cancels in the delta,
        # but the tunnel's per-call jitter (+-40% on a bad day) doesn't —
        # a longer second scan and one more rep shrink the delta's noise
        n1, n2 = 10, 50
        if within_budget():
            scan1 = make_scan(n1)
            _log("compiling scan program (length %d)..." % n1)
            sync(scan1(params, state, batch))
            _log("scan1 compiled")
            w1 = best_wall(scan1)
            if within_budget():
                scan2 = make_scan(n2)
                _log("compiling scan program (length %d)..." % n2)
                sync(scan2(params, state, batch))
                _log("scan2 compiled")
                scan_device_ms = (best_wall(scan2) - w1) / (n2 - n1) * 1e3
            else:
                # single-scan fallback: subtract the RTT estimated from the
                # sync-vs-pipelined decomposition (coarser, but recorded)
                rtt = max(per_batch_ms - dt_pipe / iters * 1e3, 0.0)
                scan_device_ms = max(w1 * 1e3 - rtt, 0.0) / n1
                scan_single_program = True
                _log("budget exceeded after scan1 — single-scan estimate")
        else:
            _log(f"extras budget {EXTRA_S:.0f}s exceeded — "
                 f"skipping scan metrics")
    except Exception as e:
        _log(f"scan metrics failed: {e}")

    # "> 0" (not truthiness): a legitimately-computed 0.0 from the
    # single-scan fallback means the RTT estimate swallowed the whole wall
    # time — no usable device number, so no scan metrics (and no
    # scan_single_program flag without the metrics it qualifies)
    if scan_device_ms is not None and scan_device_ms > 0:
        if scan_single_program:
            result["scan_single_program"] = True
        result.update({
            # pure device throughput (scan-amortised, host enqueue
            # cancelled); the "pipelined" figures above are bounded by the
            # tunnel's ~10 ms/dispatch enqueue rate, not by the chip
            "scan_device_ms_per_batch": round(scan_device_ms, 2),
            "scan_bboxes_per_sec": round(n_boxes / scan_device_ms * 1e3, 2),
            "scan_vs_baseline": round(n_boxes / scan_device_ms * 1e3
                                      / BASELINE_FPS, 3),
            "est_rtt_ms": round(max(per_batch_ms - scan_device_ms, 0.0), 2),
        })
        # roofline view over the scan-amortised per-batch device time
        result.update(roofline_rates(roof, scan_device_ms / 1e3,
                                     compute_dtype=dtype))
    print(json.dumps(result), flush=True)

    # ---- profiler-based device time (budget-gated): the xprof hlo_stats
    # total is bit-stable across processes and immune to tunnel jitter —
    # the cross-run-comparable device number (the scan delta above can
    # wobble +-0.3 ms on a bad tunnel day) ----
    try:
        if within_budget():
            from eventad_tpu.utils.jaxtools import trace_device_ms
            dev = trace_device_ms(lambda: sync(fwd(params, state, batch)),
                                  iters=6, trace_dir="/tmp/ev_trace_bench")
            if dev:
                result["trace_device_ms_per_batch"] = round(dev, 2)
                print(json.dumps(result), flush=True)
    except Exception as e:
        _log(f"trace metric failed: {e}")

    # ---- training throughput (budget-gated): the anomaly-head training
    # regime the reference runs (frozen DAGR, recurrent head trained;
    # EventAD.py:149-150) at the same operating point.  One driver-captured
    # number so the training claim has the same evidentiary status as the
    # inference one — the final JSON line stays a superset of the earlier
    # ones. ----
    try:
        if within_budget():
            from eventad_tpu.parallel import make_optimizer, make_train_fns
            _log("compiling train step...")
            optimizer = make_optimizer(cfg.learning_rate, cfg.weight_decay,
                                       cfg.grad_clip)
            opt_state = optimizer.init(params.head)
            fns = make_train_fns(cfg, bc, mc, gsc, optimizer)
            rng = jax.random.PRNGKey(0)
            p, s, o = params, state, opt_state
            p, s, o, m = fns.train_step(p, s, o, batch, rng)
            sync(m["loss"])
            _log("train step compiled")
            warm, titers = 2, 10
            for _ in range(warm):
                p, s, o, m = fns.train_step(p, s, o, batch, rng)
            sync(m["loss"])
            t0 = time.perf_counter()
            for _ in range(titers):
                p, s, o, m = fns.train_step(p, s, o, batch, rng)
            sync(m["loss"])
            dt_tr = time.perf_counter() - t0
            result.update({
                "train_items_per_sec": round(
                    cfg.batch_size * titers / dt_tr, 2),
                "train_ms_per_batch": round(dt_tr / titers * 1e3, 2),
                "train_compute_dtype": dtype,
            })
            print(json.dumps(result), flush=True)
        else:
            _log(f"extras budget {EXTRA_S:.0f}s exceeded — "
                 f"skipping train metric")
    except Exception as e:
        _log(f"train metric failed: {e}")


if __name__ == "__main__":
    main()

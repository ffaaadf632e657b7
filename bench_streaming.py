#!/usr/bin/env python
"""Streaming low-latency benchmark (BASELINE config #4): p50/p99 per-chunk
latency of the jitted sliding-window step, plus the dense-vs-incremental
FLOP accounting. Prints ONE JSON line."""
import json
import sys

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.models.dagr import init_model
    from eventad_tpu.streaming.evaluate import (flops_report,
                                                latency_bench_detect,
                                                latency_bench_incremental)

    n_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # bf16 is the production streaming compute dtype (enables the fused
    # spline-conv kernels on the read path); pass float32 for strict f32
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cfg = Config(batch_size=1, use_image=True, event_buckets=(16384,),
                 compute_dtype=dtype)
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    lat = latency_bench_incremental(params, state, cfg, n_buf=16384,
                                    n_chunk=n_chunk, iters=40)
    det = latency_bench_detect(cfg, n_buf=16384, n_chunk=n_chunk)
    fl = flops_report(cfg, n_events=16384, changed_events=n_chunk)
    print(json.dumps({
        "metric": "streaming_p50_latency_ms",
        "value": round(lat["p50_ms"], 3),
        "unit": "ms",
        "p99_ms": round(lat["p99_ms"], 3),
        "append_p50_ms": round(lat["append_p50_ms"], 3),
        "refresh_ms": round(lat["refresh_ms"], 3),
        # per-dispatch wall with device-staged inputs (includes the
        # tunnel's enqueue floor, reported separately below)
        "device_step_ms": round(lat["device_step_ms"], 3),
        # true single-dispatch DEVICE latency (profiler; tunnel-proof)
        "device_step_trace_ms":
            round(lat["device_step_trace_ms"], 3)
            if lat.get("device_step_trace_ms") else None,
        "dispatch_floor_ms": round(lat["dispatch_floor_ms"], 3),
        "device_step_scan_ms": round(lat["device_step_scan_ms"], 3),
        "device_append_ms": round(lat["device_append_ms"], 3),
        "device_append_scan_ms": round(lat["device_append_scan_ms"], 3),
        "device_read_ms": round(lat["device_read_ms"], 3),
        "device_read_detections_ms":
            round(det["device_read_detections_ms"], 3),
        "compute_dtype": dtype,
        "events_per_chunk": n_chunk,
        "dense_mflops": round(fl["dense_mflops"], 1),
        "delta_mflops": round(fl["delta_mflops"], 1),
        "flop_ratio": round(fl["ratio"], 4),
    }))


if __name__ == "__main__":
    main()

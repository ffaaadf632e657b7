#!/usr/bin/env python
"""Capture a device profile of the batched forward and print per-op device
times (the only trustworthy attribution on the axon tunnel — wall-clock
stage timings are floored by ~1.5-2.5 ms of per-call dispatch).

Usage:
  python tools/trace_forward.py [n_events]        # capture + parse
  python tools/trace_forward.py --parse [dir]     # parse existing trace

Parsing uses xprof's hlo_stats converter (the tensorboard_plugin_profile
copy has a protobuf-version clash in this image; xprof's vendored protos
work). Times are averaged over the 3 traced iterations.
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jax_trace"


def capture(n_events):
    import jax
    from eventad_tpu.utils.jaxtools import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import (graph_static_config, init_model,
                                         model_forward)
    cfg = Config(batch_size=6, use_image=True, event_buckets=(n_events,),
                 compute_dtype="bfloat16")
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))

    @jax.jit
    def step(batch):
        out, _ = model_forward(params, state, batch, bc, mc, gsc,
                               img_net=cfg.img_net, training=False)
        return jnp.sum(out.logits.astype(jnp.float32))

    fn = lambda: np.asarray(step(batch)).ravel()[0]
    fn()   # compile
    fn()
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            fn()


def parse(trace_dir, iters=3, top=40):
    from xprof.convert import raw_to_tool_data as rtd
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("NO XPLANE under", trace_dir)
        return
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["id"] for c in tbl["cols"]]

    def row(r):
        return dict(zip(cols, [c["v"] if c else None for c in r["c"]]))

    rows = [row(r) for r in tbl["rows"]]
    # total_time is in microseconds, summed over all traced iterations;
    # report per-iteration milliseconds
    ms = lambda t: t / iters / 1e3
    # hlo_stats reports INCLUSIVE time for control-flow ops (while /
    # conditional) — their body ops are also listed individually, so a
    # flat sum double-counts every loop body (a scan-heavy program looked
    # ~2x its true device time).  Exclude control flow from the total and
    # report it separately.
    ctrl = ("while", "conditional")
    total = sum(r["total_time"] for r in rows if r["category"] not in ctrl)
    t_ctrl = sum(r["total_time"] for r in rows if r["category"] in ctrl)
    print(f"device total: {ms(total):.3f} ms/iter "
          f"({len(rows)} distinct ops; control-flow inclusive time "
          f"{ms(t_ctrl):.3f} ms excluded)")
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["category"], [0.0, 0])
        by_cat[r["category"]][0] += r["total_time"]
        by_cat[r["category"]][1] += int(r["occurrences"])
    print("\n-- by category (ms/iter) --")
    for cat, (t, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{ms(t):8.3f}  {cat}  (x{n // iters})")
    print(f"\n-- top {top} ops (ms/iter) --")
    rows.sort(key=lambda r: -r["total_time"])
    for r in rows[:top]:
        name = r["hlo_op_name"]
        expr = (r.get("hlo_op_expression") or "")[:90]
        print(f"{ms(r['total_time']):8.3f}  x{int(r['occurrences']) // iters:<3d}"
              f" {r['category'][:18]:<18} {name[:60]:<60} {expr}")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--parse":
        parse(args[1] if len(args) > 1 else TRACE_DIR)
        return
    n_events = int(args[0]) if args else 16384
    capture(n_events)
    parse(TRACE_DIR)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Device-time breakdown of the level-0 graph build (the largest pipeline
stage).  Replicates the wrapper stages around the Pallas search kernel
(ops/event_graph_pallas.py) so each piece can be timed separately with the
pipelined protocol.

Usage: python tools/profile_graph.py [n_events] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from eventad_tpu.utils.jaxtools import setup_compilation_cache
setup_compilation_cache()
import functools

import jax.numpy as jnp
import numpy as np

from eventad_tpu.ops import event_graph_pallas as egp


def main():
    from eventad_tpu.config import Config
    from eventad_tpu.data.synthetic import make_synthetic_batch
    from eventad_tpu.models.dagr import build_level0_graph, graph_static_config

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = Config(batch_size=6, use_image=True, event_buckets=(n_events,),
                 compute_dtype="bfloat16")
    gsc = graph_static_config(cfg)
    (radius_px, delta_t_us, max_nb, max_q, lookback, width, height,
     time_window) = gsc
    batch = jax.tree.map(jnp.asarray,
                         make_synthetic_batch(cfg, boxes_per_item=6))
    pos, valid, ranks = batch.pos, batch.valid, batch.rank

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[0]

    def scalar(out):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(out) if hasattr(l, 'dtype'))

    def bench(fn, *args):
        f = jax.jit(fn)
        fetch(f(*args))
        for _ in range(3):
            fetch(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(iters)]
        fetch(outs[-1])
        return (time.perf_counter() - t0) / iters * 1e3

    # ---- replicate build_graph_pallas wrapper stages ----------------------
    b, n, _ = pos.shape
    k_other = max_nb - 1
    k_pad = -(-k_other // 8) * 8
    chunk = 128
    lb = min(lookback, n)
    lb = max(-(-lb // chunk) * chunk, chunk)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    tail = n_pad - n
    w = lb + chunk
    q_cap = np.int32(max_q)
    p_total = b * n_chunks
    p_pad = -(-p_total // egp._LANES) * egp._LANES
    n_programs = p_pad // egp._LANES
    n_lblocks = lb // chunk

    def encode(pos, valid, ranks):
        x = pos[:, :, 0]
        y = pos[:, :, 1]
        t = pos[:, :, 2]
        pix = y * jnp.int32(1 << 15) + x
        big = jnp.int32(max_q + 1)
        r = jnp.where(valid, jnp.minimum(ranks, jnp.int32(max_q)), big)
        return pix * jnp.int32(256) + r, t

    def to_lanes(a, fill):
        ap = jnp.pad(a, ((0, 0), (lb, tail)), constant_values=fill)
        blocks = ap.reshape(b, n_lblocks + n_chunks, chunk)
        tb = blocks.transpose(2, 0, 1)
        rows = [jax.lax.slice_in_dim(tb, k, k + n_chunks, axis=2)
                for k in range(n_lblocks + 1)]
        wins = jnp.stack(rows, axis=0).reshape(w, b * n_chunks)
        return jnp.pad(wins, ((0, 0), (0, p_pad - p_total)),
                       constant_values=fill)

    def lmax_of(pos):
        t = pos[:, :, 2]
        t_pad = jnp.pad(t, ((0, 0), (0, tail)), constant_values=2**30)
        t_first = t_pad[:, ::chunk]
        starts = jax.vmap(
            lambda tb, q: jnp.searchsorted(tb, q, side="left")
        )(t_pad, t_first - delta_t_us).astype(jnp.int32)
        cid = jnp.arange(n_chunks, dtype=jnp.int32)
        lm = jnp.clip((cid[None, :] + 1) * chunk - 1 - starts, 0, lb)
        lm = jnp.where(cid[None, :] * chunk < n, lm, 0).reshape(p_total)
        lm = jnp.pad(lm, (0, p_pad - p_total))
        return jnp.max(lm.reshape(n_programs, egp._LANES), axis=-1) \
            .astype(jnp.int32)

    def kernel_call(lmax, prw, tw):
        kern = functools.partial(
            egp._select_kernel, lookback=lb, chunk=chunk, k_pad=k_pad,
            radius=np.int32(radius_px), delta_t_us=np.int32(delta_t_us),
            q_cap=q_cap)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_programs,),
            in_specs=[pl.BlockSpec((w, egp._LANES), lambda pi, lm: (0, pi))
                      for _ in range(2)],
            out_specs=pl.BlockSpec((k_pad, chunk, egp._LANES),
                                   lambda pi, lm: (0, 0, pi)),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((k_pad, chunk, p_pad), jnp.int32),
        )(lmax, prw, tw)

    # stage programs (cumulative prefixes)
    def s_encode(pos, valid, ranks):
        pr, t = encode(pos, valid, ranks)
        return scalar((pr, t))

    def s_relayout(pos, valid, ranks):
        pr, t = encode(pos, valid, ranks)
        return scalar((to_lanes(pr, max_q + 1), to_lanes(t, 0)))

    def s_lmax(pos, valid, ranks):
        pr, t = encode(pos, valid, ranks)
        return scalar((to_lanes(pr, max_q + 1), to_lanes(t, 0),
                       lmax_of(pos)))

    def s_kernel(pos, valid, ranks):
        pr, t = encode(pos, valid, ranks)
        prw = to_lanes(pr, max_q + 1)
        tw = to_lanes(t, 0)
        return scalar(kernel_call(lmax_of(pos), prw, tw))

    def s_full_pallas(pos, valid, ranks):
        out = egp.build_graph_pallas(
            pos, valid, ranks, radius=radius_px, delta_t_us=delta_t_us,
            max_neighbors=max_nb, max_queue_size=max_q, lookback=lb)
        return scalar(out)

    def s_level0(pos, valid, ranks):
        g = build_level0_graph(pos, batch.polarity, valid, gsc, ranks)
        return scalar((g.x, g.nbr, g.nbr_mask))

    # actual lmax distribution (host)
    lm = jax.jit(lmax_of)(pos)
    print("lmax per program:", np.asarray(lm))

    rows = [
        ("encode (pack pix+rank)", s_encode),
        ("+ window relayout x2", s_relayout),
        ("+ lmax searchsorted", s_lmax),
        ("+ pallas search kernel", s_kernel),
        ("full build_graph_pallas (+decode)", s_full_pallas),
        ("full build_level0_graph", s_level0),
    ]
    prev = 0.0
    for name, fn in rows:
        ms = bench(fn, pos, valid, ranks)
        print(f"{name:38s} {ms:8.2f} ms   (marginal {ms - prev:+6.2f})")
        prev = ms


if __name__ == "__main__":
    main()

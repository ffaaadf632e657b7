#!/usr/bin/env python
"""Sequence-parallel long-stream feature extraction (user entry point for
``parallel/seq_shard.py``).

Shards ONE long event stream over the device mesh's event axis — the
lookback-halo design described in parallel/seq_shard.py — and writes the
pooled (out3, out4) feature tables the anomaly head consumes.  This is the
TPU-native answer to the reference's long-stream story (the bounded
sliding window of src/dagr/graph/ev_graph.py:106-166): instead of bounding
the window to fit one device, the event axis scales across chips.

Usage (CPU smoke run with 8 virtual devices):

  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python tools/extract_sp.py --devices 8 --events 16384 --check \\
      --out /tmp/sp_feats.npz

Real streams: pass ``--events_npz stream.npz`` with arrays ``pos [N, 3]``
int32 (x, y, t_us; time-sorted), ``polarity [N]`` float32, and optionally
``image [H, W, 3]`` float32 in [0, 1].  Trained weights: ``--checkpoint
<latest_checkpoint.npz>`` (the train.py format).  ``--check`` additionally
runs the single-device streaming computation and asserts the sharded
features match (rel < 1e-5).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size over the event axis (0 = all devices)")
    ap.add_argument("--events", type=int, default=16384,
                    help="synthetic stream length (ignored with --events_npz)")
    ap.add_argument("--events_npz", default=None,
                    help="npz with pos [N,3] int32, polarity [N] f32, "
                         "optional image [H,W,3] f32")
    ap.add_argument("--checkpoint", default=None,
                    help="train.py checkpoint (.npz) to load weights from")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--use_image", default="true",
                    choices=("true", "false"))
    ap.add_argument("--graph_lookback", type=int, default=None,
                    help="lookback override (block must be >= 2*lookback)")
    ap.add_argument("--out", default=None, help="output npz path")
    ap.add_argument("--check", action="store_true",
                    help="assert equality with the single-device path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from eventad_tpu.utils.jaxtools import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from eventad_tpu.config import Config
    from eventad_tpu.models.dagr import graph_static_config, init_model
    from eventad_tpu.parallel.seq_shard import seq_sharded_features
    from eventad_tpu.streaming import incremental as inc

    use_image = args.use_image == "true"

    # ---- stream ----
    rng = np.random.RandomState(args.seed)
    if args.events_npz:
        data = np.load(args.events_npz)
        pos = np.asarray(data["pos"], np.int32)
        pol = np.asarray(data["polarity"], np.float32)
        img = (np.asarray(data["image"], np.float32)
               if "image" in data else None)
        if img is None and use_image:
            raise SystemExit("--use_image true but no image in the npz")
    else:
        pos = np.zeros((args.events, 3), np.int32)
        pol = np.zeros((args.events,), np.float32)
        img = None

    d = args.devices or len(jax.devices())
    n = len(pos)
    if n % d:  # pad the stream tail to a devices multiple (masked invalid)
        pad = d - n % d
        pos = np.concatenate([pos, np.repeat(pos[-1:], pad, 0)])
        pol = np.concatenate([pol, np.zeros((pad,), np.float32)])
        valid = np.concatenate([np.ones((n,), bool), np.zeros((pad,), bool)])
    else:
        valid = np.ones((n,), bool)
    n_pad = len(pos)

    kw = dict(batch_size=1, width=args.width, height=args.height,
              scale=args.scale, use_image=use_image, event_buckets=(n_pad,))
    if args.graph_lookback is not None:
        kw["graph_lookback"] = args.graph_lookback
    cfg = Config(**kw)

    if not args.events_npz:
        w, h = cfg.model_width, cfg.model_height
        pos[:, 0] = rng.randint(0, w, n_pad)
        pos[:, 1] = rng.randint(0, h, n_pad)
        pos[:, 2] = 1_000_000 + np.sort(rng.randint(0, 200_000, n_pad))
        pol[:] = rng.choice([-1.0, 1.0], n_pad).astype(np.float32)
        if use_image:
            img = rng.rand(cfg.model_height, cfg.model_width, 3) \
                .astype(np.float32)

    blk = n_pad // d
    lb = min(cfg.graph_lookback, blk)
    if 2 * lb > blk:
        raise SystemExit(
            f"block {blk} < 2*lookback {2 * lb}: use fewer devices, more "
            f"events, or --graph_lookback <= {blk // 2}")

    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        # train.py checkpoints store (params, opt_state) with positional
        # leaf naming; the params leaves come first, so a params-only
        # template restores exactly them
        from eventad_tpu.utils.checkpoint import load_pytree
        (params,) = load_pytree(args.checkpoint, (params,))
        print(f"loaded weights from {args.checkpoint}")
    gsc = graph_static_config(cfg)

    # image pyramid staged the way the streaming runtime stores it
    # (maps 0/1 upsampled to full resolution)
    image_feats = None
    if use_image:
        st0 = inc.init_incremental_state(n_pad, bc, mc,
                                         max_neighbors=cfg.max_neighbors)
        st0 = inc.update_image(params, state, st0, jnp.asarray(img),
                               cfg.img_net)
        image_feats = st0.image_feats

    mesh = Mesh(np.array(jax.devices()[:d]), ("data",))
    print(f"extracting over a {d}-device event-axis mesh "
          f"(block {blk}, lookback halo {lb}) ...")
    outs = seq_sharded_features(
        params, state, bc, gsc, jnp.asarray(pos), jnp.asarray(pol),
        jnp.asarray(valid), image_feats, mesh)
    out3, out4 = outs
    jax.block_until_ready(out4.x)
    print(f"out3: {out3.x.shape} ({int(np.asarray(out3.node_mask).sum())} "
          f"active cells)  out4: {out4.x.shape} "
          f"({int(np.asarray(out4.node_mask).sum())} active cells)")

    if args.check:
        st = inc.init_incremental_state(n_pad, bc, mc,
                                        max_neighbors=cfg.max_neighbors)
        if use_image:
            st = inc.update_image(params, state, st, jnp.asarray(img),
                                  cfg.img_net)
        st = inc.insert_raw(st, jnp.asarray(pos), jnp.asarray(pol),
                            jnp.int32(n_pad))
        refresh, _ = inc.make_incremental_step(
            params, state, bc, mc, gsc, n_chunk=min(256, n_pad),
            n_buf=n_pad)
        st = refresh(st)
        posn = inc._norm_pos(st.pos, st.t_now, gsc)
        outs_ref = inc.pooled_backbone_outs(params, state, bc, st, posn,
                                            gsc)
        worst = 0.0
        for lvl, (gr, gs) in enumerate(zip(outs_ref, outs)):
            mr = np.asarray(gr.node_mask)
            assert (mr == np.asarray(gs.node_mask)).all(), lvl
            xr = np.where(mr[:, None], np.asarray(gr.x, np.float32), 0)
            xs = np.where(mr[:, None], np.asarray(gs.x, np.float32), 0)
            rel = np.abs(xr - xs).max() / (np.abs(xr).max() + 1e-6)
            worst = max(worst, float(rel))
            assert rel < 1e-5, (lvl, rel)
        print(f"check OK: sharded == single-device (worst rel {worst:.2e})")

    if args.out:
        np.savez(args.out,
                 out3_x=np.asarray(out3.x, np.float32),
                 out3_pos=np.asarray(out3.pos, np.float32),
                 out3_mask=np.asarray(out3.node_mask),
                 out4_x=np.asarray(out4.x, np.float32),
                 out4_pos=np.asarray(out4.pos, np.float32),
                 out4_mask=np.asarray(out4.node_mask))
        print(f"features written to {args.out}")


if __name__ == "__main__":
    main()

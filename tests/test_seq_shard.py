"""Event-axis sequence parallelism == the single-device feature path.

``parallel/seq_shard.py`` shards the level-0 stage (graph build + layer-1)
over a device mesh with a lookback halo and finishes the tiny pooled upper
levels replicated.  Ground truth: the streaming ``refresh`` +
``pooled_backbone_outs`` computation on one device, itself proven equal to
the batch forward by tests/test_streaming.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eventad_tpu.config import Config
from eventad_tpu.models.dagr import graph_static_config, init_model
from eventad_tpu.streaming import incremental as inc


def _stream(rng, n, w, h, t_span=200_000):
    pos = np.zeros((n, 3), np.int32)
    pos[:, 0] = rng.randint(0, w, n)
    pos[:, 1] = rng.randint(0, h, n)
    pos[:, 2] = 1_000_000 + np.sort(rng.randint(0, t_span, n))
    pol = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return pos, pol


def test_seq_sharded_features_match_single_device(rng):
    from eventad_tpu.parallel.seq_shard import seq_sharded_features
    n = 2048
    cfg = Config(batch_size=1, width=96, height=72, scale=1,
                 use_image=True, event_buckets=(n,), graph_lookback=256)
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    pos, pol = _stream(rng, n, cfg.model_width, cfg.model_height)
    img = rng.rand(cfg.model_height, cfg.model_width, 3).astype(np.float32)

    # ---- single-device truth via the streaming machinery ----
    st = inc.init_incremental_state(n, bc, mc,
                                    max_neighbors=cfg.max_neighbors)
    st = inc.update_image(params, state, st, jnp.asarray(img), cfg.img_net)
    st = inc.insert_raw(st, jnp.asarray(pos), jnp.asarray(pol),
                        jnp.int32(n))
    refresh, _step = inc.make_incremental_step(params, state, bc, mc, gsc,
                                               n_chunk=256, n_buf=n)
    st = refresh(st)
    posn = inc._norm_pos(st.pos, st.t_now, gsc)
    outs_ref = inc.pooled_backbone_outs(params, state, bc, st, posn, gsc)

    # ---- sharded over a 4-device mesh (block 512 >= 2 * lookback) ----
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    outs_sp = seq_sharded_features(
        params, state, bc, gsc, jnp.asarray(pos), jnp.asarray(pol),
        jnp.ones((n,), bool), st.image_feats, mesh)

    for lvl, (gr, gs) in enumerate(zip(outs_ref, outs_sp)):
        mr = np.asarray(gr.node_mask)
        assert (mr == np.asarray(gs.node_mask)).all(), lvl
        xr = np.where(mr[:, None], np.asarray(gr.x, np.float32), 0)
        xs = np.where(mr[:, None], np.asarray(gs.x, np.float32), 0)
        scale = np.abs(xr).max() + 1e-6
        assert np.abs(xr - xs).max() / scale < 1e-5, \
            (lvl, np.abs(xr - xs).max() / scale)
        np.testing.assert_allclose(np.asarray(gr.pos), np.asarray(gs.pos),
                                   rtol=0, atol=1e-6)


def test_seq_shard_block_size_guard(rng):
    from eventad_tpu.parallel.seq_shard import seq_sharded_level0
    import pytest
    n = 1024
    cfg = Config(batch_size=1, width=96, height=72, scale=1,
                 use_image=False, event_buckets=(n,), graph_lookback=512)
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    pos, pol = _stream(rng, n, cfg.model_width, cfg.model_height)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(AssertionError, match="2\\*lookback"):
        seq_sharded_level0(params, state, bc, gsc, jnp.asarray(pos),
                           jnp.asarray(pol), jnp.ones((n,), bool), None,
                           mesh)

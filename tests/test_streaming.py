"""Streaming vs batch consistency (the reference's check_consistency
pattern, asynchronous/evaluate_flops.py:236-261) + ring buffer mechanics."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.config import Config
from eventad_tpu.models.dagr import init_model
from eventad_tpu.streaming.evaluate import consistency_check, flops_report
from eventad_tpu.streaming.state import init_streaming_state
from eventad_tpu.streaming.runner import insert_events


def _small_cfg():
    return Config(batch_size=1, width=48, height=36, scale=1,
                  use_image=False, event_buckets=(512,), graph_lookback=512)


def test_insert_events_ring():
    st = init_streaming_state(n_buf=8, max_boxes=4)
    pos = jnp.asarray([[1, 1, 10], [2, 2, 20], [3, 3, 30]], jnp.int32)
    pol = jnp.ones((3,))
    st = insert_events(st, pos, pol, jnp.int32(3))
    assert int(st.valid.sum()) == 3
    assert int(st.t_now) == 30
    # partial chunk: only first 2 of 3 slots valid
    st = insert_events(st, pos + 100, pol, jnp.int32(2))
    assert int(st.valid.sum()) == 5
    got = np.asarray(st.pos[st.valid])
    assert got[-1, 2] == 120  # newest at the end, chronological
    # overflow evicts oldest
    big = jnp.asarray(np.stack([np.arange(8), np.arange(8),
                                np.arange(8) + 1000], 1), jnp.int32)
    st = insert_events(st, big, jnp.ones((8,)), jnp.int32(8))
    assert int(st.valid.sum()) == 8
    assert int(st.pos[:, 2].max()) == 1007


def test_streaming_matches_batch(rng):
    cfg = _small_cfg()
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    n = 512
    pos = np.zeros((n, 3), np.int32)
    pos[:, 0] = rng.randint(0, cfg.model_width, n)
    pos[:, 1] = rng.randint(0, cfg.model_height, n)
    pos[:, 2] = 1_000_000 + np.sort(rng.randint(0, 50_000, n))
    pol = rng.choice([-1.0, 1.0], n).astype(np.float32)
    s1 = cfg.max_boxes + 1
    boxes = np.zeros((s1, 4), np.float32)
    present = np.zeros((s1,), bool)
    boxes[1] = (5, 5, 20, 15)
    boxes[2] = (25, 12, 15, 15)
    present[1] = present[2] = True

    diff, batch_logits, stream_logits = consistency_check(
        params, state, cfg, pos, pol, boxes, present, n_chunks=4)
    assert diff < 1e-5, f"streaming diverges from batch path: {diff}"


def test_flops_report():
    cfg = _small_cfg()
    r = flops_report(cfg, n_events=4096, changed_events=64)
    assert r["dense_mflops"] > r["delta_mflops"] > 0
    assert r["ratio"] < 0.2


def test_incremental_matches_batch(rng):
    """Incremental (cached level-0) streaming == batch path, chunk by chunk
    (the reference async runtime's consistency contract)."""
    from eventad_tpu.models.backbone import make_backbone_config
    from eventad_tpu.models.dagr import graph_static_config
    from eventad_tpu.models.eventad import EventADConfig
    from eventad_tpu.streaming import incremental as inc
    from eventad_tpu.streaming.evaluate import consistency_check

    cfg = _small_cfg()
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    n = 512
    pos = np.zeros((n, 3), np.int32)
    pos[:, 0] = rng.randint(0, cfg.model_width, n)
    pos[:, 1] = rng.randint(0, cfg.model_height, n)
    pos[:, 2] = 1_000_000 + np.sort(rng.randint(0, 50_000, n))
    pol = rng.choice([-1.0, 1.0], n).astype(np.float32)
    s1 = cfg.max_boxes + 1
    boxes = np.zeros((s1, 4), np.float32)
    present = np.zeros((s1,), bool)
    boxes[1] = (5, 5, 20, 15)
    boxes[2] = (25, 12, 15, 15)
    present[1] = present[2] = True

    # batch-path logits (reuses the harness; diff vs full-recompute stream)
    _, batch_logits, _ = consistency_check(params, state, cfg, pos, pol,
                                           boxes, present, n_chunks=2)

    mcfg = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                         max_boxes=cfg.max_boxes)
    bc1 = make_backbone_config(cfg.replace(batch_size=1))
    gsc = graph_static_config(cfg.replace(batch_size=1))
    n_chunk = 128
    st = inc.init_incremental_state(n, bc1, mcfg,
                                    max_neighbors=cfg.max_neighbors)
    refresh, step = inc.make_incremental_step(params, state, bc1, mcfg,
                                              gsc, n_chunk=n_chunk,
                                              n_buf=n)
    # first chunk arrives, caches built once, then pure incremental steps
    st = inc.insert_raw(st, jnp.asarray(pos[:n_chunk]),
                        jnp.asarray(pol[:n_chunk]), jnp.int32(n_chunk))
    st = refresh(st)
    logits = None
    for ci in range(1, n // n_chunk):
        lo, hi = ci * n_chunk, (ci + 1) * n_chunk
        last = ci == n // n_chunk - 1
        st, logits = step(st, jnp.asarray(pos[lo:hi]),
                          jnp.asarray(pol[lo:hi]), jnp.int32(hi - lo),
                          jnp.asarray(boxes) if last
                          else jnp.zeros((s1, 4)),
                          jnp.asarray(present) if last
                          else jnp.zeros((s1,), bool))
    got = np.asarray(logits)
    # compare the slots that actually carry outputs (the batch path leaves
    # non-valid slots unmasked in the raw logits array)
    diff = np.abs(got[present] - batch_logits[present]).max()
    assert diff < 1e-5, f"incremental diverges from batch: {diff}"


def test_append_many_matches_sequential(rng):
    """append_many (scanned multi-chunk ingest) == the same appends issued
    one call at a time, bitwise."""
    from eventad_tpu.models.backbone import make_backbone_config
    from eventad_tpu.models.dagr import graph_static_config
    from eventad_tpu.models.eventad import EventADConfig
    from eventad_tpu.streaming import incremental as inc

    cfg = _small_cfg()
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    n, n_chunk, m = 512, 128, 3
    pos = np.zeros((n + m * n_chunk, 3), np.int32)
    nn = pos.shape[0]
    pos[:, 0] = rng.randint(0, cfg.model_width, nn)
    pos[:, 1] = rng.randint(0, cfg.model_height, nn)
    pos[:, 2] = 1_000_000 + np.sort(rng.randint(0, 50_000, nn))
    pol = rng.choice([-1.0, 1.0], nn).astype(np.float32)

    mcfg = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                         max_boxes=cfg.max_boxes)
    bc1 = make_backbone_config(cfg.replace(batch_size=1))
    gsc = graph_static_config(cfg.replace(batch_size=1))
    st = inc.init_incremental_state(n, bc1, mcfg,
                                    max_neighbors=cfg.max_neighbors)
    refresh, step = inc.make_incremental_step(params, state, bc1, mcfg,
                                              gsc, n_chunk=n_chunk,
                                              n_buf=n)
    for ci in range(n // n_chunk):
        lo = ci * n_chunk
        st = inc.insert_raw(st, jnp.asarray(pos[lo:lo + n_chunk]),
                            jnp.asarray(pol[lo:lo + n_chunk]),
                            jnp.int32(n_chunk))
    st = refresh(st)

    chunks = pos[n:].reshape(m, n_chunk, 3)
    pols = pol[n:].reshape(m, n_chunk)
    st_seq = st
    for j in range(m):
        st_seq = step.append(st_seq, jnp.asarray(chunks[j]),
                             jnp.asarray(pols[j]), jnp.int32(n_chunk))
    st_scan = step.append_many(st, jnp.asarray(chunks), jnp.asarray(pols),
                               jnp.full((m,), n_chunk, jnp.int32))
    for a, b in zip(jax.tree.leaves(st_seq), jax.tree.leaves(st_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_many_matches_sequential(rng):
    """step_many (scanned append+read frames) == the same frames stepped
    one call at a time: identical logits per frame and identical final
    state (including the recurrent head carries)."""
    from eventad_tpu.models.backbone import make_backbone_config
    from eventad_tpu.models.dagr import graph_static_config
    from eventad_tpu.models.eventad import EventADConfig
    from eventad_tpu.streaming import incremental as inc

    cfg = _small_cfg()
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    n, n_chunk, m = 512, 128, 3
    pos = np.zeros((n + m * n_chunk, 3), np.int32)
    nn = pos.shape[0]
    pos[:, 0] = rng.randint(0, cfg.model_width, nn)
    pos[:, 1] = rng.randint(0, cfg.model_height, nn)
    pos[:, 2] = 1_000_000 + np.sort(rng.randint(0, 50_000, nn))
    pol = rng.choice([-1.0, 1.0], nn).astype(np.float32)
    s1 = cfg.max_boxes + 1
    boxes = rng.rand(m, s1, 4).astype(np.float32) * 20
    boxes[..., 2:] += 4
    present = rng.rand(m, s1) > 0.4
    present[:, 0] = False

    mcfg = EventADConfig(x_dim=cfg.x_dim, h_dim=cfg.h_dim,
                         max_boxes=cfg.max_boxes)
    bc1 = make_backbone_config(cfg.replace(batch_size=1))
    gsc = graph_static_config(cfg.replace(batch_size=1))
    st = inc.init_incremental_state(n, bc1, mcfg,
                                    max_neighbors=cfg.max_neighbors)
    refresh, step = inc.make_incremental_step(params, state, bc1, mcfg,
                                              gsc, n_chunk=n_chunk,
                                              n_buf=n)
    for ci in range(n // n_chunk):
        lo = ci * n_chunk
        st = inc.insert_raw(st, jnp.asarray(pos[lo:lo + n_chunk]),
                            jnp.asarray(pol[lo:lo + n_chunk]),
                            jnp.int32(n_chunk))
    st = refresh(st)

    chunks = pos[n:].reshape(m, n_chunk, 3)
    pols = pol[n:].reshape(m, n_chunk)
    st_seq = st
    seq_logits = []
    for j in range(m):
        st_seq, lg = step(st_seq, jnp.asarray(chunks[j]),
                          jnp.asarray(pols[j]), jnp.int32(n_chunk),
                          jnp.asarray(boxes[j]), jnp.asarray(present[j]))
        seq_logits.append(np.asarray(lg))
    st_scan, scan_logits = step.many(
        st, jnp.asarray(chunks), jnp.asarray(pols),
        jnp.full((m,), n_chunk, jnp.int32), jnp.asarray(boxes),
        jnp.asarray(present))
    np.testing.assert_array_equal(np.stack(seq_logits),
                                  np.asarray(scan_logits))
    for a, b in zip(jax.tree.leaves(st_seq), jax.tree.leaves(st_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

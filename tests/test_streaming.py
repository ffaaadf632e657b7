"""Streaming vs batch consistency (the reference's check_consistency
pattern, asynchronous/evaluate_flops.py:236-261) + ring buffer mechanics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
    assert diff < 1e-3, f"streaming diverges from batch path: {diff}"


def test_flops_report():
    cfg = _small_cfg()
    r = flops_report(cfg, n_events=4096, changed_events=64)
    assert r["dense_mflops"] > r["delta_mflops"] > 0
    assert r["ratio"] < 0.2

"""Slotted EventAD head vs a literal numpy simulation of the reference's
per-track dict loop (models/EventAD.py:178-333)."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.models.eventad import (EventADConfig, eventad_forward,
                                        init_eventad, spatial_attention)
from eventad_tpu.models.gru import gru_step


def np_gru_step(params, x, h):
    out, hs = gru_step(params, jnp.asarray(x[None]), jnp.asarray(h[None]))
    return np.asarray(out)[0], np.asarray(hs)[0]


def reference_loop(params, mc, features, coords, present, labels):
    """Mirror of EventAD.py:202-333 with string-keyed hidden dicts."""
    b, _, s1, _ = features.shape
    h_in_e, h_in_c = {}, {}
    all_logits = np.zeros((b, s1, 2), np.float32)
    all_valid = np.zeros((b, s1), bool)
    total_loss = 0.0
    for fb in range(b):
        h_out_e, h_out_c = {}, {}
        for tid in range(1, mc.max_boxes + 1):
            curr = features[fb, 1, tid]
            if np.abs(curr).sum() == 0:
                continue
            if not present[fb, tid]:
                continue
            key = str(tid)
            he = h_in_e.get(key, np.zeros((mc.event_layers, mc.h_dim),
                                          np.float32))
            hc = h_in_c.get(key, np.zeros((mc.coord_layers, mc.coord_dim),
                                          np.float32))
            oe, he2 = np_gru_step(params.gru_event, curr, he)
            oc, hc2 = np_gru_step(params.gru_coord, coords[fb, tid], hc)
            e = oe @ np.asarray(params.fusion.event_proj_w) \
                + np.asarray(params.fusion.event_proj_b)
            c = oc @ np.asarray(params.fusion.coord_proj_w) \
                + np.asarray(params.fusion.coord_proj_b)
            h = np.concatenate([e, c])
            h = np.maximum(h @ np.asarray(params.fusion.fuse1_w)
                           + np.asarray(params.fusion.fuse1_b), 0)
            logits = h @ np.asarray(params.fusion.fuse2_w) \
                + np.asarray(params.fusion.fuse2_b)
            all_logits[fb, tid] = logits
            all_valid[fb, tid] = True
            lp = logits - logits.max()
            lp = lp - np.log(np.exp(lp).sum())
            total_loss += -lp[labels[fb, tid]]
            h_out_e[key] = he2
            h_out_c[key] = hc2
        # SpatialAttention over this frame's dict (EventAD.py:100-138)
        for hdict, w in ((h_out_e, params.att_event_w),
                         (h_out_c, params.att_coord_w)):
            if not hdict:
                continue
            keys = list(hdict.keys())
            stack = np.stack([hdict[k] for k in keys], axis=1)  # [L, S_v, H]
            m = np.tanh(stack)
            score = (m @ np.asarray(w))[..., 0]                 # [L, S_v]
            a = np.exp(score - score.max(1, keepdims=True))
            a = a / a.sum(1, keepdims=True)
            att = stack * a[..., None]
            for i, k in enumerate(keys):
                hdict[k] = att[:, i]
        h_in_e.update(h_out_e)
        h_in_c.update(h_out_c)
    return all_logits, all_valid, total_loss


def test_head_matches_reference_loop(rng):
    mc = EventADConfig(x_dim=16, h_dim=32, coord_dim=8, max_boxes=6)
    params = init_eventad(jax.random.PRNGKey(0), mc)
    b, s1 = 4, mc.max_boxes + 1
    features = rng.randn(b, 2, s1, mc.x_dim).astype(np.float32)
    # some slots have zero features (skipped by the reference loop)
    features[:, 1][rng.rand(b, s1) > 0.7] = 0.0
    coords = rng.rand(b, s1, 4).astype(np.float32)
    present = rng.rand(b, s1) > 0.3
    present[:, 0] = False
    labels = (rng.rand(b, s1) > 0.5).astype(np.int32)

    out = eventad_forward(params, mc, jnp.asarray(features),
                          jnp.asarray(coords), jnp.asarray(present),
                          jnp.asarray(labels), training=False)
    ref_logits, ref_valid, ref_loss = reference_loop(
        params, mc, features, coords, present, labels)

    assert (np.asarray(out.valid) == ref_valid).all()
    got = np.where(ref_valid[..., None], np.asarray(out.logits), 0)
    exp = np.where(ref_valid[..., None], ref_logits, 0)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=1e-4)


def test_attention_masking(rng):
    h = jnp.asarray(rng.randn(5, 2, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 1).astype(np.float32))
    valid = jnp.asarray([True, False, True, False, False])
    out = np.asarray(spatial_attention(h, w, valid))
    # invalid slots zeroed by the attention weights
    assert (out[1] == 0).all() and (out[3] == 0).all()
    # weights over valid slots sum to 1 per layer
    m = np.tanh(np.asarray(h))
    sc = (m @ np.asarray(w))[..., 0]
    a = np.exp(sc[[0, 2]] - sc[[0, 2]].max(0))
    a = a / a.sum(0)
    exp = np.asarray(h)[[0, 2]] * a[..., None]
    np.testing.assert_allclose(out[[0, 2]], exp, rtol=1e-5, atol=1e-6)


def test_loss_zero_when_no_valid(rng):
    mc = EventADConfig(x_dim=8, h_dim=16, coord_dim=8, max_boxes=4)
    params = init_eventad(jax.random.PRNGKey(0), mc)
    b, s1 = 2, 5
    out = eventad_forward(params, mc,
                          jnp.zeros((b, 2, s1, 8)), jnp.zeros((b, s1, 4)),
                          jnp.zeros((b, s1), bool),
                          jnp.zeros((b, s1), jnp.int32))
    assert float(out.loss) == 0.0
    assert int(out.n_valid) == 0

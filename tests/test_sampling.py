"""Image-feature sampling vs naive bilinear (grid_sample align_corners)."""
import numpy as np
import jax.numpy as jnp

from eventad_tpu.models.graph import sample_image_features


def naive(feat, pos, batch, w_full, h_full):
    b, hp, wp, c = feat.shape
    out = np.zeros((len(pos), c), np.float32)
    for i, (px, py) in enumerate(pos[:, :2]):
        fx = px * w_full * (wp - 1) / (w_full - 1)
        fy = py * h_full * (hp - 1) / (h_full - 1)
        x0, y0 = int(np.floor(fx)), int(np.floor(fy))
        tx, ty = fx - x0, fy - y0
        acc = np.zeros(c)
        for dy, wy in ((0, 1 - ty), (1, ty)):
            for dx, wx in ((0, 1 - tx), (1, tx)):
                xx, yy = x0 + dx, y0 + dy
                if 0 <= xx < wp and 0 <= yy < hp:
                    acc += wy * wx * feat[batch[i], yy, xx]
        out[i] = acc
    return out


def test_sampling_matches_naive(rng):
    b, hp, wp, c = 2, 12, 18, 5
    w_full, h_full = 36, 24
    feat = rng.randn(b, hp, wp, c).astype(np.float32)
    n = 200
    pos = rng.rand(n, 3).astype(np.float32)
    batch = rng.randint(0, b, n).astype(np.int32)
    mask = np.ones(n, bool)
    got = np.asarray(sample_image_features(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(batch),
        jnp.asarray(mask), w_full, h_full))
    exp = naive(feat, pos, batch, w_full, h_full)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_upsample_lookup_matches_bilinear(rng):
    """upsample_align_corners + integer lookup at pixel-aligned positions
    == direct bilinear sampling of the low-res map (the batch path's
    gather-free image-feature fetch)."""
    from eventad_tpu.models.graph import (lookup_pixel_features,
                                          upsample_align_corners)
    b, hp, wp, c = 2, 12, 18, 5
    w_full, h_full = 36, 24
    feat = rng.randn(b, hp, wp, c).astype(np.float32)
    # pixel-aligned normalized positions (the event/pooled position form)
    xi = rng.randint(0, w_full, 300)
    yi = rng.randint(0, h_full, 300)
    pos = np.stack([xi / w_full, yi / h_full,
                    np.zeros(300)], axis=1).astype(np.float32)
    batch = rng.randint(0, b, 300).astype(np.int32)
    mask = rng.rand(300) > 0.1
    up = upsample_align_corners(jnp.asarray(feat), w_full, h_full)
    got = np.asarray(lookup_pixel_features(
        up, jnp.asarray(pos), jnp.asarray(batch), jnp.asarray(mask),
        w_full, h_full))
    want = np.asarray(sample_image_features(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(batch),
        jnp.asarray(mask), w_full, h_full))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert (got[~mask] == 0).all()


def test_upsample_lookup_fused(rng):
    """upsample_lookup (fused multi-map upsample + row fetch) == per-map
    upsample_align_corners + lookup_pixel_features."""
    from eventad_tpu.models.graph import (lookup_pixel_features,
                                          upsample_align_corners,
                                          upsample_lookup)
    b = 2
    w_full, h_full = 36, 24
    maps = [(6, 9, 4), (12, 18, 3)]
    feats = [rng.randn(b, hp, wp, c).astype(np.float32)
             for hp, wp, c in maps]
    n = 300
    xi = rng.randint(0, w_full, n)
    yi = rng.randint(0, h_full, n)
    pos = np.stack([xi / w_full, yi / h_full,
                    np.zeros(n)], axis=1).astype(np.float32)
    batch = rng.randint(0, b, n).astype(np.int32)
    mask = rng.rand(n) > 0.1
    want = np.concatenate([
        np.asarray(lookup_pixel_features(
            upsample_align_corners(jnp.asarray(f), w_full, h_full),
            jnp.asarray(pos), jnp.asarray(batch), jnp.asarray(mask),
            w_full, h_full)) for f in feats], axis=1)
    got = np.asarray(upsample_lookup(
        [jnp.asarray(f) for f in feats], jnp.asarray(pos),
        jnp.asarray(batch), jnp.asarray(mask), w_full, h_full))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert (got[~mask] == 0).all()


def test_sampling_edge_positions(rng):
    """positions at the exact right/bottom borders (last column/row taps)."""
    b, hp, wp, c = 1, 6, 8, 3
    feat = rng.randn(b, hp, wp, c).astype(np.float32)
    pos = np.array([[1.0, 1.0, 0], [0.0, 0.0, 0], [0.999, 0.5, 0]],
                   np.float32)
    batch = np.zeros(3, np.int32)
    mask = np.ones(3, bool)
    got = np.asarray(sample_image_features(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(batch),
        jnp.asarray(mask), 16, 12))
    exp = naive(feat, pos, batch, 16, 12)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)

"""Separable-bilinear Pallas sampler vs the XLA bilinear oracle.

Oracle: models/graph.sample_image_features, itself tested against the
reference ``sample_features`` semantics (net.py:200-228).
"""
import jax.numpy as jnp
import numpy as np

from eventad_tpu.models.graph import sample_image_features
from eventad_tpu.ops.bilinear_sample import sample_bilinear_mxu

W, H = 360, 240


def _case(rng, b, n_max, hp, wp, c, frac_pos=False):
    feat = rng.randn(b, hp, wp, c).astype(np.float32)
    n = b * n_max
    if frac_pos:
        # pooled-style positions: arbitrary fractions incl. out-of-range
        px = rng.rand(n) * 1.1 - 0.05
        py = rng.rand(n) * 1.1 - 0.05
    else:
        px = rng.randint(0, W, n) / W
        py = rng.randint(0, H, n) / H
    pos = np.stack([px, py, np.zeros(n)], 1).astype(np.float32)
    mask = rng.rand(n) > 0.15
    batch = np.repeat(np.arange(b, dtype=np.int32), n_max)
    return feat, pos, mask, batch


def test_bilinear_coarse_matches_oracle(rng):
    b, n_max = 2, 256
    feat, pos, mask, batch = _case(rng, b, n_max, 30, 45, 64)
    want = np.asarray(sample_image_features(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(batch),
        jnp.asarray(mask), W, H))
    out = np.asarray(sample_bilinear_mxu(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(mask),
        full_width=W, full_height=H, batch_size=b, interpret=True))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
    assert (out[~mask] == 0).all()


def test_bilinear_fine_matches_oracle(rng):
    b, n_max = 2, 128
    feat, pos, mask, batch = _case(rng, b, n_max, 120, 180, 16)
    want = np.asarray(sample_image_features(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(batch),
        jnp.asarray(mask), W, H))
    out = np.asarray(sample_bilinear_mxu(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(mask),
        full_width=W, full_height=H, batch_size=b, interpret=True))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_bilinear_out_of_range_zero_padded(rng):
    """grid_sample zero-padding semantics: out-of-map taps contribute 0."""
    b, n_max = 1, 128
    feat, pos, mask, batch = _case(rng, b, n_max, 30, 45, 64,
                                   frac_pos=True)
    want = np.asarray(sample_image_features(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(batch),
        jnp.asarray(mask), W, H))
    out = np.asarray(sample_bilinear_mxu(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(mask),
        full_width=W, full_height=H, batch_size=b, interpret=True))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_bilinear_bf16(rng):
    """bf16 maps: weights rounded to bf16, blend accumulated in f32."""
    b, n_max = 2, 128
    feat, pos, mask, batch = _case(rng, b, n_max, 30, 45, 64)
    f16 = jnp.asarray(feat).astype(jnp.bfloat16)
    want = np.asarray(sample_image_features(
        f16, jnp.asarray(pos), jnp.asarray(batch), jnp.asarray(mask),
        W, H).astype(jnp.float32))
    out = np.asarray(sample_bilinear_mxu(
        f16, jnp.asarray(pos), jnp.asarray(mask),
        full_width=W, full_height=H, batch_size=b,
        interpret=True).astype(jnp.float32))
    np.testing.assert_allclose(out, want, rtol=0.05, atol=0.05)

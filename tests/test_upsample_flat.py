"""ops/upsample_flat.py: the Pallas flat-layout upsample writer must equal
the f32 composed bilinear upsample to bf16 tolerance, and its flat row
gather must agree with upsample_lookup row-for-row (interpret mode; the
TPU path is covered by tools/bench_upflat.py + tools/check_fused.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.models.graph import (upsample_align_corners,
                                      upsample_lookup)
from eventad_tpu.ops.upsample_flat import (upsample_flat_lookup,
                                           upsample_flat_table)


def _maps(rng, b, shapes):
    return [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
            for (h, w, c) in shapes]


def test_flat_table_matches_f32_upsample(rng):
    b, hf, wf = 2, 48, 72
    feats = _maps(rng, b, [(12, 18, 5), (24, 36, 3)])
    flat = upsample_flat_table(feats, wf, hf, by=24, interpret=True)
    assert flat.shape == (b * hf * wf, 8)
    ref = jnp.concatenate(
        [upsample_align_corners(f, wf, hf) for f in feats], axis=-1)
    ref = np.asarray(ref, np.float32)          # [b, hf, wf, c]
    got = np.asarray(flat, np.float32).reshape(b, hf, wf, 8)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-2   # bf16 intermediate


def test_flat_lookup_matches_upsample_lookup(rng):
    b, hf, wf, n = 2, 48, 72, 512
    feats = _maps(rng, b, [(12, 18, 5), (24, 36, 3)])
    xi = rng.randint(0, wf, n)
    yi = rng.randint(0, hf, n)
    pos = jnp.asarray(
        np.stack([xi / wf, yi / hf, np.zeros(n)], -1).astype(np.float32))
    batch = jnp.asarray(rng.randint(0, b, n), jnp.int32)
    mask = jnp.ones((n,), bool)
    got = upsample_flat_lookup(feats, pos, batch, mask, wf, hf, by=24,
                               interpret=True)
    want = upsample_lookup(feats, pos, batch, mask, wf, hf,
                           mask_rows=False)
    a = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - g).max() / scale < 2e-2


def test_flat_table_edge_taps(rng):
    """hf rows whose H-tap pair degenerates (i0 == i1 at the last source
    row) must still reproduce the source values exactly at tap weight 1."""
    b, hf, wf = 1, 24, 24
    feats = _maps(rng, b, [(24, 24, 4)])        # identity-resolution map
    flat = upsample_flat_table(feats, wf, hf, by=24, interpret=True)
    got = np.asarray(flat, np.float32).reshape(hf, wf, 4)
    ref = np.asarray(feats[0][0], np.float32)
    # identity mapping: every tap weight is (1, 0) on the same row/col
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6) < 1e-2

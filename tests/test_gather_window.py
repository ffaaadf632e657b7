"""Windowed row-gather Pallas kernel vs the plain gather oracle."""
import jax.numpy as jnp
import numpy as np

from eventad_tpu.ops.gather_window import gather_window_rows


def _case(rng, n, k, c, lookback):
    src = rng.randn(n, c).astype(np.float32)
    # window-local neighbour table honouring the event-graph contract
    nbr = np.zeros((n, k), np.int32)
    mask = rng.rand(n, k) > 0.3
    for i in range(n):
        lo = max(0, i - lookback)
        nbr[i] = rng.randint(lo, i + 1, k)
    mask[0] = False
    return src, nbr, mask


def test_gather_window_matches_oracle(rng):
    n, k, c, lb = 300, 16, 21, 128
    src, nbr, mask = _case(rng, n, k, c, lb)
    out = np.asarray(gather_window_rows(
        jnp.asarray(src), jnp.asarray(nbr), jnp.asarray(mask),
        lookback=lb, interpret=True))
    want = np.where(mask[..., None], src[nbr], 0.0)
    # parts=2: two bf16 planes reconstruct f32 to ~2^-16 relative
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)
    assert (out[~mask] == 0).all()


def test_gather_window_three_parts_exact(rng):
    n, k, c, lb = 160, 8, 10, 128
    src, nbr, mask = _case(rng, n, k, c, lb)
    out = np.asarray(gather_window_rows(
        jnp.asarray(src), jnp.asarray(nbr), jnp.asarray(mask),
        lookback=lb, parts=3, interpret=True))
    want = np.where(mask[..., None], src[nbr], 0.0)
    np.testing.assert_array_equal(out, want)


def test_gather_window_bf16_exact(rng):
    """bf16 source rows gather exactly (one-hot x bf16 value is exact)."""
    n, k, c, lb = 300, 16, 21, 128
    src, nbr, mask = _case(rng, n, k, c, lb)
    src16 = jnp.asarray(src).astype(jnp.bfloat16)
    out = np.asarray(gather_window_rows(
        src16, jnp.asarray(nbr), jnp.asarray(mask),
        lookback=lb, interpret=True).astype(jnp.float32))
    want = np.where(mask[..., None],
                    np.asarray(src16.astype(jnp.float32))[nbr], 0.0)
    np.testing.assert_array_equal(out, want)


def test_gather_window_gradient(rng):
    """The custom VJP (masked row scatter-add) == the XLA gather's grad —
    the detector trains through the backbone, so the kernel must be
    differentiable in src."""
    import jax
    from eventad_tpu.ops.gather_window import _gather_window_diff

    n, k, c, lb = 160, 8, 10, 128
    src, nbr, mask = _case(rng, n, k, c, lb)
    args = (jnp.asarray(src), jnp.asarray(nbr), jnp.asarray(mask))
    w = jnp.asarray(rng.randn(n, k, c).astype(np.float32))

    def loss_kernel(s):
        return jnp.sum(_gather_window_diff(s, args[1], args[2], lb, True)
                       * w)

    def loss_xla(s):
        return jnp.sum(jnp.where(args[2][..., None], s[args[1]], 0.0) * w)

    g_kernel = np.asarray(jax.grad(loss_kernel)(args[0]))
    g_xla = np.asarray(jax.grad(loss_xla)(args[0]))
    np.testing.assert_allclose(g_kernel, g_xla, rtol=1e-4, atol=1e-5)


def _scatter_oracle(g, nbr, mask, n_src):
    gm = np.where(mask[..., None], g, 0.0)
    out = np.zeros((n_src, g.shape[-1]), np.float64)
    np.add.at(out, nbr.reshape(-1),
              gm.reshape(-1, g.shape[-1]).astype(np.float64))
    return out.astype(np.float32)


def test_scatter_window_matches_oracle(rng):
    """Windowed scatter-add (the gather VJP) vs the XLA scatter oracle,
    across multiple source blocks."""
    from eventad_tpu.ops.gather_window import scatter_window_rows

    n, k, c, lb = 700, 8, 10, 150
    src, nbr, mask = _case(rng, n, k, c, lb)
    g = rng.randn(n, k, c).astype(np.float32)
    out = np.asarray(scatter_window_rows(
        jnp.asarray(g), jnp.asarray(nbr), jnp.asarray(mask), n,
        block=256, parts=3, interpret=True))
    want = _scatter_oracle(g, nbr, mask, n)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_scatter_window_parts2(rng):
    from eventad_tpu.ops.gather_window import scatter_window_rows

    n, k, c, lb = 300, 16, 19, 128
    src, nbr, mask = _case(rng, n, k, c, lb)
    g = rng.randn(n, k, c).astype(np.float32)
    out = np.asarray(scatter_window_rows(
        jnp.asarray(g), jnp.asarray(nbr), jnp.asarray(mask), n,
        block=128, parts=2, interpret=True))
    want = _scatter_oracle(g, nbr, mask, n)
    np.testing.assert_allclose(out, want, rtol=5e-5, atol=2e-4)


def test_scatter_window_bf16(rng):
    """bf16 cotangents scatter with exact products (f32 MXU accumulate)."""
    from eventad_tpu.ops.gather_window import scatter_window_rows

    n, k, c, lb = 300, 8, 16, 128
    src, nbr, mask = _case(rng, n, k, c, lb)
    g16 = jnp.asarray(rng.randn(n, k, c).astype(np.float32)) \
        .astype(jnp.bfloat16)
    out = np.asarray(scatter_window_rows(
        g16, jnp.asarray(nbr), jnp.asarray(mask), n,
        block=256, out_dtype=jnp.bfloat16, interpret=True)
        .astype(jnp.float32))
    want = _scatter_oracle(np.asarray(g16.astype(jnp.float32)),
                           nbr, mask, n)
    np.testing.assert_allclose(
        out, jnp.asarray(want).astype(jnp.bfloat16).astype(jnp.float32),
        rtol=1e-2, atol=1e-2)


def test_gather_window_full_lookback(rng):
    """Neighbours spanning the whole (rounded-up) window depth."""
    n, k, c, lb = 520, 4, 7, 260
    src, nbr, mask = _case(rng, n, k, c, lb)
    out = np.asarray(gather_window_rows(
        jnp.asarray(src), jnp.asarray(nbr), jnp.asarray(mask),
        lookback=lb, interpret=True))
    want = np.where(mask[..., None], src[nbr], 0.0)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)

"""GRU cell vs torch.nn.GRU (the reference's recurrent core)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from eventad_tpu.models.gru import GRULayerParams, GRUParams, gru_step


def torch_to_params(gru: "torch.nn.GRU") -> GRUParams:
    layers = []
    for i in range(gru.num_layers):
        w_ih = getattr(gru, f"weight_ih_l{i}").detach().numpy().T
        w_hh = getattr(gru, f"weight_hh_l{i}").detach().numpy().T
        b_ih = getattr(gru, f"bias_ih_l{i}").detach().numpy()
        b_hh = getattr(gru, f"bias_hh_l{i}").detach().numpy()
        layers.append(GRULayerParams(*(jnp.asarray(a) for a in
                                       (w_ih, w_hh, b_ih, b_hh))))
    return GRUParams(tuple(layers))


@pytest.mark.parametrize("layers,ind,hd", [(1, 4, 32), (2, 64, 256)])
def test_gru_matches_torch(rng, layers, ind, hd):
    tg = torch.nn.GRU(ind, hd, layers, batch_first=True)
    params = torch_to_params(tg)
    b = 5
    x = rng.randn(b, ind).astype(np.float32)
    h = rng.randn(b, layers, hd).astype(np.float32)

    with torch.no_grad():
        out_t, h_t = tg(torch.from_numpy(x)[:, None, :],
                        torch.from_numpy(h.transpose(1, 0, 2)).contiguous())
    out_j, h_j = gru_step(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out_j), out_t[:, -1].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j),
                               h_t.numpy().transpose(1, 0, 2),
                               rtol=1e-4, atol=1e-5)

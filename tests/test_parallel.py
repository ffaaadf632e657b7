"""Data-parallel training/eval over a multi-device mesh (8 virtual CPU
devices from conftest). Verifies the multi-chip contract the driver's
``dryrun_multichip`` exercises: sharded batches, replicated params,
XLA-inserted gradient synchronization — and that the sharded step computes
the SAME numbers as the single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eventad_tpu.config import Config
from eventad_tpu.data.synthetic import make_synthetic_batch
from eventad_tpu.models.dagr import graph_static_config, init_model
from eventad_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from eventad_tpu.parallel.train_step import make_optimizer, make_train_fns


@pytest.fixture(scope="module")
def setup():
    cfg = Config(batch_size=8, width=96, height=72, scale=1,
                 use_image=False, event_buckets=(1024,),
                 graph_lookback=256)
    params, state, bc, mc = init_model(jax.random.PRNGKey(0), cfg)
    gsc = graph_static_config(cfg)
    batch = jax.tree.map(jnp.asarray, make_synthetic_batch(cfg))
    opt = make_optimizer(1e-3, 1e-5, 1.0)
    fns = make_train_fns(cfg, bc, mc, gsc, opt)
    return cfg, params, state, batch, opt, fns


def test_mesh_shapes():
    assert len(jax.devices()) >= 8          # conftest provisions 8 CPU
    mesh = make_mesh("4x2")
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_mesh_degrades_gracefully():
    with pytest.warns(UserWarning, match="degrading"):
        mesh = make_mesh("16x2")
    assert mesh.devices.shape[0] == len(jax.devices())


def test_sharded_train_step_matches_single_device(setup):
    cfg, params, state, batch, opt, fns = setup
    opt_state = opt.init(params.head)
    rng = jax.random.PRNGKey(1)

    # train_step donates params/state/opt — hand it copies so the shared
    # fixture arrays survive
    copy = lambda t: jax.tree.map(jnp.copy, t)

    # single-device reference step
    p1, s1, o1, m1 = fns.train_step(copy(params), copy(state),
                                    copy(opt_state), batch, rng)

    # sharded step: batch over 'data', params/opt replicated
    mesh = make_mesh("8")
    sbatch = shard_batch(batch, mesh)
    rep = replicated(mesh)
    # device_put may alias the source buffer on one device; the donated
    # inputs must be copies or the fixture's arrays get deleted
    sparams = jax.device_put(copy(params), rep)
    sstate = jax.device_put(copy(state), rep)
    sopt = jax.device_put(opt.init(sparams.head), rep)
    p8, s8, o8, m8 = fns.train_step(sparams, sstate, sopt, sbatch, rng)

    assert bool(m8["finite"])
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(p1.head)
    l8 = jax.tree.leaves(p8.head)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_eval_matches_single_device(setup):
    cfg, params, state, batch, opt, fns = setup
    logits1, valid1, *_ = fns.eval_step(params, state, batch)
    mesh = make_mesh("4x2")
    sbatch = shard_batch(batch, mesh)
    rep = replicated(mesh)
    logits8, valid8, *_ = fns.eval_step(jax.device_put(params, rep),
                                        jax.device_put(state, rep), sbatch)
    np.testing.assert_array_equal(np.asarray(valid1), np.asarray(valid8))
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits8),
                               rtol=1e-5, atol=1e-6)

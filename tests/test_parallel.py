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


def test_model_axis_spec_rules():
    from eventad_tpu.parallel.sharding import model_axis_spec
    from jax.sharding import PartitionSpec as P
    # conv kernel: widest divisible dim, last axis wins ties -> Cout
    assert model_axis_spec((3, 3, 128, 128), 2) == P(None, None, None,
                                                     "model")
    assert model_axis_spec((1, 1, 512, 128), 2) == P(None, None, "model",
                                                     None)
    # spline kernel [K, C, O]
    assert model_axis_spec((25, 64, 64), 2) == P(None, None, "model")
    # small leaves and indivisible shapes stay replicated
    assert model_axis_spec((64,), 2) == P()
    assert model_axis_spec((25, 63, 63), 2, min_size=1) == P()
    assert model_axis_spec((3, 3, 128, 128), 1) == P()


def test_model_sharded_detector_step_matches_replicated():
    """Tensor/FSDP-parallel detector training over the 'model' axis: the
    large weights are physically sharded (parallel/sharding.py), XLA
    partitions the compute, and the step computes the same loss as the
    fully-replicated run."""
    import optax
    from eventad_tpu.models.detector import detector_forward, init_detector
    from eventad_tpu.models.yolox_loss import (convert_to_training_format,
                                               make_anchor_geometry,
                                               yolox_loss)
    from eventad_tpu.parallel import shard_params, sharded_init

    cfg = Config(batch_size=4, width=96, height=72, scale=1,
                 use_image=False, event_buckets=(512,), graph_lookback=128)
    params, state, bc = init_detector(jax.random.PRNGKey(0), cfg)
    grids = [bc.grids[2], bc.grids[3]]
    strides = [int(round(bc.height / g[1])) for g in grids]
    geom = make_anchor_geometry(grids, strides)
    batch = jax.tree.map(jnp.asarray, make_synthetic_batch(cfg))
    opt = optax.adamw(1e-3)

    def loss_fn(params, state, batch):
        _d, dec, ns = detector_forward(params, state, batch, cfg, bc,
                                       training=True)
        obj = jnp.clip(dec[..., 4:], 1e-6, 1 - 1e-6)
        logits = dec.at[..., 4:].set(jnp.log(obj) - jnp.log1p(-obj))
        tgt, tmask = convert_to_training_format(batch.bbox, batch.bbox_mask)
        return yolox_loss(logits, tgt, tmask, geom,
                          l1_weight=0.0)["total"], ns

    @jax.jit
    def train_step(params, state, opt_state, batch):
        (loss, ns), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), ns, new_opt, loss

    p1, _, _, loss1 = train_step(params, state, opt.init(params), batch)

    mesh = make_mesh("4x2")
    sparams = shard_params(params, mesh)
    n_sharded = sum(1 for l in jax.tree.leaves(sparams)
                    if any(s is not None for s in l.sharding.spec))
    assert n_sharded >= 10   # the big spline/head weights really shard
    sstate = jax.device_put(state, replicated(mesh))
    sopt = sharded_init(opt.init, sparams, mesh)
    p2, _, sopt2, loss2 = train_step(sparams, sstate, sopt,
                                     shard_batch(batch, mesh))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)

    # updated params and adam moments keep the model-axis sharding
    def spec_of(tree):
        return {jax.tree_util.keystr(p): l.sharding.spec
                for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]}
    want = spec_of(sparams)
    got = spec_of(p2)

    def norm(spec):   # PartitionSpec drops trailing Nones inconsistently
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return t
    # every deliberately-sharded weight keeps its model-axis sharding (XLA
    # may additionally shard small replicated leaves — benign)
    for k, v in want.items():
        if any(x is not None for x in v):
            assert norm(got[k]) == norm(v), (k, got[k], v)
    # parameter values match the replicated step (adamw on near-zero
    # grads is reduction-order sensitive; bound by 2*lr update range)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)


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

"""Jitted train/eval steps + optimizer with reduce-on-plateau.

Reference training loop: AdamW(lr, weight_decay) +
ReduceLROnPlateau(factor=0.5, patience=5) on val loss, grad clipping by norm
(utils/train.py:27-53,141-152). Only the anomaly head trains; DAGR is frozen
(EventAD.py:149-150) — gradients are taken w.r.t. ``params.head`` only.

The reference's NaN/Inf loss+grad checks and ``detect_anomaly`` (SURVEY.md
5.2) map to an in-graph ``is_finite`` flag returned from the step (checked by
the host loop) and optional ``jax.debug_nans``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.dagr import ModelParams, ModelState, model_forward


class PlateauState(NamedTuple):
    best: float
    bad_epochs: int
    scale: float


def plateau_init() -> PlateauState:
    return PlateauState(best=float("inf"), bad_epochs=0, scale=1.0)


def plateau_update(st: PlateauState, val_loss: float, *, factor: float = 0.5,
                   patience: int = 5) -> PlateauState:
    """torch ReduceLROnPlateau(mode='min') semantics (threshold 1e-4 rel)."""
    if val_loss < st.best * (1 - 1e-4):
        return PlateauState(val_loss, 0, st.scale)
    bad = st.bad_epochs + 1
    if bad > patience:
        return PlateauState(st.best, 0, st.scale * factor)
    return PlateauState(st.best, bad, st.scale)


def make_optimizer(learning_rate: float, weight_decay: float,
                   grad_clip: float):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay),
    )


def set_lr(opt_state, lr: float):
    opt_state[1].hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state


class TrainStepFns(NamedTuple):
    train_step: callable
    eval_step: callable


def make_train_fns(cfg, bc, mc, gsc, optimizer,
                   mesh=None) -> TrainStepFns:
    """Builds jitted train/eval steps. With a mesh, batch leaves are sharded
    on 'data' and gradients are synchronized by jit-inserted collectives."""
    img_net = cfg.img_net

    def loss_fn(head_params, dagr_params, state, batch, rng):
        params = ModelParams(dagr_params, head_params)
        out, new_state = model_forward(params, state, batch, bc, mc, gsc,
                                       img_net=img_net, training=True,
                                       rng=rng)
        return out.loss, (out, new_state)

    def train_step(params: ModelParams, state: ModelState, opt_state,
                   batch, rng):
        (loss, (out, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params.head, params.dagr, state, batch,
                                   rng)
        finite = jnp.isfinite(loss)
        gflat = jax.tree.leaves(grads)
        for g in gflat:
            finite = finite & jnp.isfinite(g).all()
        # skip the update entirely on non-finite loss/grads (the reference
        # raises; we keep the step total and let the host loop count it)
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = optimizer.update(safe_grads, opt_state,
                                            params.head)
        new_head = optax.apply_updates(params.head, updates)
        new_head = jax.tree.map(
            lambda a, b: jnp.where(finite, a, b), new_head, params.head)
        new_params = ModelParams(params.dagr, new_head)
        metrics = dict(loss=loss, n_valid=out.n_valid, finite=finite)
        return new_params, new_state, new_opt, metrics

    def eval_step(params: ModelParams, state: ModelState, batch):
        out, _ = model_forward(params, state, batch, bc, mc, gsc,
                               img_net=img_net, training=False)
        return out.logits, out.valid, out.labels, out.loss, out.n_valid

    # with a mesh, the caller device_puts the batch with P('data') shardings
    # (parallel.mesh.shard_batch) and replicates params; jit propagates the
    # shardings and inserts the gradient all-reduce over ICI automatically
    train = jax.jit(train_step, donate_argnums=(0, 1, 2))
    ev = jax.jit(eval_step)
    return TrainStepFns(train, ev)

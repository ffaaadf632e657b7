"""Learning-rate schedules for detector training.

Reference: ``LRSchedule`` (src/dagr/utils/learning_rate_scheduler.py:8-47,
YOLOX warm-up + cosine + step reductions) and the adam/sgd factory helpers
(optimization.py:3-48). Implemented as optax schedules."""
from __future__ import annotations

import math

import optax


def yolox_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                   min_lr_ratio: float = 0.05,
                   no_aug_steps: int = 0) -> optax.Schedule:
    """Quadratic warm-up then cosine to ``min_lr_ratio * base_lr``; flat at
    the floor over the final no-augmentation phase (YOLOX semantics)."""
    min_lr = base_lr * min_lr_ratio
    cos_steps = max(total_steps - warmup_steps - no_aug_steps, 1)

    def schedule(step):
        import jax.numpy as jnp
        warm = base_lr * (jnp.minimum(step, warmup_steps)
                          / max(warmup_steps, 1)) ** 2
        t = jnp.clip((step - warmup_steps) / cos_steps, 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_schedule(base_lr: float, boundaries, factor: float = 0.1):
    return optax.piecewise_constant_schedule(
        base_lr, {int(b): factor for b in boundaries})


def make_detector_optimizer(kind: str, lr_schedule, weight_decay: float,
                            clip: float, momentum: float = 0.9):
    opt = (optax.sgd(lr_schedule, momentum=momentum) if kind == "sgd"
           else optax.adamw(lr_schedule, weight_decay=weight_decay))
    return optax.chain(optax.clip_by_global_norm(clip), opt)

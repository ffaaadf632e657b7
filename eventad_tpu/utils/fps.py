"""Inference throughput measurement (reference utils/fps.py:6-96).

The reference brackets each batch with ``torch.cuda.synchronize``; the JAX
equivalent is ``jax.block_until_ready`` on the outputs. FPS counts
``len(bbox) + len(bbox0)`` object instances per second (utils/fps.py:58) —
preserved, it is the unit of the committed baseline number (595.48)."""
from __future__ import annotations

import time
from typing import Callable

import jax


def measure_fps(forward_fn: Callable, loader, *, warmup_batches: int = 5,
                num_batches: int = 20) -> dict:
    batch_times, batch_sizes = [], []
    i = -1
    for i, (batch, _meta) in enumerate(loader):
        if not batch.bbox_mask.any():
            continue
        if i < warmup_batches:
            jax.block_until_ready(forward_fn(batch))
            continue
        if len(batch_times) >= num_batches:
            break
        n_boxes = int(batch.bbox_mask.sum()) + int(batch.bbox0_mask.sum())
        batch_sizes.append(n_boxes)
        t0 = time.perf_counter()
        jax.block_until_ready(forward_fn(batch))
        batch_times.append(time.perf_counter() - t0)

    total_time = sum(batch_times)
    total_samples = sum(batch_sizes)
    fps = total_samples / total_time if total_time > 0 else 0.0
    return {
        "fps": fps,
        "avg_batch_size": (total_samples / len(batch_sizes)
                           if batch_sizes else 0.0),
        "total_time": total_time,
        "num_batches": len(batch_times),
        "p50_ms": (sorted(batch_times)[len(batch_times) // 2] * 1e3
                   if batch_times else float("nan")),
    }

"""Validation + ROC/PR curve plots (reference utils/visualization.py:9-139)."""
from __future__ import annotations

import os
from typing import Callable

import numpy as np
from sklearn.metrics import (auc, average_precision_score,
                             precision_recall_curve, roc_curve)


def validate_and_visualize(forward_fn: Callable, loader, result_dir: str,
                           epoch: int, *, plot: bool = True):
    """forward_fn(batch) -> (logits, valid, labels, loss, n_valid) numpy.
    Returns (val_loss, roc_auc, ap)."""
    scores, labels = [], []
    total_loss, total_n = 0.0, 0
    for batch, _meta in loader:
        if not batch.bbox_mask.any():
            continue
        logits, valid, labs, loss, n_valid = forward_fn(batch)
        v = np.asarray(valid)
        scores.append(np.asarray(logits)[..., 1][v])
        labels.append(np.asarray(labs)[v])
        total_loss += float(loss)
        total_n += int(n_valid)
    if not scores or total_n == 0:
        raise RuntimeError("validation produced no valid boxes")
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    val_loss = total_loss / max(total_n, 1)

    if len(np.unique(labels)) < 2:
        roc_auc, ap = float("nan"), float("nan")
    else:
        fpr, tpr, _ = roc_curve(labels, scores)
        roc_auc = auc(fpr, tpr)
        ap = average_precision_score(labels, scores)
        if plot:
            _save_plots(result_dir, epoch, labels, scores, fpr, tpr, roc_auc,
                        ap)
    return val_loss, roc_auc, ap


def _save_plots(result_dir, epoch, labels, scores, fpr, tpr, roc_auc, ap):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    os.makedirs(result_dir, exist_ok=True)
    fig, ax = plt.subplots()
    ax.plot(fpr, tpr, label=f"AUC = {roc_auc:.4f}")
    ax.plot([0, 1], [0, 1], "k--")
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    ax.legend()
    fig.savefig(os.path.join(result_dir, f"roc_curve_epoch_{epoch}.png"))
    plt.close(fig)

    prec, rec, _ = precision_recall_curve(labels, scores)
    fig, ax = plt.subplots()
    ax.plot(rec, prec, label=f"AP = {ap:.4f}")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.legend()
    fig.savefig(os.path.join(result_dir, f"pr_curve_epoch_{epoch}.png"))
    plt.close(fig)

"""Metric functions vs the reference's own implementation, imported directly
from the read-only snapshot (behavioural golden test, not a code copy)."""
import importlib.util

import numpy as np
import pytest

from eventad_tpu.utils import evaluation as ours

REF = "/root/reference/utils/evaluation.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_evaluation", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scores_labels(rng, n=400):
    labels = (rng.rand(n) > 0.6).astype(np.float64)
    scores = rng.randn(n) + labels * 1.5
    return labels, scores


def test_bbox_metrics_match(ref, rng):
    labels, scores = _scores_labels(rng)
    a = ours.calculate_bbox_metrics(labels, scores)
    b = ref.calculate_bbox_metrics(labels, scores)
    assert abs(a["auc"] - b["auc"]) < 1e-12
    assert abs(a["ap"] - b["ap"]) < 1e-12


def test_frame_metrics_match(ref, rng):
    frame_data = {}
    for v in range(4):
        vid = f"video_{v}"
        frame_data[vid] = {}
        for f in range(25):
            n = rng.randint(1, 5)
            labels = (rng.rand(n) > 0.7).astype(float).tolist()
            scores = (rng.randn(n) + np.array(labels) * 2).tolist()
            frame_data[vid][f] = {"scores": scores, "labels": labels}
    a = ours.calculate_frame_metrics(frame_data)
    b = ref.calculate_frame_metrics(frame_data)
    assert abs(a["auc_frame"] - b["auc_frame"]) < 1e-12


def test_tta_metrics_match(ref, rng):
    preds, first, toa = {}, {}, {}
    for v in range(6):
        vid = f"v{v}"
        preds[vid] = {f: float(rng.rand()) for f in range(30)}
        first[vid] = int(rng.randint(5, 30))
        if v % 2 == 0:
            toa[vid] = int(rng.randint(5, 30))
    a = ours.calculate_tta_metrics(preds, first, toa)
    b = ref.calculate_tta_metrics(preds, first, toa)
    if np.isnan(b["mtta"]):
        assert np.isnan(a["mtta"])
    else:
        assert abs(a["mtta"] - b["mtta"]) < 1e-12


def test_response_metrics_match(ref, rng):
    preds = {}
    for v in range(6):
        vid = f"v{v}"
        preds[vid] = {f: float(rng.rand() * 1.2 - 0.1) for f in range(30)}
    a = ours.calculate_response_metrics(preds, fps=595.48)
    b = ref.calculate_response_metrics(preds, fps=595.48)
    if np.isnan(b["mresponse"]):
        assert np.isnan(a["mresponse"])
    else:
        assert abs(a["mresponse"] - b["mresponse"]) < 1e-12


def test_response_reproduces_committed_baseline(ref):
    """The committed mRESPONSE (1.2017, BASELINE.md) arises from the
    frame-id collapse: one frame per video at id 0 with a positive score.
    (20 + 4) / 20 + 1/595.48 = 1.20168."""
    preds = {f"v{i}": {0: 0.95} for i in range(10)}
    b = ref.calculate_response_metrics(preds, fps=595.48)
    a = ours.calculate_response_metrics(preds, fps=595.48)
    assert abs(b["mresponse"] - 1.20168) < 1e-4
    assert abs(a["mresponse"] - b["mresponse"]) < 1e-12

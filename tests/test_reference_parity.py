"""End-to-end head parity against the REFERENCE IMPLEMENTATION ITSELF.

Imports models/EventAD.py from the read-only snapshot (it only needs torch),
instantiates the reference ``EventADModel`` with a stub DAGR, injects the
feature tensor through its input-hash cache (EventAD.py:349-354) so the
frozen backbone is bypassed, runs the reference forward, converts the torch
weights with :mod:`eventad_tpu.models.convert`, and checks our slotted head
produces identical logits and loss."""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from eventad_tpu.models.convert import convert_eventad_head  # noqa: E402
from eventad_tpu.models.eventad import (EventADConfig,  # noqa: E402
                                        eventad_forward)

REF = "/root/reference/models/EventAD.py"


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location("ref_eventad", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeData:
    pass


def test_full_head_parity(ref_mod, rng):
    torch.manual_seed(0)
    stub_dagr = torch.nn.Linear(4, 4)   # parameters get frozen, never used
    model = ref_mod.EventADModel(stub_dagr, x_dim=16, h_dim=32)
    model.eval()

    b, s1, xd = 3, 31, 16
    width, height = 64, 48
    feats = rng.randn(b, 2, s1, xd).astype(np.float32)
    feats[:, 1][rng.rand(b, s1) > 0.6] = 0.0

    # boxes: one per present slot, track id in column 5, label in column 4
    boxes_rows, batch_rows = [], []
    present = np.zeros((b, s1), bool)
    labels_slot = np.zeros((b, s1), np.int64)
    coords_slot = np.zeros((b, s1, 4), np.float32)
    for bi in range(b):
        for tid in range(1, 8):
            if rng.rand() < 0.5:
                x, y = rng.randint(0, 32), rng.randint(0, 24)
                w, h = rng.randint(4, 16), rng.randint(4, 16)
                cls = int(rng.rand() > 0.5)
                boxes_rows.append([x, y, w, h, cls, tid])
                batch_rows.append(bi)
                present[bi, tid] = True
                labels_slot[bi, tid] = cls
                coords_slot[bi, tid] = (x / width, y / height, w / width,
                                        h / height)
    data = FakeData()
    data.num_graphs = b
    data.x = torch.zeros(5, 1)
    data.bbox = torch.tensor(np.array(boxes_rows, np.float32))
    data.bbox_batch = torch.tensor(np.array(batch_rows, np.int64))
    data.width = torch.tensor([width] * b)
    data.height = torch.tensor([height] * b)

    # inject features via the reference's input-hash cache
    x_sum = data.x.sum().item()
    model.batch_input_hash = hash(str(x_sum))
    model.batch_feature_cache = torch.tensor(feats)

    labels = data.bbox[:, 4]
    with torch.no_grad():
        losses, outputs, out_labels = model(data, labels, testing=True)

    # reference outputs -> slot-indexed arrays for comparison
    ref_logits = np.zeros((b, s1, 2), np.float32)
    ref_valid = np.zeros((b, s1), bool)
    fi = 0
    for bi in range(b):
        slots = [tid for tid in range(1, 31)
                 if present[bi, tid] and np.abs(feats[bi, 1, tid]).sum() > 0]
        if not slots:
            continue
        frame_outputs = outputs[fi]
        fi += 1
        for tid, out in zip(slots, frame_outputs):
            ref_logits[bi, tid] = out.numpy().reshape(-1)
            ref_valid[bi, tid] = True

    params = convert_eventad_head(
        {k: v.detach().numpy() for k, v in model.state_dict().items()})
    mc = EventADConfig(x_dim=xd, h_dim=32)
    ours = eventad_forward(params, mc, jnp.asarray(feats),
                           jnp.asarray(coords_slot),
                           jnp.asarray(present),
                           jnp.asarray(labels_slot.astype(np.int32)))

    assert (np.asarray(ours.valid) == ref_valid).all()
    got = np.where(ref_valid[..., None], np.asarray(ours.logits), 0)
    exp = np.where(ref_valid[..., None], ref_logits, 0)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ours.loss),
                               float(losses["cross_entropy"]), rtol=1e-4)

"""Direct parity tests against the reference implementation itself
(imported from /root/reference, torch CPU) — stronger than re-derived
oracles: the vectorized on-device matcher must reproduce the reference's
per-class loop (transoar/models/matcher.py) match-for-match."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.helpers import tiny_config
from transoar_tpu.models.anchors import generate_anchors
from transoar_tpu.models.matcher import match


def _load_reference_matcher():
    sys.path.insert(0, "/root/reference")
    try:
        from transoar.models.matcher import Matcher
        return Matcher
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("anchor_matching", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matcher_parity_with_reference(anchor_matching, seed):
    try:
        Matcher = _load_reference_matcher()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference matcher unavailable: {e}")

    rng = np.random.default_rng(seed)
    organs, qpo, B = 4, 7, 2
    cfg = tiny_config(num_organs=organs, qpo=qpo)
    anchors, _ = generate_anchors(cfg["neck"], cfg["bbox_properties"])

    logits = rng.normal(size=(B, organs * qpo, 1)).astype(np.float32)
    boxes = np.clip(anchors[None] + rng.normal(
        scale=0.05, size=(B, organs * qpo, 6)), 0.01, 1).astype(np.float32)

    # targets: organ o present unless dropped; one box per class
    present = rng.uniform(size=(B, organs)) > 0.25
    present[:, 0] = True
    tgt_boxes = np.zeros((B, organs, 6), np.float32)
    for b in range(B):
        for o in range(organs):
            c = rng.uniform(0.3, 0.7, 3)
            s = rng.uniform(0.1, 0.3, 3)
            tgt_boxes[b, o] = np.concatenate([c, s])

    # reference call
    ref_matcher = Matcher(cost_class=1, cost_bbox=2, cost_giou=1.5,
                          anchor_matching=anchor_matching,
                          num_organs=organs)
    outputs = {
        "pred_logits": torch.tensor(logits),
        "pred_boxes": torch.tensor(boxes),
    }
    targets = []
    for b in range(B):
        labels = torch.tensor(
            [o + 1 for o in range(organs) if present[b, o]])
        tboxes = torch.tensor(
            np.stack([tgt_boxes[b, o] for o in range(organs)
                      if present[b, o]]))
        targets.append({"boxes": tboxes, "labels": labels})
    ref_matches, ref_soft = ref_matcher(
        outputs, targets, torch.tensor(anchors))

    ours_m, ours_s = match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(anchors),
        jnp.asarray(tgt_boxes), jnp.asarray(present), organs,
        cost_class=1, cost_bbox=2, cost_giou=1.5,
        anchor_matching=anchor_matching)

    np.testing.assert_allclose(np.asarray(ours_m),
                               ref_matches.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_s),
                               ref_soft.numpy(), atol=1e-4)

"""Query-target matching, fully vectorized on-device.

TPU-native re-design of reference ``transoar/models/matcher.py``. The
reference runs a per-batch, per-class python double loop on *CPU* every
training step (matcher.py:29-63 — ``.cpu()`` round trip inside the hot
loop). Because the Focused Decoder has exactly one ground-truth box per
class, the whole matching is a ``[B, organs, qpo]`` argmin — here it is one
fused XLA computation inside the jitted train step, no host sync.

Targets are fixed-shape: ``boxes [B, organs, 6]`` (cxcyczwhd) +
``present [B, organs]`` bool (replacing the reference's ragged
``List[{label: box}]``, matcher.py:35).

Semantics mirrored exactly (matcher.py:49-63):
  cost = cost_class * (-sigmoid(logit))
       + cost_bbox  * L1(query_box, gt_box)
       + cost_giou  * (-GIoU(query_box, gt_box))
with ``anchor_matching`` the box costs use the static anchors, making the
assignment independent of predictions given targets. Soft labels are the
normalized GIoU-cost ramp ``((c - max) / (min - max)).clip(0)``
(matcher.py:60); absent classes get soft label -1 (ignored by the BCE loss,
matcher.py:46).

The Hungarian matcher for the DETR-branch lives in
``transoar_tpu.models.hungarian``.
"""

from __future__ import annotations

import jax.numpy as jnp

from transoar_tpu.utils.boxes import (box_cxcyczwhd_to_xyzxyz,
                                      generalized_box_iou_pairwise)


def match(pred_logits, pred_boxes, anchors, tgt_boxes, tgt_present,
          num_organs, cost_class=1.0, cost_bbox=0.0, cost_giou=0.0,
          anchor_matching=True):
    """Compute matches and soft labels.

    Args:
      pred_logits: [B, Q, 1] raw classification logits.
      pred_boxes: [B, Q, 6] decoded boxes (cxcyczwhd in [0, 1]).
      anchors: [Q, 6] static anchors (may be None if not anchor_matching).
      tgt_boxes: [B, organs, 6] one GT box per class slot.
      tgt_present: [B, organs] bool.
      num_organs: static int.

    Returns:
      matches: [B, organs, qpo] one-hot float of the best query per organ.
      soft_labels: [B, organs, qpo]; -1 where the class is absent.
    """
    B, Q, _ = pred_logits.shape
    qpo = Q // num_organs

    logits = pred_logits.reshape(B, num_organs, qpo).astype(jnp.float32)
    if anchor_matching:
        boxes = jnp.broadcast_to(
            anchors.reshape(1, num_organs, qpo, 6), (B, num_organs, qpo, 6))
    else:
        boxes = pred_boxes.reshape(B, num_organs, qpo, 6).astype(jnp.float32)

    tgt = tgt_boxes.astype(jnp.float32)  # [B, organs, 6]

    c_class = -jnp.clip(1.0 / (1.0 + jnp.exp(-logits)), 0.0, 1.0)
    c_bbox = jnp.abs(boxes - tgt[:, :, None, :]).sum(-1)  # L1, [B, organs, qpo]

    # GIoU of each organ's queries against its single GT box; the reference
    # clips predicted boxes at 0 before converting (matcher.py:52).
    q_corner = box_cxcyczwhd_to_xyzxyz(jnp.clip(boxes, 0.0))
    t_corner = box_cxcyczwhd_to_xyzxyz(tgt)[:, :, None, :]  # [B, organs, 1, 6]
    giou = generalized_box_iou_pairwise(q_corner, t_corner)[..., 0]
    c_giou = -giou

    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou

    best = jnp.argmin(cost, axis=-1)  # [B, organs]
    matches = jnp.zeros_like(cost).at[
        jnp.arange(B)[:, None],
        jnp.arange(num_organs)[None, :],
        best,
    ].set(1.0)

    # Soft labels: normalized giou-cost ramp per organ (matcher.py:60).
    c_max = c_giou.max(axis=-1, keepdims=True)
    c_min = c_giou.min(axis=-1, keepdims=True)
    denom = c_min - c_max
    soft = jnp.where(
        jnp.abs(denom) > 1e-12, (c_giou - c_max) / denom, 1.0)
    soft = jnp.clip(soft, 0.0)

    present = tgt_present[:, :, None]
    matches = jnp.where(present, matches, 0.0)
    soft_labels = jnp.where(present, soft, -1.0)
    return matches, soft_labels

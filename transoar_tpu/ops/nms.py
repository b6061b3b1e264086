"""Vectorized 3D non-maximum suppression (fixed shapes, jittable).

The reference's RetinaNet / Retina U-Net branch uses a compiled CUDA NMS
(reference README.md:56; source on the unmounted `retina-unet` branch). The
TPU version avoids data-dependent shapes entirely: greedy NMS is ``max_out``
rounds of (argmax over masked scores) + (vectorized IoU suppression) — an
O(K * N) sequence of VPU-friendly [N] ops under ``lax.fori_loop``.

Returns fixed-size index/validity arrays; downstream consumers mask by
``valid`` instead of compacting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transoar_tpu.utils.boxes import box_iou_pairwise

NEG = -1e9


def nms_3d(boxes, scores, iou_threshold=0.5, max_out=100,
           score_threshold=None):
    """Greedy NMS on corner-format boxes.

    Args:
      boxes: [N, 6] (x1, y1, z1, x2, y2, z2).
      scores: [N].
      iou_threshold: suppress boxes with IoU > threshold vs a kept box.
      max_out: static number of output slots.
      score_threshold: optionally pre-discard low scores.

    Returns:
      keep_idx [max_out] int32, valid [max_out] bool.
    """
    N = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if score_threshold is not None:
        scores = jnp.where(scores >= score_threshold, scores, NEG)

    iou, _ = box_iou_pairwise(boxes, boxes)  # [N, N]

    def body(i, state):
        keep_idx, valid, live_scores = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        ok = best_score > NEG / 2

        keep_idx = keep_idx.at[i].set(jnp.where(ok, best, -1))
        valid = valid.at[i].set(ok)

        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(N) == best)
        live_scores = jnp.where(ok & suppress, NEG, live_scores)
        return keep_idx, valid, live_scores

    keep_idx = jnp.full((max_out,), -1, jnp.int32)
    valid = jnp.zeros((max_out,), bool)
    keep_idx, valid, _ = jax.lax.fori_loop(
        0, min(max_out, N), body, (keep_idx, valid, scores))
    return keep_idx, valid


def batched_class_nms(boxes, scores, classes, iou_threshold=0.5,
                      max_out=100, score_threshold=None):
    """Per-class NMS in one pass: offset each class's boxes into a disjoint
    region so cross-class pairs never overlap (the standard trick)."""
    offsets = classes.astype(boxes.dtype)[:, None] * 2.0  # [N, 1]
    shifted = boxes + offsets  # broadcasts over all 6 corner coords
    return nms_3d(shifted, scores, iou_threshold, max_out, score_threshold)

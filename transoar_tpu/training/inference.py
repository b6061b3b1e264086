"""Prediction decoding: model outputs -> final per-class detections.

Re-design of reference ``transoar/inference.py:5-33``: sigmoid the logits,
reshape to ``[B, organs, queries_per_organ]``, take the best query per organ
— one box/class/score per organ. The decode is a jittable on-device function
(the reference runs on CPU with ``.cpu()`` per box); a numpy wrapper adapts
the result to the evaluator's list-of-arrays interface.

Conscious fix: the reference ``return`` sits inside the batch loop
(inference.py:33) so it silently only ever emits batch element 0; here the
full batch is decoded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def decode_predictions(pred_logits, pred_boxes):
    """[B, Q, 1], [B, Q, 6] -> (boxes [B, organsʼ, 6], scores [B, organsʼ])
    where organsʼ groups queries per organ by Q // organs inferred later.

    Kept shape-generic: caller reshapes by num_organs.
    """
    return jax.nn.sigmoid(pred_logits[..., 0]), pred_boxes


def inference(out, num_organs):
    """Mirror of the reference API: returns per-image lists
    (boxes [organs, 6], classes [organs], scores [organs]), classes 1-based.
    """
    probs, boxes = decode_predictions(out["pred_logits"], out["pred_boxes"])
    probs = np.asarray(probs)
    boxes = np.asarray(boxes)

    B, Q = probs.shape
    qpo = Q // num_organs
    probs = probs.reshape(B, num_organs, qpo)
    boxes = boxes.reshape(B, num_organs, qpo, 6)

    best = probs.argmax(-1)  # [B, organs]
    b_idx = np.arange(B)[:, None]
    o_idx = np.arange(num_organs)[None, :]

    sel_boxes = boxes[b_idx, o_idx, best]   # [B, organs, 6]
    sel_scores = probs[b_idx, o_idx, best]  # [B, organs]
    classes = np.tile(np.arange(1, num_organs + 1), (B, 1))

    return (list(sel_boxes), list(classes), list(sel_scores))

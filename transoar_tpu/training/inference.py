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

    Dispatches on the classification-head shape: one binary logit per query
    = focused branch (queries own their class positionally); softmax over
    ``num_organs + 1`` classes = DETR branches (best query per class over
    the whole query set).
    """
    logits = np.asarray(out["pred_logits"])
    boxes = np.asarray(out["pred_boxes"])
    B = logits.shape[0]

    if logits.shape[-1] == 1:
        probs = 1.0 / (1.0 + np.exp(-logits[..., 0]))
        Q = probs.shape[1]
        qpo = Q // num_organs
        probs = probs.reshape(B, num_organs, qpo)
        boxes = boxes.reshape(B, num_organs, qpo, 6)

        best = probs.argmax(-1)  # [B, organs]
        b_idx = np.arange(B)[:, None]
        o_idx = np.arange(num_organs)[None, :]
        sel_boxes = boxes[b_idx, o_idx, best]
        sel_scores = probs[b_idx, o_idx, best]
    else:
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = (e / e.sum(-1, keepdims=True))[..., 1:]  # drop no-object
        best = probs.argmax(axis=1)       # [B, organs] best query per class
        sel_scores = probs.max(axis=1)    # [B, organs]
        b_idx = np.arange(B)[:, None]
        sel_boxes = boxes[b_idx, best]    # [B, organs, 6]

    classes = np.tile(np.arange(1, num_organs + 1), (B, 1))
    return (list(sel_boxes), list(classes), list(sel_scores))

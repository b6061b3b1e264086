"""Matcher + criterion tests, including golden comparisons against a
straightforward numpy re-implementation of the reference semantics
(transoar/models/matcher.py, criterion.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.models.anchors import generate_anchors
from transoar_tpu.models.criterion import (Criterion, loss_class,
                                           loss_segmentation, total_loss)
from transoar_tpu.models.matcher import match
from transoar_tpu.utils.boxes import box_cxcyczwhd_to_xyzxyz, box_iou_np


def _np_giou(b1, b2):
    """Reference GIoU on corner-format numpy boxes [N, 6] x [M, 6]."""
    iou = box_iou_np(b1, b2, box_format="xyzxyz")
    d1 = b1[:, 3:] - b1[:, :3]
    d2 = b2[:, 3:] - b2[:, :3]
    v1 = d1.prod(-1)
    v2 = d2.prod(-1)
    lo = np.minimum(b1[:, None, :3], b2[None, :, :3])
    hi = np.maximum(b1[:, None, 3:], b2[None, :, 3:])
    enc = np.clip(hi - lo, 0, None).prod(-1)
    inter = iou * (v1[:, None] + v2[None] - iou * (v1[:, None] + v2[None]))
    # recompute union directly to avoid algebra above
    lo_i = np.maximum(b1[:, None, :3], b2[None, :, :3])
    hi_i = np.minimum(b1[:, None, 3:], b2[None, :, 3:])
    inter = np.clip(hi_i - lo_i, 0, None).prod(-1)
    union = v1[:, None] + v2[None] - inter
    return iou - (enc - union) / enc


def _reference_match(logits, boxes, tgt_boxes, tgt_present, cost_class=1.0,
                     cost_bbox=0.0, cost_giou=0.0):
    """Per-class python-loop matcher mirroring reference matcher.py:41-63."""
    B, organs, qpo = logits.shape
    matches = np.zeros((B, organs, qpo))
    soft = np.zeros((B, organs, qpo))
    for b in range(B):
        for o in range(organs):
            if not tgt_present[b, o]:
                soft[b, o] = -1
                continue
            c_class = -1 / (1 + np.exp(-logits[b, o]))
            c_bbox = np.abs(boxes[b, o] - tgt_boxes[b, o][None]).sum(-1)
            c_giou = -_np_giou(
                box_cxcyczwhd_to_xyzxyz(np.clip(boxes[b, o], 0, None)),
                box_cxcyczwhd_to_xyzxyz(tgt_boxes[b, o][None]))[:, 0]
            C = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
            matches[b, o, C.argmin()] = 1
            soft[b, o] = np.clip(
                (c_giou - c_giou.max()) / (c_giou.min() - c_giou.max()), 0,
                None)
    return matches, soft


def _setup(seed=0, B=2, organs=3, qpo=7):
    rng = np.random.default_rng(seed)
    cfg = tiny_config(num_organs=organs, qpo=qpo)
    anchors, _ = generate_anchors(cfg["neck"], cfg["bbox_properties"])
    logits = rng.normal(size=(B, organs * qpo, 1)).astype(np.float32)
    boxes = np.clip(
        anchors[None] + rng.normal(scale=0.02, size=(B, organs * qpo, 6)),
        0, 1).astype(np.float32)
    tgt_boxes = np.stack([
        np.array([cfg["bbox_properties"][str(c + 1)]["median"]
                  for c in range(organs)], np.float32)
    ] * B)
    tgt_present = np.ones((B, organs), bool)
    tgt_present[1, 2] = False
    return cfg, anchors, logits, boxes, tgt_boxes, tgt_present


def test_match_against_reference_loop():
    cfg, anchors, logits, boxes, tgt_boxes, tgt_present = _setup()
    organs, qpo = 3, 7

    for anchor_matching in (True, False):
        m, s = match(jnp.asarray(logits), jnp.asarray(boxes),
                     jnp.asarray(anchors), jnp.asarray(tgt_boxes),
                     jnp.asarray(tgt_present), organs,
                     cost_class=1.0, cost_bbox=2.0, cost_giou=1.5,
                     anchor_matching=anchor_matching)
        ref_boxes = (np.broadcast_to(anchors.reshape(1, organs, qpo, 6),
                                     (2, organs, qpo, 6))
                     if anchor_matching
                     else boxes.reshape(2, organs, qpo, 6))
        rm, rs = _reference_match(
            logits.reshape(2, organs, qpo), ref_boxes, tgt_boxes,
            tgt_present, cost_class=1.0, cost_bbox=2.0, cost_giou=1.5)
        np.testing.assert_allclose(np.asarray(m), rm, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s), rs, atol=1e-5)


def test_loss_class_masks_absent():
    soft = jnp.array([[[0.5, 1.0], [-1.0, -1.0]]])  # organ 1 absent
    logits = jnp.zeros((1, 4, 1))
    loss = loss_class(logits, soft, num_organs=2)
    # BCE(0 logit, y) = log(2) - ... : -y*log(.5)-(1-y)*log(.5) = log 2
    np.testing.assert_allclose(float(loss), np.log(2), atol=1e-6)


def test_criterion_end_to_end_matches_hand_computation():
    cfg, anchors, logits, boxes, tgt_boxes, tgt_present = _setup()
    organs, qpo = 3, 7
    crit = Criterion(cfg)

    outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
    }
    targets = {"boxes": jnp.asarray(tgt_boxes),
               "present": jnp.asarray(tgt_present)}
    losses = jax.jit(lambda o, t: crit(o, t, jnp.asarray(anchors)))(
        outputs, targets)

    # Hand-compute bbox/giou on the reference matching.
    rm, rs = _reference_match(
        logits.reshape(2, organs, qpo),
        np.broadcast_to(anchors.reshape(1, organs, qpo, 6),
                        (2, organs, qpo, 6)),
        tgt_boxes, tgt_present, cost_class=1.0)
    num_boxes = tgt_present.sum()
    l1_sum, giou_sum = 0.0, 0.0
    for b in range(2):
        for o in range(organs):
            if not tgt_present[b, o]:
                continue
            q = rm[b, o].argmax()
            pred = boxes.reshape(2, organs, qpo, 6)[b, o, q]
            l1_sum += np.abs(pred - tgt_boxes[b, o]).sum()
            giou_sum += 1 - _np_giou(
                box_cxcyczwhd_to_xyzxyz(np.clip(pred, 0, None)[None]),
                box_cxcyczwhd_to_xyzxyz(tgt_boxes[b, o][None]))[0, 0]
    np.testing.assert_allclose(float(losses["bbox"]), l1_sum / num_boxes,
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses["giou"]), giou_sum / num_boxes,
                               rtol=1e-4)

    # cls: masked-mean BCE on soft labels
    valid = rs != -1
    z = logits.reshape(2, organs, qpo)
    bce = np.clip(z, 0, None) - z * np.clip(rs, 0, None) + np.log1p(
        np.exp(-np.abs(z)))
    np.testing.assert_allclose(float(losses["cls"]),
                               bce[valid].mean(), rtol=1e-5)

    t = total_loss(losses, cfg["loss_coefs"])
    assert np.isfinite(float(t))


def test_segmentation_losses():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 8, 8, 4, 2)).astype(np.float32)
    seg = (rng.uniform(size=(2, 8, 8, 4)) > 0.7).astype(np.int32) * 2

    ce, dice = loss_segmentation(jnp.asarray(pred), jnp.asarray(seg),
                                 fg_bg=True)
    # CE golden: softmax cross-entropy vs binarized labels
    tgt = (seg > 0).astype(int)
    logp = pred - np.log(np.exp(pred).sum(-1, keepdims=True))
    ce_ref = -logp.reshape(-1, 2)[np.arange(tgt.size), tgt.ravel()].mean()
    np.testing.assert_allclose(float(ce), ce_ref, rtol=1e-5)
    assert 0 <= float(dice) <= 1

    # Perfect prediction -> dice loss ~ 0
    perfect = np.eye(2, dtype=np.float32)[tgt] * 50.0
    _, dice_p = loss_segmentation(jnp.asarray(perfect), jnp.asarray(seg))
    assert float(dice_p) < 1e-3


def test_aux_losses_present():
    cfg, anchors, logits, boxes, tgt_boxes, tgt_present = _setup()
    crit = Criterion(cfg)
    outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "aux_logits": jnp.asarray(logits[None]),
        "aux_boxes": jnp.asarray(boxes[None]),
    }
    targets = {"boxes": jnp.asarray(tgt_boxes),
               "present": jnp.asarray(tgt_present)}
    losses = crit(outputs, targets, jnp.asarray(anchors))
    assert {"bbox_0", "giou_0", "cls_0"} <= set(losses)
    # identical layer outputs -> identical losses
    np.testing.assert_allclose(float(losses["bbox_0"]),
                               float(losses["bbox"]), rtol=1e-6)


def test_criterion_grads_flow():
    cfg, anchors, logits, boxes, tgt_boxes, tgt_present = _setup()
    crit = Criterion(cfg)
    targets = {"boxes": jnp.asarray(tgt_boxes),
               "present": jnp.asarray(tgt_present)}

    def loss_fn(b):
        outputs = {"pred_logits": jnp.asarray(logits), "pred_boxes": b}
        return total_loss(crit(outputs, targets, jnp.asarray(anchors)),
                          cfg["loss_coefs"])

    g = jax.grad(loss_fn)(jnp.asarray(boxes))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

"""Detection + segmentation-proxy losses, fully on-device.

TPU-native re-design of reference ``transoar/models/criterion.py``:

- ``loss_class`` (criterion.py:40-49): BCE-with-logits against the matcher's
  soft labels, averaged over valid entries (soft label != -1 marks absent
  classes). The reference gathers valid ids with ``nonzero`` (dynamic shape);
  here it is a masked mean.
- ``loss_bboxes`` (criterion.py:52-75): L1 + 3D-GIoU on the matched query of
  each present organ, normalized by the number of GT boxes. The matched
  query is extracted with a one-hot contraction instead of
  ``matches.nonzero()`` — static shapes, no host sync.
- ``loss_segmentation`` (criterion.py:77-89): cross-entropy + nnU-Net-style
  SoftDice (batch_dice=True, softmax, no background, smooth 1e-5;
  criterion.py:127-205) on the P0 seg head.
- Auxiliary losses re-match every decoder layer (criterion.py:114-123).
  Conscious fix of a reference bug: the reference computes aux box losses on
  the *final* outputs with aux matches (criterion.py:118 passes ``outputs``
  instead of ``aux_outputs``); we use the aux layer's own boxes.

All losses are float32 scalars; the loss dict keys follow the reference so
``loss_coefs[key.split('_')[0]]`` weighting works (trainer.py:72-74).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from transoar_tpu.models.matcher import match
from transoar_tpu.utils.boxes import (box_cxcyczwhd_to_xyzxyz,
                                      generalized_box_iou_elementwise)


def _bce_with_logits(logits, labels):
    """Numerically stable elementwise binary cross-entropy with logits."""
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def loss_class(pred_logits, soft_labels, num_organs, count=None):
    """BCE on soft labels, mean over valid entries (criterion.py:40-49).

    ``count`` overrides the valid-entry normalizer — used by the exact
    per-sample gradient-accumulation microbatch (trainer.py), which sums
    per-sample numerators against the batch-global denominator.
    """
    B, Q, _ = pred_logits.shape
    logits = pred_logits.reshape(B, num_organs, -1).astype(jnp.float32)
    valid = soft_labels != -1
    bce = _bce_with_logits(logits, jnp.clip(soft_labels, 0.0))
    total = jnp.sum(jnp.where(valid, bce, 0.0))
    if count is None:
        count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def loss_bboxes(pred_boxes, matches, tgt_boxes, tgt_present, num_organs,
                num_boxes=None):
    """Matched-query L1 + GIoU losses (criterion.py:52-75)."""
    B, Q, _ = pred_boxes.shape
    boxes = pred_boxes.reshape(B, num_organs, -1, 6).astype(jnp.float32)

    # One-hot contraction extracts the matched query per organ.
    matched = jnp.einsum("boq,boqc->boc", matches, boxes)  # [B, organs, 6]
    tgt = tgt_boxes.astype(jnp.float32)
    present = tgt_present.astype(jnp.float32)

    if num_boxes is None:
        num_boxes = jnp.maximum(present.sum(), 1.0)

    l1 = jnp.abs(matched - tgt).sum(-1) * present
    loss_l1 = l1.sum() / num_boxes

    giou = generalized_box_iou_elementwise(
        box_cxcyczwhd_to_xyzxyz(jnp.clip(matched, 0.0)),
        box_cxcyczwhd_to_xyzxyz(tgt))
    loss_giou = ((1.0 - giou) * present).sum() / num_boxes
    return loss_l1, loss_giou


def soft_dice_loss(logits, seg_onehot, smooth=1e-5):
    """nnU-Net SoftDice: batch dice, softmax nonlin, background excluded
    (criterion.py:127-205). logits/seg_onehot: [B, S0, S1, S2, K]."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    axes = (0, 1, 2, 3)  # batch_dice=True: reduce over batch + spatial
    tp = jnp.sum(probs * seg_onehot, axis=axes)
    fp = jnp.sum(probs * (1.0 - seg_onehot), axis=axes)
    fn = jnp.sum((1.0 - probs) * seg_onehot, axis=axes)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    return 1.0 - dc[1:].mean()  # do_bg=False


def loss_segmentation(pred_seg, seg_targets, fg_bg=True):
    """CE + SoftDice on the seg-proxy head (criterion.py:77-89).

    pred_seg: [B, S0, S1, S2, K]; seg_targets: [B, S0, S1, S2] int labels.
    """
    K = pred_seg.shape[-1]
    tgt = jnp.where(seg_targets > 0, 1, 0) if fg_bg else seg_targets
    onehot = jax.nn.one_hot(tgt, K, dtype=jnp.float32)

    logp = jax.nn.log_softmax(pred_seg.astype(jnp.float32), axis=-1)
    ce = -(onehot * logp).sum(-1).mean()
    dice = soft_dice_loss(pred_seg, onehot)
    return ce, dice


class Criterion:
    """Bundles matcher + losses (reference TransoarCriterion,
    criterion.py:9-125). Pure function of (outputs, targets) — instances only
    hold static config, so calls are jit-safe."""

    def __init__(self, config):
        self.num_organs = config["neck"]["num_organs"]
        m = config["matching"]
        self.cost_class = float(m["cost_class"])
        self.cost_bbox = float(m["cost_bbox"])
        self.cost_giou = float(m["cost_giou"])
        self.anchor_matching = bool(m["anchor_matching"])
        self.seg_proxy = bool(config["backbone"].get("use_seg_proxy_loss"))
        self.fg_bg = bool(config["backbone"].get("fg_bg", True))
        self.aux_loss = bool(config["neck"].get("aux_loss"))
        # reference-faithful aux mode (criterion.py:115-124): each aux
        # layer's MATCHES come from the aux outputs, but bbox/giou/cls are
        # all computed on the FINAL outputs — the final layer gets
        # (1 + num_aux)x gradient signal and intermediate layers get no
        # direct loss. The default (False) is the conscious fix (each aux
        # layer supervised on its own boxes); measured effect of the
        # reference mode: see PARITY.md (multi-seed head-to-head, AP50).
        self.aux_on_final = bool(config["neck"].get("aux_loss_on_final"))

    @property
    def grads_scan_exact(self):
        """True when the trainer's per-sample grad-accumulation scan
        (microbatch='grads') reproduces the batched loss exactly: the
        matcher and every numerator are per-sample, and the only
        batch-coupling denominators are functions of ``batch_normalizer``.
        The seg proxy couples the batch in its numerators (softmax-CE /
        dice means over the whole batch), so it opts out."""
        return not self.seg_proxy

    def batch_normalizer(self, targets, anchors):
        """Batch-global scalar passed back in as ``present_total`` by the
        per-sample scan."""
        return targets["present"].sum()

    def _match(self, logits, boxes, anchors, tgt_boxes, tgt_present):
        return match(
            jax.lax.stop_gradient(logits), jax.lax.stop_gradient(boxes),
            anchors, tgt_boxes, tgt_present, self.num_organs,
            cost_class=self.cost_class, cost_bbox=self.cost_bbox,
            cost_giou=self.cost_giou, anchor_matching=self.anchor_matching)

    def __call__(self, outputs, targets, anchors,
                 present_total=None) -> Dict[str, Any]:
        """outputs: model dict; targets: {'boxes', 'present'[, 'seg']}.

        ``present_total`` (optional int scalar): batch-global number of
        present organs. When given, the cls/bbox normalizers are derived
        from it instead of from ``targets`` — this lets the trainer's
        gradient-accumulation microbatch call the criterion per-sample and
        SUM the results to recover the batched loss exactly (the matcher
        and every numerator are per-sample; only the two denominators
        couple the batch, and both are functions of ``present.sum()``).
        """
        tgt_boxes, tgt_present = targets["boxes"], targets["present"]

        num_boxes = cls_count = None
        if present_total is not None:
            qpo = outputs["pred_logits"].shape[1] // self.num_organs
            cls_count = jnp.maximum(present_total * qpo, 1)
            num_boxes = jnp.maximum(
                jnp.asarray(present_total, jnp.float32), 1.0)

        matches, soft = self._match(
            outputs["pred_logits"], outputs["pred_boxes"], anchors,
            tgt_boxes, tgt_present)
        l_bbox, l_giou = loss_bboxes(
            outputs["pred_boxes"], matches, tgt_boxes, tgt_present,
            self.num_organs, num_boxes=num_boxes)
        losses = {
            "bbox": l_bbox,
            "giou": l_giou,
            "cls": loss_class(outputs["pred_logits"], soft, self.num_organs,
                              count=cls_count),
        }

        if self.seg_proxy:
            ce, dice = loss_segmentation(
                outputs["pred_seg"], targets["seg"], fg_bg=self.fg_bg)
            losses["segce"], losses["segdice"] = ce, dice
        else:
            losses["segce"] = jnp.zeros(())
            losses["segdice"] = jnp.zeros(())

        if self.aux_loss and "aux_logits" in outputs:
            num_aux = outputs["aux_logits"].shape[0]
            for i in range(num_aux):
                a_logits = outputs["aux_logits"][i]
                a_boxes = outputs["aux_boxes"][i]
                m_i, s_i = self._match(a_logits, a_boxes, anchors,
                                       tgt_boxes, tgt_present)
                if self.aux_on_final:  # reference criterion.py:115-124
                    l_logits, l_boxes = (outputs["pred_logits"],
                                         outputs["pred_boxes"])
                else:
                    l_logits, l_boxes = a_logits, a_boxes
                lb, lg = loss_bboxes(l_boxes, m_i, tgt_boxes, tgt_present,
                                     self.num_organs, num_boxes=num_boxes)
                losses[f"bbox_{i}"] = lb
                losses[f"giou_{i}"] = lg
                losses[f"cls_{i}"] = loss_class(l_logits, s_i,
                                                self.num_organs,
                                                count=cls_count)

        return losses


def build_criterion(config):
    """Criterion dispatch: focused branch uses anchor matching + BCE
    (reference build.py:31-46); DETR branches use the Hungarian set
    criterion; a ``retina`` section selects focal-loss dense detection."""
    if "retina" in config:
        from transoar_tpu.models.retina import RetinaCriterion

        return RetinaCriterion(config)
    if config["neck"].get("name", "foc_attn") == "foc_attn":
        return Criterion(config)
    from transoar_tpu.models.detr import SetCriterion

    return SetCriterion(config)


def total_loss(losses, loss_coefs):
    """Weighted sum, coefficient looked up by key prefix
    (reference trainer.py:72-74)."""
    return sum(v * loss_coefs[k.split("_")[0]] for k, v in losses.items())

"""RetinaNet / Retina U-Net 3D baseline: dense anchors + focal loss + NMS.

The reference's RetinaNet branch lives on the unmounted ``retina-unet``
branch (reference README.md:16-18,56); this is its TPU-native equivalent,
following the nnDetection-style 3D RetinaNet recipe:

- ``AnchorGenerator3D``: per FPN level, anchors at every voxel with
  ``scales x aspect-ratio`` size combinations, normalized cxcyczwhd.
- ``RetinaHead``: shared conv towers over the levels -> per-anchor class
  logits (sigmoid) and box deltas.
- Target assignment: max-IoU (positive >= 0.5, negative < 0.4, in-between
  ignored) against the padded per-class GT boxes.
- Losses: sigmoid focal loss (alpha 0.25, gamma 2.0) + L1 on encoded deltas
  + GIoU on decoded boxes for positives.
- Decode: deltas -> boxes, per-class NMS (``transoar_tpu.ops.nms``).
- Retina U-Net = same + the seg-proxy P0 head (criterion.loss_segmentation).

Everything is fixed-shape and jittable; assignment is a [A, G] IoU argmax.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transoar_tpu.models.attn_fpn import AttnFPN
from transoar_tpu.models.focused_decoder import level_spatial_shape
from transoar_tpu.ops.conv3d import FastConv3D
from transoar_tpu.ops.nms import nms_3d
from transoar_tpu.utils.boxes import (box_cxcyczwhd_to_xyzxyz,
                                      box_iou_pairwise,
                                      generalized_box_iou_elementwise)


def generate_level_anchors(patch_size, level, scales, ratios):
    """Anchors for one P-level: [S_l * K, 6] normalized cxcyczwhd.

    ``scales``: base sizes in voxels at the input resolution.
    ``ratios``: per-axis multiplier triples.
    """
    shape = level_spatial_shape(patch_size, level)
    stride = 2 ** level
    patch = np.asarray(patch_size, np.float64)

    centers = np.stack(np.meshgrid(
        *[(np.arange(s) + 0.5) * stride for s in shape], indexing="ij"),
        axis=-1).reshape(-1, 3) / patch  # [S_l, 3] normalized

    sizes = []
    for scale in scales:
        for ratio in ratios:
            sizes.append(np.asarray(ratio, np.float64) * scale / patch)
    sizes = np.stack(sizes)  # [K, 3]

    anchors = np.concatenate([
        np.repeat(centers, len(sizes), axis=0),
        np.tile(sizes, (len(centers), 1)),
    ], axis=-1)
    return anchors.astype(np.float32)


def build_anchors(config):
    """All-level anchors [A, 6] + per-level counts."""
    rcfg = config["retina"]
    patch = config["augmentation"]["patch_size"]
    anchors, counts = [], []
    for level in rcfg["levels"]:
        a = generate_level_anchors(patch, int(level[-1]),
                                   rcfg["anchor_scales"],
                                   rcfg["anchor_ratios"])
        anchors.append(a)
        counts.append(len(a))
    return np.concatenate(anchors), counts


def encode_deltas(boxes, anchors):
    """cxcyczwhd boxes -> regression targets relative to anchors."""
    d_center = (boxes[..., :3] - anchors[..., :3]) / anchors[..., 3:]
    d_size = jnp.log(jnp.clip(boxes[..., 3:], 1e-6) / anchors[..., 3:])
    return jnp.concatenate([d_center, d_size], axis=-1)


def decode_deltas(deltas, anchors):
    centers = anchors[..., :3] + deltas[..., :3] * anchors[..., 3:]
    sizes = anchors[..., 3:] * jnp.exp(jnp.clip(deltas[..., 3:], -6, 6))
    return jnp.concatenate([centers, sizes], axis=-1)


class ConvTower(nn.Module):
    depth: int
    features: int
    out_features: int
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    # conv3d variant for the tower convs ("" = the auto policy). The
    # narrow-stem measurements behind the auto policy ("native 3-5x
    # slower") don't transfer to C=128 towers where channels fill the MXU
    # lanes; `retina.tower_conv` exposes the choice per config.
    conv_variant: str = ""

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = FastConv3D(self.features, (3, 3, 3), dtype=self.dtype,
                           force_variant=self.conv_variant,
                           name=f"conv{i}")(x)
            x = nn.relu(x)
        return FastConv3D(
            self.out_features, (3, 3, 3), dtype=self.dtype,
            bias_init=nn.initializers.constant(self.bias_init_value),
            force_variant=self.conv_variant, name="out")(x)


class RetinaNet(nn.Module):
    """Backbone FPN + shared cls/reg towers over the configured levels."""
    config: Dict[str, Any]
    anchors: Any  # np [A, 6]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        rcfg = cfg["retina"]
        num_classes = cfg["neck"]["num_organs"]
        K = len(rcfg["anchor_scales"]) * len(rcfg["anchor_ratios"])

        backbone_out = AttnFPN(cfg["backbone"], dtype=self.dtype,
                               name="backbone")(x,
                                                deterministic=deterministic)

        tower_conv = rcfg.get("tower_conv", "")
        cls_tower = ConvTower(
            rcfg.get("tower_depth", 4), rcfg.get("tower_channels", 128),
            K * num_classes,
            # focal-loss prior: P(fg) ~ 0.01 at init
            bias_init_value=float(-np.log((1 - 0.01) / 0.01)),
            dtype=self.dtype, conv_variant=tower_conv, name="cls_tower")
        reg_tower = ConvTower(
            rcfg.get("tower_depth", 4), rcfg.get("tower_channels", 128),
            K * 6, dtype=self.dtype, conv_variant=tower_conv,
            name="reg_tower")

        logits, deltas = [], []
        B = x.shape[0]
        for level in rcfg["levels"]:
            fmap = backbone_out[level]
            logits.append(cls_tower(fmap).reshape(B, -1, num_classes))
            deltas.append(reg_tower(fmap).reshape(B, -1, 6))

        out = {
            "anchor_logits": jnp.concatenate(
                logits, axis=1).astype(jnp.float32),   # [B, A, C]
            "anchor_deltas": jnp.concatenate(
                deltas, axis=1).astype(jnp.float32),   # [B, A, 6]
        }
        if cfg["backbone"].get("use_seg_proxy_loss"):
            num_seg = 2 if cfg["backbone"].get("fg_bg", True) \
                else num_classes + 1
            out["pred_seg"] = FastConv3D(
                num_seg, (1, 1, 1), dtype=self.dtype,
                name="seg_head")(backbone_out["P0"]).astype(jnp.float32)
        return out


def build_retinanet(config, dtype=None):
    if dtype is None:
        name = config.get("trainer", {}).get("precision", "bfloat16")
        dtype = jnp.bfloat16 if name == "bfloat16" else jnp.float32
    anchors, _ = build_anchors(config)
    return RetinaNet(config=config, anchors=anchors, dtype=dtype)


def sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Elementwise focal loss (RetinaNet)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


class RetinaCriterion:
    """Max-IoU assignment + focal/L1/GIoU losses."""

    def __init__(self, config):
        rcfg = config["retina"]
        self.num_classes = config["neck"]["num_organs"]
        self.pos_iou = rcfg.get("pos_iou", 0.5)
        self.neg_iou = rcfg.get("neg_iou", 0.4)
        self.alpha = rcfg.get("focal_alpha", 0.25)
        self.gamma = rcfg.get("focal_gamma", 2.0)
        self.seg_proxy = bool(config["backbone"].get("use_seg_proxy_loss"))
        self.fg_bg = bool(config["backbone"].get("fg_bg", True))

    def _assign(self, tgt_boxes, present, anchors):
        """Max-IoU anchor->GT assignment; pure function of targets+anchors
        (no model outputs), so the batch-global positive count can be
        precomputed before a per-sample scan."""
        anchor_corner = box_cxcyczwhd_to_xyzxyz(anchors)

        def assign_one(boxes_g, present_g):
            iou, _ = box_iou_pairwise(
                anchor_corner, box_cxcyczwhd_to_xyzxyz(boxes_g))  # [A, G]
            iou = jnp.where(present_g[None, :], iou, -1.0)
            return jnp.argmax(iou, axis=1), jnp.max(iou, axis=1)

        return jax.vmap(assign_one)(tgt_boxes, present)

    @property
    def grads_scan_exact(self):
        """Per-sample grad-accumulation exactness (trainer microbatch=
        'grads'): focal/L1/GIoU numerators are per-anchor (per-sample) and
        the single batch-coupling denominator num_pos is a function of
        targets+anchors only (batch_normalizer). The seg proxy couples the
        batch in its numerators, so it opts out."""
        return not self.seg_proxy

    def scan_aux(self, targets, anchors):
        """Per-sample anchor assignment rows [B, A] for the trainer's grads
        scan: a pure function of targets+anchors, computed ONCE per step and
        threaded through the scan so neither ``batch_normalizer`` nor the
        per-sub-batch ``__call__`` repeats the [B, A, G] IoU pass (~1.3M
        anchors at AMOS size)."""
        best_gt, best_iou = self._assign(
            targets["boxes"].astype(jnp.float32), targets["present"],
            anchors)
        return {"best_gt": best_gt, "best_iou": best_iou}

    def batch_normalizer(self, targets, anchors, aux=None):
        if aux is None:
            aux = self.scan_aux(targets, anchors)
        return (aux["best_iou"] >= self.pos_iou).sum()

    def __call__(self, outputs, targets, anchors, present_total=None,
                 aux=None):
        """anchors [A, 6] cxcyczwhd; targets boxes [B, G, 6] + present.

        ``present_total``: batch-global positive-anchor count
        (batch_normalizer) — per-sample calls normalized by it SUM to the
        batched losses exactly. ``aux``: precomputed ``scan_aux`` rows.
        """
        logits = outputs["anchor_logits"]  # [B, A, C]
        deltas = outputs["anchor_deltas"]  # [B, A, 6]
        tgt_boxes = targets["boxes"].astype(jnp.float32)
        present = targets["present"]
        B, A, C = logits.shape

        if aux is not None:
            best_gt, best_iou = aux["best_gt"], aux["best_iou"]
        else:
            best_gt, best_iou = self._assign(tgt_boxes, present, anchors)

        pos = best_iou >= self.pos_iou                 # [B, A]
        neg = best_iou < self.neg_iou
        valid = pos | neg                              # ignore in-between

        # classification targets: one-hot of the matched GT class for pos
        gt_class = best_gt + 1  # class ids are slot + 1
        cls_t = jax.nn.one_hot(jnp.where(pos, gt_class, 0), C + 1)[..., 1:]
        focal = sigmoid_focal_loss(logits, cls_t, self.alpha, self.gamma)
        num_pos = jnp.maximum(
            pos.sum() if present_total is None else present_total, 1.0)
        loss_cls = jnp.where(valid[..., None], focal, 0.0).sum() / num_pos

        # one-hot matmul instead of take_along_axis: a [A]-indexed vector
        # gather from the tiny [G, 6] target table lowers to a 2.4 ms/step
        # gather kernel at 1.3M anchors (batch-1 profile); the [A, G] @
        # [G, 6] matmul is ~0.24 GFLOP and fuses
        onehot = jax.nn.one_hot(best_gt, tgt_boxes.shape[1],
                                dtype=tgt_boxes.dtype)
        matched = jnp.einsum("bag,bgc->bac", onehot, tgt_boxes)
        tgt_deltas = encode_deltas(matched, anchors[None])
        l1 = jnp.abs(deltas - tgt_deltas).sum(-1)
        loss_bbox = jnp.where(pos, l1, 0.0).sum() / num_pos

        decoded = decode_deltas(deltas, anchors[None])
        giou = generalized_box_iou_elementwise(
            box_cxcyczwhd_to_xyzxyz(jnp.clip(decoded, 0.0, 1.0)),
            box_cxcyczwhd_to_xyzxyz(matched))
        loss_giou = jnp.where(pos, 1.0 - giou, 0.0).sum() / num_pos

        losses = {"cls": loss_cls, "bbox": loss_bbox, "giou": loss_giou,
                  "segce": jnp.zeros(()), "segdice": jnp.zeros(())}
        if self.seg_proxy and "pred_seg" in outputs:
            from transoar_tpu.models.criterion import loss_segmentation

            ce, dice = loss_segmentation(outputs["pred_seg"],
                                         targets["seg"], fg_bg=self.fg_bg)
            losses["segce"], losses["segdice"] = ce, dice
        return losses


def retina_inference(outputs, anchors, num_classes, iou_threshold=0.5,
                     max_out=50, score_threshold=0.05):
    """Decode + per-image per-class NMS -> ragged numpy lists matching the
    evaluator interface (boxes, classes 1-based, scores)."""
    logits = np.asarray(outputs["anchor_logits"])
    deltas = np.asarray(outputs["anchor_deltas"])
    anchors_np = np.asarray(anchors)

    B = logits.shape[0]
    all_boxes, all_classes, all_scores = [], [], []
    for b in range(B):
        probs = 1.0 / (1.0 + np.exp(-logits[b]))  # [A, C]
        decoded = np.asarray(decode_deltas(jnp.asarray(deltas[b]),
                                           jnp.asarray(anchors_np)))
        boxes_i, classes_i, scores_i = [], [], []
        for c in range(num_classes):
            scores = probs[:, c]
            top = np.argsort(-scores)[:500]
            corner = np.asarray(box_cxcyczwhd_to_xyzxyz(
                jnp.asarray(decoded[top])))
            keep, valid = nms_3d(jnp.asarray(corner),
                                 jnp.asarray(scores[top]),
                                 iou_threshold=iou_threshold,
                                 max_out=max_out,
                                 score_threshold=score_threshold)
            keep = np.asarray(keep)[np.asarray(valid)]
            boxes_i.append(decoded[top][keep])
            classes_i.append(np.full(len(keep), c + 1))
            scores_i.append(scores[top][keep])
        all_boxes.append(np.concatenate(boxes_i) if boxes_i
                         else np.zeros((0, 6)))
        all_classes.append(np.concatenate(classes_i).astype(np.int64))
        all_scores.append(np.concatenate(scores_i))
    return all_boxes, all_classes, all_scores

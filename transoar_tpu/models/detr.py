"""DETR and Deformable-DETR necks + set criterion for the DETR branches.

The reference's DETR / Deformable-DETR variants live on unmounted git
branches (reference README.md:16-18) sharing the same training pipeline;
these modules provide their TPU-native equivalents, following 3D DETR
set-prediction semantics:

- ``DETRDecoder``: standard transformer decoder — query self-attention,
  *dense* cross-attention over the flattened feature level (no focused
  mask), FFN; post-norm; intermediate outputs for aux losses.
- ``DeformableDETRDecoder``: queries carry learned normalized reference
  points; cross-attention is 3D multi-scale deformable sampling
  (``transoar_tpu.models.def_attn.MSDeformAttn``) over the FPN levels; box
  centers are predicted as offsets from the reference points (the
  Deformable-DETR decoder design, adapted to 3D).
- ``SetCriterion``: Hungarian matching (on-device auction,
  ``transoar_tpu.models.hungarian``) with class/L1/GIoU costs; losses are
  softmax cross-entropy with a no-object class (eos coefficient 0.1), L1
  and GIoU on matched pairs, with per-layer aux losses — the DETR recipe.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from transoar_tpu.models.hungarian import hungarian_match
from transoar_tpu.models.layers import FFN, MultiHeadSelfAttention
from transoar_tpu.utils.boxes import (box_cxcyczwhd_to_xyzxyz,
                                      generalized_box_iou_elementwise,
                                      generalized_box_iou_pairwise)


class MultiHeadCrossAttention(nn.Module):
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v, deterministic=True, return_weights=False):
        return MultiHeadSelfAttention(
            self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="mha")(q, k, v, deterministic=deterministic,
                        return_weights=return_weights)


class DETRDecoderLayer(nn.Module):
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tgt, query_pos, src, src_pos, deterministic=True,
                 return_weights=False):
        q = tgt + query_pos
        sa = MultiHeadSelfAttention(self.num_heads, dropout=self.dropout,
                                    dtype=self.dtype, name="self_attn")(
            q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_sa")(tgt)

        ca = MultiHeadCrossAttention(self.num_heads, dropout=self.dropout,
                                     dtype=self.dtype, name="cross_attn")(
            tgt + query_pos, src + src_pos, src, deterministic=deterministic,
            return_weights=return_weights)
        weights = None
        if return_weights:
            ca, weights = ca
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_ca")(tgt)

        out = FFN(self.dim_feedforward, dropout=self.dropout,
                  dtype=self.dtype, name="ffn")(
            tgt, deterministic=deterministic)
        return (out, weights) if return_weights else out


class DETRDecoder(nn.Module):
    """Dense-cross-attention decoder; same interface as FocusedDecoder."""
    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, src, query_embed, pos, deterministic=True,
                 return_weights=False):
        cfg = self.config
        B, C = src.shape[0], src.shape[-1]
        src = src.reshape(B, -1, C)
        pos = pos.reshape(B, -1, C)

        query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(
            query_pos[None], (B, *query_pos.shape)).astype(self.dtype)
        tgt = jnp.broadcast_to(tgt[None], (B, *tgt.shape)).astype(self.dtype)

        layer_cls = (nn.remat(DETRDecoderLayer, static_argnums=(5, 6))
                     if cfg.get("remat", True) else DETRDecoderLayer)
        intermediate = []
        weights = None
        for i in range(cfg["dec_layers"]):
            # head-averaged cross-attn of the LAST layer — the reference's
            # attention-export hook protocol (reference scripts/test.py:81-84)
            want_w = bool(return_weights) and i == cfg["dec_layers"] - 1
            tgt = layer_cls(
                num_heads=cfg["nheads"],
                dim_feedforward=cfg["dim_feedforward"],
                dropout=cfg["dropout"], dtype=self.dtype,
                name=f"layer{i}")(tgt, query_pos, src, pos, deterministic,
                                  want_w)
            if want_w:
                tgt, weights = tgt
            intermediate.append(tgt)
        return jnp.stack(intermediate), weights


class DeformableDETRDecoderLayer(nn.Module):
    num_heads: int
    dim_feedforward: int
    dropout: float
    n_levels: int
    n_points: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tgt, query_pos, ref_points, src, spatial_shapes,
                 deterministic=True):
        from transoar_tpu.models.def_attn import MSDeformAttn

        q = tgt + query_pos
        sa = MultiHeadSelfAttention(self.num_heads, dropout=self.dropout,
                                    dtype=self.dtype, name="self_attn")(
            q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_sa")(tgt)

        # ref_points [B, Q, 3] broadcast over levels
        ref = jnp.tile(ref_points[:, :, None, :], (1, 1, self.n_levels, 1))
        ca = MSDeformAttn(tgt.shape[-1], self.n_levels, self.num_heads,
                          self.n_points, dtype=self.dtype,
                          name="cross_attn")(
            tgt + query_pos, ref, src, spatial_shapes)
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_ca")(tgt)

        return FFN(self.dim_feedforward, dropout=self.dropout,
                   dtype=self.dtype, name="ffn")(
            tgt, deterministic=deterministic)


class DeformableDETRDecoder(nn.Module):
    """Deformable-DETR decoder over multiple FPN levels.

    Interface: __call__(fmaps: list of [B, s0, s1, s2, C], query_embed)
    -> (hs [L, B, Q, C], ref_points [B, Q, 3]).
    """
    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, fmaps, query_embed, deterministic=True):
        cfg = self.config
        B = fmaps[0].shape[0]
        C = fmaps[0].shape[-1]
        spatial_shapes = tuple(tuple(f.shape[1:4]) for f in fmaps)

        src = jnp.concatenate([f.reshape(B, -1, C) for f in fmaps], axis=1)

        query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
        # learned reference points from the query positional embedding
        # (Deformable-DETR: Linear + sigmoid)
        ref = nn.sigmoid(nn.Dense(3, param_dtype=jnp.float32,
                                  name="ref_points")(query_pos))
        ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
        query_pos = jnp.broadcast_to(
            query_pos[None], (B, *query_pos.shape)).astype(self.dtype)
        tgt = jnp.broadcast_to(tgt[None], (B, *tgt.shape)).astype(self.dtype)

        intermediate = []
        for i in range(cfg["dec_layers"]):
            tgt = DeformableDETRDecoderLayer(
                num_heads=cfg["nheads"],
                dim_feedforward=cfg["dim_feedforward"],
                dropout=cfg["dropout"],
                n_levels=len(fmaps), n_points=cfg.get("n_points", 4),
                dtype=self.dtype, name=f"layer{i}")(
                    tgt, query_pos, ref, src, spatial_shapes,
                    deterministic=deterministic)
            intermediate.append(tgt)
        return jnp.stack(intermediate), ref


# ---------------------------------------------------------------------------
# Set criterion (Hungarian matching + CE/L1/GIoU)
# ---------------------------------------------------------------------------

def hungarian_cost(class_probs, pred_boxes, tgt_boxes, tgt_present,
                   cost_class=1.0, cost_bbox=5.0, cost_giou=2.0):
    """Cost matrix [B, G, Q] for the auction (G = class slots, one GT per
    class in this benchmark family; invalid slots masked)."""
    # class cost: -prob of the GT class for each query
    # class_probs [B, Q, K+1]; GT class of slot g is g+1
    B, Q, _ = class_probs.shape
    G = tgt_boxes.shape[1]
    cls_idx = jnp.arange(1, G + 1)
    c_class = -class_probs[:, :, cls_idx]  # [B, Q, G]
    c_class = c_class.transpose(0, 2, 1)  # [B, G, Q]

    c_bbox = jnp.abs(tgt_boxes[:, :, None, :] -
                     pred_boxes[:, None, :, :]).sum(-1)  # [B, G, Q]

    giou = generalized_box_iou_pairwise(
        box_cxcyczwhd_to_xyzxyz(tgt_boxes),
        box_cxcyczwhd_to_xyzxyz(jnp.clip(pred_boxes, 0.0)))  # [B, G, Q]
    cost = cost_class * c_class + cost_bbox * c_bbox - cost_giou * giou
    return jnp.where(tgt_present[:, :, None], cost, 0.0)


class SetCriterion:
    """DETR set-prediction loss with on-device Hungarian matching."""

    def __init__(self, config):
        self.num_classes = config["neck"]["num_organs"]
        self.num_queries = int(config["neck"]["num_queries"])
        m = config["matching"]
        self.cost_class = float(m.get("cost_class", 1))
        self.cost_bbox = float(m.get("cost_bbox", 5))
        self.cost_giou = float(m.get("cost_giou", 2))
        self.eos_coef = float(m.get("eos_coef", 0.1))
        self.aux_loss = bool(config["neck"].get("aux_loss"))

    grads_scan_exact = True

    def batch_normalizer(self, targets, anchors):
        """Batch-global denominators for the trainer's per-sample
        grad-accumulation scan. Both couplings are pure functions of the
        present-count: every present GT gets matched to exactly one query
        (a valid assignment), so the CE weight sum is
        present_total + eos_coef * (B*Q - present_total) regardless of
        WHICH queries the per-sample Hungarian picks."""
        present_total = targets["present"].sum()
        B = targets["present"].shape[0]
        weight_total = (present_total +
                        (B * self.num_queries - present_total) *
                        self.eos_coef)
        return {"num_boxes": jnp.maximum(
                    present_total.astype(jnp.float32), 1.0),
                "weight_total": weight_total}

    def _single(self, logits, boxes, tgt_boxes, tgt_present, norm=None):
        """logits [B, Q, K+1]; boxes [B, Q, 6]."""
        B, Q, _ = logits.shape
        G = tgt_boxes.shape[1]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        cost = hungarian_cost(
            jax.lax.stop_gradient(probs), jax.lax.stop_gradient(boxes),
            tgt_boxes, tgt_present, self.cost_class, self.cost_bbox,
            self.cost_giou)
        assign = hungarian_match(cost, tgt_present)  # [B, G] query idx

        # classification targets: no-object everywhere, GT class at matches.
        # Absent GT slots must not write at all — clipping assign=-1 to 0
        # would scatter no-object onto query 0 and clobber a real match
        # there. Route absent slots to an out-of-bounds index instead; the
        # scatter drops OOB updates.
        scatter_idx = jnp.where(tgt_present, assign, Q)
        cls_target = jnp.zeros((B, Q), jnp.int32)
        gt_classes = jnp.arange(1, G + 1, dtype=jnp.int32)[None].repeat(B, 0)
        cls_target = cls_target.at[
            jnp.arange(B)[:, None], scatter_idx].set(gt_classes, mode="drop")
        safe_assign = jnp.clip(assign, 0)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, cls_target[..., None], axis=-1)[..., 0]
        weights = jnp.where(cls_target > 0, 1.0, self.eos_coef)
        weight_total = weights.sum() if norm is None else \
            norm["weight_total"]
        loss_ce = (ce * weights).sum() / weight_total

        matched = jnp.take_along_axis(
            boxes.astype(jnp.float32), safe_assign[..., None], axis=1)
        present = tgt_present.astype(jnp.float32)
        num_boxes = jnp.maximum(present.sum(), 1.0) if norm is None else \
            norm["num_boxes"]

        l1 = (jnp.abs(matched - tgt_boxes).sum(-1) * present).sum() / num_boxes
        giou = generalized_box_iou_elementwise(
            box_cxcyczwhd_to_xyzxyz(jnp.clip(matched, 0.0)),
            box_cxcyczwhd_to_xyzxyz(tgt_boxes))
        loss_giou = ((1.0 - giou) * present).sum() / num_boxes
        return loss_ce, l1, loss_giou

    def __call__(self, outputs, targets, anchors=None, present_total=None):
        """``present_total``: the batch_normalizer dict — per-sample calls
        normalized by it SUM to the batched losses exactly (trainer
        microbatch='grads')."""
        tgt_boxes = targets["boxes"].astype(jnp.float32)
        tgt_present = targets["present"]
        norm = present_total

        ce, l1, giou = self._single(outputs["pred_logits"],
                                    outputs["pred_boxes"], tgt_boxes,
                                    tgt_present, norm=norm)
        losses = {"cls": ce, "bbox": l1, "giou": giou,
                  "segce": jnp.zeros(()), "segdice": jnp.zeros(())}
        if self.aux_loss and "aux_logits" in outputs:
            for i in range(outputs["aux_logits"].shape[0]):
                ce, l1, giou = self._single(
                    outputs["aux_logits"][i], outputs["aux_boxes"][i],
                    tgt_boxes, tgt_present, norm=norm)
                losses[f"cls_{i}"] = ce
                losses[f"bbox_{i}"] = l1
                losses[f"giou_{i}"] = giou
        return losses

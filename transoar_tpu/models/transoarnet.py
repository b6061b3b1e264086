"""TransoarNet: backbone + neck + heads, the top-level detection model.

TPU-native re-design of reference ``transoar/models/transoarnet.py``:
composes the AttnFPN backbone, a query-based neck (Focused Decoder / DETR /
Deformable DETR), classification + box-regression heads, and optional
segmentation-proxy head.

Design differences from the reference (all torch-isms removed):
- Anchors / offset restrictions / attention bias are numpy constants computed
  once by the ``build_transoarnet`` factory and baked into the jitted graph
  (vs ``.cuda()`` buffers, transoarnet.py:27-28).
- Box decoding ``clamp(tanh(pred) * restrictions + anchors, 0, 1)``
  (transoarnet.py:133-136) runs in float32 regardless of the bf16 compute
  dtype — box coordinates need the mantissa.
- Aux outputs are returned as stacked arrays ``[L, B, Q, .]`` rather than a
  list of dicts (transoarnet.py:146-155): fixed shapes let the criterion
  vmap over decoder layers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from transoar_tpu.models.anchors import generate_anchors
from transoar_tpu.models.attn_fpn import AttnFPN
from transoar_tpu.models.focused_decoder import (FocusedDecoder,
                                                 generate_attn_bias,
                                                 level_spatial_shape)
from transoar_tpu.models.layers import MLP
from transoar_tpu.models.position_encoding import build_pos_enc
from transoar_tpu.ops.conv3d import FastConv3D


class TransoarNet(nn.Module):
    config: Dict[str, Any]
    anchors: Any            # np [Q, 6] cxcyczwhd, or None when not anchor-based
    restrictions: Any       # np [Q, 6], or None
    attn_bias: Any          # np [organs, S] for the focused neck
    roi: Any = None         # (idx, valid) [organs, T] for RoI attention
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True, return_weights=False):
        """x: [B, S0, S1, S2, C_in] -> dict of predictions.

        Returns:
          pred_logits [B, Q, 1], pred_boxes [B, Q, 6] (last decoder layer),
          aux_logits [L-1, B, Q, 1], aux_boxes [L-1, B, Q, 6] (if aux_loss),
          pred_seg [B, S0, S1, S2, K] (if seg proxy), attn_weights (optional).
        """
        cfg = self.config
        neck_cfg = cfg["neck"]
        hidden_dim = neck_cfg["hidden_dim"]
        anchor_offset = neck_cfg["anchor_offset_pred"]

        backbone_out = AttnFPN(cfg["backbone"], dtype=self.dtype,
                               name="backbone")(x, deterministic=deterministic)

        neck_name = neck_cfg.get("name", "foc_attn")

        # Packed (query_pos | tgt) embedding (reference transoarnet.py:45);
        # N(0, 1) init like torch nn.Embedding.
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (neck_cfg["num_queries"], hidden_dim * 2), jnp.float32)

        weights = None
        ref_points = None
        if neck_name == "def_detr":
            from transoar_tpu.models.detr import DeformableDETRDecoder

            levels = neck_cfg.get("feature_levels") or \
                cfg["backbone"]["out_fmaps"]
            fmaps = [backbone_out[l] for l in levels]
            hs, ref_points = DeformableDETRDecoder(
                neck_cfg, dtype=self.dtype, name="neck")(
                    fmaps, query_embed, deterministic=deterministic)
        else:
            det_src = backbone_out[neck_cfg["input_levels"]]
            pos = build_pos_enc(neck_cfg["pos_encoding"], hidden_dim,
                                dtype=self.dtype)(det_src)
            if neck_name == "detr":
                from transoar_tpu.models.detr import DETRDecoder

                hs, weights = DETRDecoder(
                    neck_cfg, dtype=self.dtype, name="neck")(
                        det_src, query_embed, pos,
                        deterministic=deterministic,
                        return_weights=return_weights)
            else:
                hs, weights = FocusedDecoder(
                    neck_cfg, attn_bias=self.attn_bias, roi=self.roi,
                    dtype=self.dtype,
                    name="neck")(det_src, query_embed, pos,
                                 deterministic=deterministic,
                                 return_weights=return_weights)
        # hs: [L, B, Q, C]

        # Heads: the focused branch scores one binary logit per query
        # (class identity is positional, transoarnet.py:35); the DETR
        # branches classify into num_organs + 1 softmax classes.
        num_logits = 1 if neck_name == "foc_attn" else \
            neck_cfg["num_organs"] + 1
        zero_init = bool(anchor_offset) and neck_name == "foc_attn"
        logits = nn.Dense(
            num_logits, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=(nn.initializers.zeros if zero_init
                         else nn.initializers.lecun_normal()),
            bias_init=nn.initializers.zeros,
            name="cls_head")(hs).astype(jnp.float32)
        raw_boxes = MLP(hidden_dim, 6, 3, dtype=self.dtype,
                        zero_init_last=zero_init,
                        name="reg_head")(hs).astype(jnp.float32)

        if neck_name == "foc_attn" and anchor_offset:
            anchors = jnp.asarray(self.anchors)
            restrictions = jnp.asarray(self.restrictions)
            boxes = jnp.clip(jnp.tanh(raw_boxes) * restrictions + anchors,
                             0.0, 1.0)
        elif neck_name == "def_detr":
            # centers decoded relative to the learned reference points
            ref_logit = jnp.log(jnp.clip(ref_points, 1e-6) /
                                jnp.clip(1 - ref_points, 1e-6))
            centers = nn.sigmoid(raw_boxes[..., :3] +
                                 ref_logit[None].astype(jnp.float32))
            sizes = nn.sigmoid(raw_boxes[..., 3:])
            boxes = jnp.concatenate([centers, sizes], axis=-1)
        else:
            boxes = nn.sigmoid(raw_boxes)

        out = {
            "pred_logits": logits[-1],
            "pred_boxes": boxes[-1],
        }
        if neck_cfg.get("aux_loss"):
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = boxes[:-1]

        if cfg["backbone"].get("use_seg_proxy_loss"):
            seg_src = backbone_out["P0"]
            num_seg = 2 if cfg["backbone"].get("fg_bg", True) \
                else neck_cfg["num_organs"] + 1
            out["pred_seg"] = FastConv3D(
                num_seg, kernel_size=(1, 1, 1), dtype=self.dtype,
                name="seg_head")(seg_src).astype(jnp.float32)

        if return_weights:
            # parity with the reference's --save_attn_map hooks (reference
            # scripts/test.py:74-84): last decoder layer's cross- AND
            # self-attention plus the backbone out-conv feature map
            if isinstance(weights, dict):
                out["attn_weights"] = weights.get("cross")
                out["self_attn_weights"] = weights.get("self")
            else:
                out["attn_weights"] = weights
            if neck_name != "def_detr":
                out["backbone_fmap"] = det_src.astype(jnp.float32)
        return out


def build_transoarnet(config, dtype: Optional[jnp.dtype] = None):
    """Factory: compute anchors/restrictions/attention bias from the dataset
    statistics in ``config['bbox_properties']`` and instantiate the model.

    Mirrors the constant-building part of reference ``TransoarNet.__init__``
    (transoarnet.py:26-32) and the neck's mask generation
    (focused_decoder.py:120,138-159).
    """
    if dtype is None:
        name = config.get("trainer", {}).get("precision", "bfloat16")
        dtype = jnp.bfloat16 if name == "bfloat16" else jnp.float32

    neck_cfg = config["neck"]
    bbox_props = config["bbox_properties"]

    neck_name = neck_cfg.get("name", "foc_attn")
    anchors = restrictions = attn_bias = roi = None
    if neck_name == "foc_attn":
        if neck_cfg["anchor_offset_pred"]:
            anchors, restrictions = generate_anchors(neck_cfg, bbox_props)
        patch_size = config["augmentation"]["patch_size"]
        level = int(neck_cfg["input_levels"][-1])
        input_shape = level_spatial_shape(patch_size, level)
        attn_bias = generate_attn_bias(
            bbox_props, input_shape,
            restrict=neck_cfg.get("restrict_attn", True))
        if neck_cfg.get("restrict_attn", True) and \
                neck_cfg.get("roi_attention", True):
            from transoar_tpu.models.focused_decoder import roi_token_indices

            roi = roi_token_indices(attn_bias)

    return TransoarNet(
        config=config, anchors=anchors, restrictions=restrictions,
        attn_bias=attn_bias, roi=roi, dtype=dtype)


def build_model(config, dtype: Optional[jnp.dtype] = None):
    """Top-level model dispatch: a ``retina`` config section selects the
    RetinaNet/Retina-U-Net branch, otherwise TransoarNet with the configured
    neck (foc_attn / detr / def_detr)."""
    if "retina" in config:
        from transoar_tpu.models.retina import build_retinanet

        return build_retinanet(config, dtype=dtype)
    return build_transoarnet(config, dtype=dtype)


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

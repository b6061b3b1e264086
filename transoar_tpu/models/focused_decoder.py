"""Focused Decoder neck: DETR-style decoder whose cross-attention is
restricted to each organ's static attention area.

TPU-native re-design of reference
``transoar/models/necks/focused_decoder.py``:

- The reference materializes a boolean mask of shape ``[num_queries, S]``
  with a per-query python loop over voxel boxes (focused_decoder.py:138-159)
  and adds ``-inf`` where masked (focused_decoder.py:243-245). Queries of the
  same organ share one mask row (rows are ``repeat_interleave``d per organ),
  so here the bias is built once per *organ* ``[organs, S]`` in numpy at
  model-build time and broadcast over the organ's queries inside the fused
  attention — 27x less mask HBM traffic.
- The reference hard-codes P-level shape tables keyed on ``num_organs == 20``
  (focused_decoder.py:99-117); here level shapes are derived from the
  configured patch size (``patch_size // 2**level``), which reproduces those
  tables for both AMOS and VISCERAL.
- Reference quirk kept for parity: ``FocusedAttn`` projects queries with the
  *key* projection — ``q_proj`` is dead (focused_decoder.py:233-235). This is
  shared-QK attention; controlled by ``share_qk_proj``.

Layer structure per decoder layer (focused_decoder.py:171-189): query
self-attention -> masked cross-attention -> FFN, each with residual +
post-LayerNorm. Intermediate outputs of every layer are returned stacked for
the auxiliary losses (focused_decoder.py:68-80).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from transoar_tpu.models.layers import (FFN, MultiHeadSelfAttention,
                                        xavier_uniform)

MASKED_BIAS = -1e9  # additive bias for voxels outside the organ's attn area


def level_spatial_shape(patch_size, level):
    """P-level spatial shape = patch_size // 2**level (reference tables,
    focused_decoder.py:99-117)."""
    return tuple(int(s) // (2 ** level) for s in patch_size)


def generate_attn_bias(bbox_props, input_shape, restrict=True):
    """Per-organ additive attention bias over the flattened token axis.

    Mirrors reference ``generate_attn_masks`` (focused_decoder.py:138-159):
    the organ's normalized ``attn_area`` (x1y1z1x2y2z2) is scaled to the
    P-level voxel grid, floored/ceiled, and every voxel outside it is masked.

    Returns float32 ``[num_organs, S0*S1*S2]`` with 0 inside the area and
    ``MASKED_BIAS`` outside (all-zero if ``restrict`` is False).
    """
    shape = np.asarray(input_shape, np.float64)
    cls_ids = sorted(bbox_props.keys(), key=lambda k: int(k))
    num_organs = len(cls_ids)

    bias = np.zeros((num_organs, *input_shape), np.float32)
    if restrict:
        bias[:] = MASKED_BIAS
        for i, cls in enumerate(cls_ids):
            area = np.asarray(bbox_props[cls]["attn_area"], np.float64)
            vox = area * np.concatenate([shape, shape])
            vox = np.clip(vox, 0, np.concatenate([shape, shape]))
            lo = np.floor(vox[:3]).astype(int)
            hi = np.ceil(vox[3:]).astype(int)
            bias[i, lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 0.0
    return bias.reshape(num_organs, -1)


class FocusedAttn(nn.Module):
    """Multi-head cross-attention with a static per-organ additive bias
    (reference FocusedAttn, focused_decoder.py:192-262)."""
    num_heads: int
    num_organs: int
    proj_drop: float = 0.1
    share_qk_proj: bool = True  # reference quirk, focused_decoder.py:235
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v, bias, deterministic=True,
                 return_weights=False):
        """q: [B, Q, C]; k, v: [B, S, C]; bias: [organs, S]."""
        d_model = q.shape[-1]
        head_dim = d_model // self.num_heads
        scale = head_dim ** -0.5

        def proj(x, name):
            return nn.DenseGeneral(
                (self.num_heads, head_dim), use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=xavier_uniform,
                name=name)(x)

        k_layer = nn.DenseGeneral(
            (self.num_heads, head_dim), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=xavier_uniform,
            name="k_proj")
        kh = k_layer(k)
        vh = proj(v, "v_proj")
        qh = k_layer(q) if self.share_qk_proj else proj(q, "q_proj")
        qh = qh * scale

        B, Q = q.shape[0], q.shape[1]
        qpo = Q // self.num_organs
        S = k.shape[1]

        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
        logits = logits.reshape(B, self.num_heads, self.num_organs, qpo, S)
        logits = logits.astype(jnp.float32) + bias[None, None, :, None, :]
        attn = nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = attn.reshape(B, self.num_heads, Q, S)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(B, Q, d_model)
        out = nn.Dense(d_model, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=xavier_uniform, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_weights:
            return out, attn
        return out, None


class FocusedDecoderLayer(nn.Module):
    """Self-attn -> masked cross-attn -> FFN with post-norm residuals
    (reference FocusedDecoderLayer.forward, focused_decoder.py:171-189)."""
    num_heads: int
    num_organs: int
    dim_feedforward: int
    dropout: float = 0.1
    share_qk_proj: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tgt, query_pos, src, src_pos, bias,
                 deterministic=True, return_weights=False):
        # Query self-attention (pos added to q and k, not v).
        q = tgt + query_pos
        sa = MultiHeadSelfAttention(
            self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attn")(q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm_sa")(tgt)

        # Focused cross-attention against the flattened feature level.
        ca, weights = FocusedAttn(
            self.num_heads, self.num_organs, proj_drop=0.1,
            share_qk_proj=self.share_qk_proj, dtype=self.dtype,
            name="cross_attn")(
                tgt + query_pos, src + src_pos, src, bias,
                deterministic=deterministic, return_weights=return_weights)
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm_ca")(tgt)

        tgt = FFN(self.dim_feedforward, dropout=self.dropout,
                  dtype=self.dtype, name="ffn")(tgt,
                                                deterministic=deterministic)
        return tgt, weights


class FocusedDecoder(nn.Module):
    """Stack of FocusedDecoderLayers returning all intermediate outputs
    (reference FocusedDecoder / FocusedDecoderModel,
    focused_decoder.py:12-80)."""
    config: Dict[str, Any]
    attn_bias: Any  # np.ndarray [organs, S], static
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, src, query_embed, pos, deterministic=True,
                 return_weights=False):
        """src/pos: [B, S0, S1, S2, C]; query_embed: [Q, 2C].

        Returns (hs [L, B, Q, C], last-layer cross-attn weights or None).
        """
        cfg = self.config
        B = src.shape[0]
        C = src.shape[-1]

        src = src.reshape(B, -1, C)
        pos = pos.reshape(B, -1, C)

        # Split the packed embedding into (query_pos, tgt)
        # (reference focused_decoder.py:52-54).
        query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None], (B, *query_pos.shape))
        tgt = jnp.broadcast_to(tgt[None], (B, *tgt.shape)).astype(self.dtype)
        query_pos = query_pos.astype(self.dtype)

        bias = jnp.asarray(self.attn_bias)

        # Remat decoder layers: each layer's f32 attention logits over the
        # full token axis (e.g. 405 x 16384) would otherwise be saved for
        # the backward pass.
        layer_cls = (nn.remat(FocusedDecoderLayer, static_argnums=(6, 7))
                     if cfg.get("remat", True) else FocusedDecoderLayer)

        intermediate = []
        weights = None
        for i in range(cfg["dec_layers"]):
            tgt, w = layer_cls(
                num_heads=cfg["nheads"],
                num_organs=cfg["num_organs"],
                dim_feedforward=cfg["dim_feedforward"],
                dropout=cfg["dropout"],
                share_qk_proj=cfg.get("share_qk_proj", True),
                dtype=self.dtype,
                name=f"layer{i}")(
                    tgt, query_pos, src, pos, bias, deterministic,
                    return_weights and i == cfg["dec_layers"] - 1)
            if w is not None:
                weights = w
            intermediate.append(tgt)

        return jnp.stack(intermediate), weights

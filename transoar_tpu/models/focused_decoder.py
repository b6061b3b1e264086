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
import jax
import jax.numpy as jnp
import numpy as np

from transoar_tpu.models.layers import (FFN, MultiHeadSelfAttention,
                                        xavier_uniform)

MASKED_BIAS = -1e9  # additive bias for voxels outside the organ's attn area


def level_spatial_shape(patch_size, level):
    """P-level spatial shape = patch_size // 2**level (reference tables,
    focused_decoder.py:99-117)."""
    return tuple(int(s) // (2 ** level) for s in patch_size)


def roi_token_indices(attn_bias, pad_multiple=128):
    """Static per-organ token gather indices from the attention bias.

    The focused cross-attention only ever reads tokens inside each organ's
    attn_area; instead of masking a dense [Q, S] attention, gather each
    organ's tokens once and run dense attention over the (much smaller)
    crop. For AMOS-sized problems this cuts the dominant attention FLOPs by
    ~10x (typical area density is a few percent of the volume).

    Returns (idx [organs, T] int32, valid [organs, T] bool) with T = max
    organ token count rounded up to ``pad_multiple`` (lane alignment);
    padding slots point at token 0 and are masked.
    """
    organs = attn_bias.shape[0]
    token_lists = [np.nonzero(attn_bias[o] == 0)[0] for o in range(organs)]
    t_max = max((len(t) for t in token_lists), default=1)
    t_max = max(int(-(-t_max // pad_multiple)) * pad_multiple, pad_multiple)

    idx = np.zeros((organs, t_max), np.int32)
    valid = np.zeros((organs, t_max), bool)
    for o, tokens in enumerate(token_lists):
        idx[o, :len(tokens)] = tokens
        valid[o, :len(tokens)] = True
    return idx, valid


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
    (reference FocusedAttn, focused_decoder.py:192-262).

    Two numerically equivalent execution paths:
    - dense: [B, H, Q, S] logits + additive bias (the reference's design);
    - RoI gather (default when ``roi`` is provided): gather each organ's
      attn-area tokens once ([organs, T] static indices) and run dense
      attention over the crop — same softmax result because masked tokens
      contribute -inf either way, at a fraction of the FLOPs/HBM.
    """
    num_heads: int
    num_organs: int
    proj_drop: float = 0.1
    share_qk_proj: bool = True  # reference quirk, focused_decoder.py:235
    dtype: jnp.dtype = jnp.bfloat16
    # express the RoI crop gather as a one-hot matmul: the backward becomes
    # a transposed matmul on the MXU instead of a scatter-add (the gather's
    # bwd measured ~10 ms/step at batch 2). The one-hot is built in-graph
    # from the small static index table (NOT passed as an 80 MB literal —
    # the axon remote-compile service caps request size).
    roi_matmul: bool = False

    @nn.compact
    def __call__(self, q, k, v, bias, roi=None, deterministic=True,
                 return_weights=False):
        """q: [B, Q, C]; k, v: [B, S, C]; bias: [organs, S];
        roi: optional (idx [organs, T] int32, valid [organs, T] bool)."""
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
        O = self.num_organs
        qpo = Q // O
        S = k.shape[1]

        if roi is not None:
            idx, valid = roi
            idx = jnp.asarray(idx)
            valid = jnp.asarray(valid)
            T = idx.shape[1]

            flat = idx.reshape(-1)  # [O*T]
            if self.roi_matmul:
                # padded slots point at token 0, exactly like the take path;
                # their logits are masked by pad_bias downstream
                onehot = jax.nn.one_hot(flat, S, dtype=self.dtype)
                k_r = jnp.einsum("ps,bshd->bphd", onehot, kh).reshape(
                    B, O, T, self.num_heads, head_dim)
                v_r = jnp.einsum("ps,bshd->bphd", onehot, vh).reshape(
                    B, O, T, self.num_heads, head_dim)
            else:
                k_r = jnp.take(kh, flat, axis=1).reshape(
                    B, O, T, self.num_heads, head_dim)
                v_r = jnp.take(vh, flat, axis=1).reshape(
                    B, O, T, self.num_heads, head_dim)
            q_r = qh.reshape(B, O, qpo, self.num_heads, head_dim)

            logits = jnp.einsum("boqhd,bothd->bhoqt", q_r, k_r)
            pad_bias = jnp.where(valid, 0.0, MASKED_BIAS)  # [O, T]
            logits = logits.astype(jnp.float32) + \
                pad_bias[None, None, :, None, :]
            attn = nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhoqt,bothd->boqhd", attn, v_r)
            out = out.reshape(B, Q, d_model)

            full_weights = None
            if return_weights:
                # scatter crop weights back onto the full token axis
                full_weights = jnp.zeros((B, self.num_heads, O, qpo, S),
                                         jnp.float32)
                o_idx = jnp.arange(O)[:, None, None]
                q_idx = jnp.arange(qpo)[None, :, None]
                t_idx = idx[:, None, :]  # [O, 1, T]
                full_weights = full_weights.at[
                    :, :, o_idx, q_idx, t_idx].set(
                        attn.astype(jnp.float32).transpose(0, 1, 2, 3, 4))
                full_weights = full_weights.reshape(
                    B, self.num_heads, Q, S)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
            logits = logits.reshape(B, self.num_heads, O, qpo, S)
            logits = logits.astype(jnp.float32) + bias[None, None, :, None, :]
            attn = nn.softmax(logits, axis=-1).astype(self.dtype)
            attn = attn.reshape(B, self.num_heads, Q, S)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
            out = out.reshape(B, Q, d_model)
            full_weights = attn if return_weights else None

        out = nn.Dense(d_model, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=xavier_uniform, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, full_weights


class FocusedDecoderLayer(nn.Module):
    """Self-attn -> masked cross-attn -> FFN with post-norm residuals
    (reference FocusedDecoderLayer.forward, focused_decoder.py:171-189)."""
    num_heads: int
    num_organs: int
    dim_feedforward: int
    dropout: float = 0.1
    share_qk_proj: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    roi_matmul: bool = False

    @nn.compact
    def __call__(self, tgt, query_pos, src, src_pos, bias, roi=None,
                 deterministic=True, return_weights=False):
        # Query self-attention (pos added to q and k, not v).
        q = tgt + query_pos
        sa = MultiHeadSelfAttention(
            self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attn")(q, q, tgt, deterministic=deterministic,
                              return_weights=return_weights)
        self_weights = None
        if return_weights:
            sa, self_weights = sa
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_sa")(tgt)

        # Focused cross-attention against the flattened feature level.
        ca, weights = FocusedAttn(
            self.num_heads, self.num_organs, proj_drop=0.1,
            share_qk_proj=self.share_qk_proj, dtype=self.dtype,
            roi_matmul=self.roi_matmul,
            name="cross_attn")(
                tgt + query_pos, src + src_pos, src, bias, roi=roi,
                deterministic=deterministic, return_weights=return_weights)
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_ca")(tgt)

        tgt = FFN(self.dim_feedforward, dropout=self.dropout,
                  dtype=self.dtype, name="ffn")(tgt,
                                                deterministic=deterministic)
        return tgt, weights, self_weights


class FocusedDecoder(nn.Module):
    """Stack of FocusedDecoderLayers returning all intermediate outputs
    (reference FocusedDecoder / FocusedDecoderModel,
    focused_decoder.py:12-80)."""
    config: Dict[str, Any]
    attn_bias: Any  # np.ndarray [organs, S], static
    roi: Any = None  # optional (idx [organs, T], valid [organs, T])
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
        roi = None
        if self.roi is not None and cfg.get("roi_attention", True):
            roi = (jnp.asarray(self.roi[0]), jnp.asarray(self.roi[1]))

        # With RoI attention the per-layer activations are small (crop-sized
        # logits), so decoder remat defaults off; the dense path keeps it.
        default_remat = roi is None
        layer_cls = (nn.remat(FocusedDecoderLayer, static_argnums=(7, 8))
                     if cfg.get("remat", default_remat)
                     else FocusedDecoderLayer)

        intermediate = []
        weights = None
        for i in range(cfg["dec_layers"]):
            tgt, w, sw = layer_cls(
                num_heads=cfg["nheads"],
                num_organs=cfg["num_organs"],
                dim_feedforward=cfg["dim_feedforward"],
                dropout=cfg["dropout"],
                share_qk_proj=cfg.get("share_qk_proj", True),
                dtype=self.dtype,
                roi_matmul=cfg.get("roi_matmul", False),
                name=f"layer{i}")(
                    tgt, query_pos, src, pos, bias, roi, deterministic,
                    return_weights and i == cfg["dec_layers"] - 1)
            if w is not None:
                # last layer's cross + self attn, like the reference's hooks
                # on decoder.layers[-1] (reference scripts/test.py:74-84)
                weights = {"cross": w, "self": sw}
            intermediate.append(tgt)

        return jnp.stack(intermediate), weights

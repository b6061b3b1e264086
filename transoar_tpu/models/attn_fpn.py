"""AttnFPN backbone: multi-stage 3D CNN (or Swin) encoder + FPN decoder.

TPU-native re-design of reference ``transoar/models/backbones/attn_fpn.py``:
- Encoder (attn_fpn.py:148-213): ``num_stages`` stages, channels
  ``start_channels * 2**stage``; stage 0 keeps full resolution, later stages
  stride 2. Stages >= 2 optionally become 3D Swin blocks
  (``use_encoder_attn``, attn_fpn.py:172-192).
- Decoder (attn_fpn.py:34-145): 1x1 lateral convs, transposed-conv top-down
  path, 3x3 output convs; builds only the stages actually required by
  ``out_fmaps`` / ``feature_levels`` / the seg-proxy head (attn_fpn.py:47-53).
  Optional deformable-attention refinement of the P-levels
  (``use_decoder_attn``, attn_fpn.py:85-103,129-136).

Layout is channels-last ``[B, S0, S1, S2, C]`` throughout (the TPU conv
emitter's native layout); compute in bf16, params f32.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from transoar_tpu.models.layers import EncoderCnnBlock
from transoar_tpu.ops.conv3d import FastConv3D, FastConvTranspose3D


def required_stages(config) -> list[int]:
    """Stages whose P-level must be produced (reference attn_fpn.py:47-53)."""
    fmaps = list(config["out_fmaps"])
    if config.get("use_decoder_attn"):
        fmaps = fmaps + list(config["def_attn"]["feature_levels"])
    stages = {int(f[-1]) for f in fmaps}
    if config.get("use_seg_proxy_loss"):
        stages.add(0)
    return sorted(stages)


class Encoder(nn.Module):
    """Multi-stage downsampling encoder producing C0..C{num_stages-1}."""
    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        num_stages = cfg["num_stages"]
        use_swin = cfg.get("use_encoder_attn", False)
        # Rematerialize encoder stages in the backward pass: the early
        # full-resolution stages dominate activation memory (a 256^3 volume
        # at 24 channels is ~0.8 GB bf16 per tensor); trading their
        # recompute FLOPs for HBM is the standard TPU move.
        remat = cfg.get("remat", True)
        cnn_block = nn.remat(EncoderCnnBlock) if remat else EncoderCnnBlock

        # Paired-depth chain (PERFORMANCE.md §Next targets): stride-1 convs
        # emit [B, 2, D/2, ...] even/odd blocks so the next stage's parity
        # conv reads its halves contiguously instead of strided-slicing the
        # full-resolution tensor. Only stages whose C-output is NOT consumed
        # by the decoder participate (required stages stay normal-layout).
        # MEASURED OFF by default: end-to-end the paired layout makes XLA
        # pick worse conv2d layouts than it saves in pair-split copies
        # (batch 1: 15.7 -> 14.7 vol/s, batch 2: 12.1 -> 8.7 — isolated
        # wins do not transfer, PERFORMANCE.md). Kept config-gated with a
        # full numeric-equivalence test for future layout experiments.
        chain = bool(cfg.get("pair_chain", False)) and not use_swin
        req = set(required_stages(cfg)) if chain else set()
        k3 = cfg.get("kernel_size", 3) == 3
        paired = False  # layout of x entering the current stage

        outputs = {}
        features = cfg["start_channels"]
        for stage in range(num_stages):
            stride = tuple(cfg["strides"][stage])
            if use_swin and stage > 1:
                # Initial patch embedding is done with convs; later stages are
                # 3D Swin blocks (reference attn_fpn.py:172-185). Swin stages
                # keep the incoming channel count and downsample 2x at the end
                # via patch merging, which doubles channels.
                from transoar_tpu.models.swin import EncoderSwinBlock

                swin_cfg = cfg["swin"]
                # stochastic-depth schedule: rates increase linearly with
                # block index across ALL swin blocks; each stage takes its
                # slice (reference attn_fpn.py:162,183).
                depths = swin_cfg["depths"]
                dpr = np.linspace(
                    0.0, float(swin_cfg.get("drop_path_rate", 0.0)),
                    sum(depths)).tolist()
                lo = sum(depths[:stage - 2])
                x = EncoderSwinBlock(
                    depth=depths[stage - 2],
                    num_heads=swin_cfg["num_heads"][stage - 2],
                    window_size=tuple(swin_cfg["window_size"]),
                    mlp_ratio=swin_cfg["mlp_ratio"],
                    qkv_bias=swin_cfg["qkv_bias"],
                    conv_merging=swin_cfg.get("conv_merging", False),
                    blocked_attn=swin_cfg.get("blocked_attn", True),
                    drop_path=tuple(dpr[lo:lo + depths[stage - 2]]),
                    dtype=self.dtype,
                    name=f"stage{stage}",
                )(x, deterministic=deterministic)
            else:
                pair_out = False
                if chain and k3 and stage not in req \
                        and stage + 1 < num_stages \
                        and not (use_swin and stage + 1 > 1) \
                        and tuple(cfg["strides"][stage + 1])[0] == 2:
                    if stride == (1, 1, 1) and not paired:
                        pair_out = x.shape[1] % 2 == 0
                    elif stride[0] == 2 and stride != (1, 1, 1):
                        d_in = 2 * x.shape[2] if paired else x.shape[1]
                        pair_out = (d_in % 2 == 0
                                    and (d_in // 2) % 2 == 0)
                pair_in = paired and stride[0] == 2 and stride != (1, 1, 1)
                assert pair_in == paired, (stage, stride)  # chain invariant
                # depth-packed lanes for the full-resolution stride-1 stage:
                # C=start_channels starves the MXU lanes in every matmul
                # orientation (fwd/dx/dw); packing depth quads into channels
                # recovers ~4x lane width (ops/conv3d.pack_depth). Batch-
                # gated: at batch 1 the stack variant already wins (15.7
                # vol/s vs 12.7 packed); at batch >= 2 packing beats the
                # split path 13.2 vs 12.1 (PERFORMANCE.md §Batch-2 op
                # attribution). Inside lax.map microbatching the per-sample
                # batch is 1, so the gate keeps that path on stack too.
                packed = (int(cfg.get("stage0_pack", 0))
                          if stride == (1, 1, 1) and not pair_out
                          and (x.shape[0] >= 2
                               or cfg.get("stage0_pack_batch1", False))
                          else 0)
                packed2 = (int(cfg.get("stage1plus_pack", 0))
                           if stride != (1, 1, 1)
                           and not (pair_in or pair_out)
                           and x.shape[0] >= 2 else 0)
                x = cnn_block(
                    features=features, kernel_size=cfg.get("kernel_size", 3),
                    strides=stride, dtype=self.dtype, pair_in=pair_in,
                    pair_out=pair_out, packed_chain=packed,
                    packed_second=packed2,
                    name=f"stage{stage}")(x)
                paired = pair_out
            from transoar_tpu.ops.conv3d import unpair

            # C-outputs stay in the normal layout for any consumer; when
            # the stage is not a required decoder input, the unpair is dead
            # code XLA removes (the next stage reads the paired tensor).
            outputs[f"C{stage}"] = unpair(x) if paired else x
            features *= 2
        return outputs


class Decoder(nn.Module):
    """FPN decoder: laterals + top-down transposed-conv path + out convs."""
    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, enc_out, deterministic=True):
        cfg = self.config
        num_stages = cfg["num_stages"]
        fpn_channels = cfg["fpn_channels"]
        seg_proxy = cfg.get("use_seg_proxy_loss", False)
        stages_needed = required_stages(cfg)
        earliest = 0 if seg_proxy else min(stages_needed)

        enc_channels = [cfg["start_channels"] * 2 ** s for s in range(num_stages)]
        lateral_stages = list(range(earliest, num_stages))
        lateral_out_ch = [min(enc_channels[s], fpn_channels) for s in lateral_stages]

        # Lateral 1x1 convs (reference attn_fpn.py:60-63).
        laterals = {}
        for s, out_ch in zip(lateral_stages, lateral_out_ch):
            laterals[s] = FastConv3D(
                out_ch, kernel_size=(1, 1, 1), dtype=self.dtype,
                name=f"lateral{s}")(enc_out[f"C{s}"])

        # Top-down path: upsample via transposed conv with the stride of the
        # stage transition (reference attn_fpn.py:76-83,109-118).
        top_down = {}
        up = None
        for s in reversed(lateral_stages):
            x = laterals[s] if up is None else laterals[s] + up
            top_down[s] = x
            if s > earliest:
                stride = tuple(cfg["strides"][s])
                up = FastConvTranspose3D(
                    lateral_out_ch[s - earliest - 1], stride=stride,
                    dtype=self.dtype, name=f"up{s}")(x)

        # Out 3x3 convs only for required stages (reference attn_fpn.py:66-73).
        outputs = {}
        for s in stages_needed:
            out_ch = (cfg["start_channels"] if (seg_proxy and s == 0)
                      else fpn_channels)
            outputs[f"P{s}"] = FastConv3D(
                out_ch, kernel_size=(3, 3, 3),
                dtype=self.dtype, name=f"out{s}")(top_down[s])

        # Optional deformable-attention refinement of the feature levels
        # (reference attn_fpn.py:85-103,129-136).
        if cfg.get("use_decoder_attn"):
            from transoar_tpu.models.def_attn import DecoderDefAttnBlock

            da = cfg["def_attn"]
            levels = list(da["feature_levels"])
            refined = DecoderDefAttnBlock(
                hidden_dim=da["hidden_dim"],
                nheads=da["nheads"],
                num_layers=da["layers"],
                dim_feedforward=da["dim_feedforward"],
                dropout=da["dropout"],
                n_points=da["n_points"],
                pos_encoding=da.get("pos_encoding", "sine"),
                dtype=self.dtype,
                name="refine",
            )([outputs[l] for l in levels], deterministic=deterministic)
            for level, fmap in zip(levels, refined):
                outputs[level] = fmap

        return outputs


class AttnFPN(nn.Module):
    """Backbone = Encoder + FPN Decoder (reference attn_fpn.py:18-29)."""
    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        enc_out = Encoder(self.config, dtype=self.dtype,
                          name="encoder")(x, deterministic=deterministic)
        return Decoder(self.config, dtype=self.dtype,
                       name="decoder")(enc_out, deterministic=deterministic)

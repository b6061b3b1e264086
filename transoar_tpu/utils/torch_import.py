"""Import reference (torch) TransoarNet weights onto the flax model.

Migration path for users of the reference framework: a checkpoint trained
with bwittmann/transoar (``torch.save({'model_state_dict': ...})``,
reference trainer.py:235-241) maps losslessly onto
:class:`transoar_tpu.models.transoarnet.TransoarNet` — every transform here
is a transpose/reshape/split, no re-training needed.

Covers the flagship model family (reference transoarnet.py):
- CNN encoder stages (Conv3d + InstanceNorm3d, encoder_blocks.py:14-54)
  and Swin encoder stages (encoder_blocks.py:56-121),
- AttnFPN decoder (lateral/up/out convs, attn_fpn.py) and the optional
  deformable refinement (decoder_blocks.py:12-97),
- FocusedDecoder neck incl. the packed self-attn in_proj split and the
  shared-QK cross-attention quirk (the reference projects queries with
  ``k_proj``; ``q_proj`` is dead weight and is dropped),
- cls/reg/seg heads and the query embedding.

End-to-end correctness of this mapping is pinned by
tests/test_model_parity.py (forward outputs to 2e-4, gradients, one
optimizer step) which imports these functions. The CLI wrapper is
``scripts/import_torch_checkpoint.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv_kernel(w):
    """torch Conv3d [F, C, k, k, k] -> flax [k, k, k, C, F]."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def convT_kernel(w):
    """torch ConvTranspose3d [Cin, Cout, k, k, k] -> flax
    [k, k, k, Cin, Cout]."""
    return np.transpose(w, (2, 3, 4, 0, 1))


def linear_kernel(w):
    """torch Linear [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _map_swin_stage(sd, st, p):
    """Map a reference EncoderSwinBlock (encoder_blocks.py:56-121) onto our
    stage subtree: SwinBlocks (window attention + rel-pos bias + MLP) and
    the PatchMerging downsample."""
    _lin = linear_kernel
    j = 0
    while f"{p}.blocks.{j}.norm1.weight" in sd:
        blk = st[f"block{j}"]
        q = f"{p}.blocks.{j}."
        blk["norm1"]["scale"] = sd[q + "norm1.weight"]
        blk["norm1"]["bias"] = sd[q + "norm1.bias"]
        blk["attn"]["rel_pos_bias"] = sd[q +
                                         "attn.relative_position_bias_table"]
        blk["attn"]["qkv"]["kernel"] = _lin(sd[q + "attn.qkv.weight"])
        if q + "attn.qkv.bias" in sd:
            blk["attn"]["qkv"]["bias"] = sd[q + "attn.qkv.bias"]
        blk["attn"]["proj"]["kernel"] = _lin(sd[q + "attn.proj.weight"])
        blk["attn"]["proj"]["bias"] = sd[q + "attn.proj.bias"]
        blk["norm2"]["scale"] = sd[q + "norm2.weight"]
        blk["norm2"]["bias"] = sd[q + "norm2.bias"]
        blk["mlp1"]["kernel"] = _lin(sd[q + "mlp.fc1.weight"])
        blk["mlp1"]["bias"] = sd[q + "mlp.fc1.bias"]
        blk["mlp2"]["kernel"] = _lin(sd[q + "mlp.fc2.weight"])
        blk["mlp2"]["bias"] = sd[q + "mlp.fc2.bias"]
        j += 1
    st["merge"]["LayerNorm_0"]["scale"] = sd[f"{p}.downsample.norm.weight"]
    st["merge"]["LayerNorm_0"]["bias"] = sd[f"{p}.downsample.norm.bias"]
    st["merge"]["Dense_0"]["kernel"] = _lin(
        sd[f"{p}.downsample.reduction.weight"])


def _map_refine(sd, dec, prefix="_backbone._decoder._refine"):
    """Map the reference DecoderDefAttnBlock (decoder_blocks.py:12-97) onto
    our backbone/decoder/refine subtree."""
    _lin = linear_kernel
    ours = dec["refine"]
    ours["level_embed"] = sd[f"{prefix}.level_embed"]
    i = 0
    while f"{prefix}.refine_def_attn.layers.{i}.norm1.weight" in sd:
        lay = ours[f"layer{i}"]
        q = f"{prefix}.refine_def_attn.layers.{i}."
        sa = lay["self_attn"]
        for name in ("value_proj", "sampling_offsets", "attention_weights",
                     "output_proj"):
            sa[name]["kernel"] = _lin(sd[q + f"self_attn.{name}.weight"])
            sa[name]["bias"] = sd[q + f"self_attn.{name}.bias"]
        lay["LayerNorm_0"]["scale"] = sd[q + "norm1.weight"]
        lay["LayerNorm_0"]["bias"] = sd[q + "norm1.bias"]
        lay["FFN_0"]["Dense_0"]["kernel"] = _lin(sd[q + "linear1.weight"])
        lay["FFN_0"]["Dense_0"]["bias"] = sd[q + "linear1.bias"]
        lay["FFN_0"]["Dense_1"]["kernel"] = _lin(sd[q + "linear2.weight"])
        lay["FFN_0"]["Dense_1"]["bias"] = sd[q + "linear2.bias"]
        lay["FFN_0"]["LayerNorm_0"]["scale"] = sd[q + "norm2.weight"]
        lay["FFN_0"]["LayerNorm_0"]["bias"] = sd[q + "norm2.bias"]
        i += 1


def map_reference_state_dict(sd, params, cfg):
    """Copy a reference torch name->array dict onto our param tree.

    ``sd``: ``{torch_param_name: np.ndarray}`` — a ``model_state_dict``
    with tensors converted via ``.detach().numpy()``. Passing per-parameter
    GRADIENTS keyed the same way maps them too: every transform here is a
    transpose/reshape, which commutes with differentiation.

    ``params``: the flax param tree from ``model.init`` (shapes must match
    the config). ``cfg``: our config dict. Returns a new jnp param tree.
    """
    _conv, _convT, _lin = conv_kernel, convT_kernel, linear_kernel
    C = cfg["neck"]["hidden_dim"]
    H = cfg["neck"]["nheads"]
    hd = C // H
    new = jax.tree.map(np.asarray, params)

    for i in range(cfg["backbone"]["num_stages"]):
        st = new["backbone"]["encoder"][f"stage{i}"]
        if f"_backbone._encoder._stages.{i}.blocks.0.norm1.weight" in sd:
            _map_swin_stage(sd, st, f"_backbone._encoder._stages.{i}")
            continue
        p = f"_backbone._encoder._stages.{i}._block"
        st["ConvInReLU_0"]["FastConv3D_0"]["kernel"] = _conv(
            sd[f"{p}.0.weight"])
        st["ConvInReLU_0"]["InstanceNorm_0"]["scale"] = sd[f"{p}.1.weight"]
        st["ConvInReLU_0"]["InstanceNorm_0"]["bias"] = sd[f"{p}.1.bias"]
        st["ConvInReLU_1"]["FastConv3D_0"]["kernel"] = _conv(
            sd[f"{p}.3.weight"])
        st["ConvInReLU_1"]["InstanceNorm_0"]["scale"] = sd[f"{p}.4.weight"]
        st["ConvInReLU_1"]["InstanceNorm_0"]["bias"] = sd[f"{p}.4.bias"]

    dec = new["backbone"]["decoder"]
    lateral_stages = sorted(int(k[len("lateral"):]) for k in dec
                            if k.startswith("lateral"))
    for j, s in enumerate(lateral_stages):
        dec[f"lateral{s}"]["kernel"] = _conv(
            sd[f"_backbone._decoder._lateral.{j}.weight"])
        dec[f"lateral{s}"]["bias"] = sd[f"_backbone._decoder._lateral.{j}.bias"]
    # torch _up is built in reversed (top-down) stage order
    up_stages = sorted((int(k[len("up"):]) for k in dec
                        if k.startswith("up")), reverse=True)
    for k_i, s in enumerate(up_stages):
        dec[f"up{s}"]["kernel"] = _convT(
            sd[f"_backbone._decoder._up.{k_i}.weight"])
        dec[f"up{s}"]["bias"] = sd[f"_backbone._decoder._up.{k_i}.bias"]
    out_stages = sorted(int(k[len("out"):]) for k in dec
                        if k.startswith("out"))
    if "refine" in dec:
        _map_refine(sd, dec)
    for m, s in enumerate(out_stages):
        dec[f"out{s}"]["kernel"] = _conv(
            sd[f"_backbone._decoder._out.{m}.weight"])
        dec[f"out{s}"]["bias"] = sd[f"_backbone._decoder._out.{m}.bias"]

    for i in range(cfg["neck"]["dec_layers"]):
        lay = new["neck"][f"layer{i}"]
        p = f"_neck.decoder.layers.{i}."
        inw = sd[p + "self_attn.in_proj_weight"]  # packed q;k;v
        inb = sd[p + "self_attn.in_proj_bias"]
        for name, W, b in (("q_proj", inw[:C], inb[:C]),
                           ("k_proj", inw[C:2 * C], inb[C:2 * C]),
                           ("v_proj", inw[2 * C:], inb[2 * C:])):
            lay["self_attn"][name]["kernel"] = _lin(W).reshape(C, H, hd)
            lay["self_attn"][name]["bias"] = b.reshape(H, hd)
        lay["self_attn"]["out_proj"]["kernel"] = _lin(
            sd[p + "self_attn.out_proj.weight"])
        lay["self_attn"]["out_proj"]["bias"] = sd[p + "self_attn.out_proj.bias"]
        lay["norm_sa"]["scale"] = sd[p + "norm2.weight"]
        lay["norm_sa"]["bias"] = sd[p + "norm2.bias"]
        # reference quirk: q is projected with k_proj; q_proj is dead
        lay["cross_attn"]["k_proj"]["kernel"] = _lin(
            sd[p + "cross_attn.k_proj.weight"]).reshape(C, H, hd)
        lay["cross_attn"]["v_proj"]["kernel"] = _lin(
            sd[p + "cross_attn.v_proj.weight"]).reshape(C, H, hd)
        lay["cross_attn"]["proj"]["kernel"] = _lin(
            sd[p + "cross_attn.proj.weight"])
        lay["cross_attn"]["proj"]["bias"] = sd[p + "cross_attn.proj.bias"]
        lay["norm_ca"]["scale"] = sd[p + "norm1.weight"]
        lay["norm_ca"]["bias"] = sd[p + "norm1.bias"]
        lay["ffn"]["Dense_0"]["kernel"] = _lin(sd[p + "linear1.weight"])
        lay["ffn"]["Dense_0"]["bias"] = sd[p + "linear1.bias"]
        lay["ffn"]["Dense_1"]["kernel"] = _lin(sd[p + "linear2.weight"])
        lay["ffn"]["Dense_1"]["bias"] = sd[p + "linear2.bias"]
        lay["ffn"]["LayerNorm_0"]["scale"] = sd[p + "norm3.weight"]
        lay["ffn"]["LayerNorm_0"]["bias"] = sd[p + "norm3.bias"]

    new["cls_head"]["kernel"] = _lin(sd["_cls_head.weight"])
    new["cls_head"]["bias"] = sd["_cls_head.bias"]
    for i in range(3):
        new["reg_head"][f"Dense_{i}"]["kernel"] = _lin(
            sd[f"_reg_head.layers.{i}.weight"])
        new["reg_head"][f"Dense_{i}"]["bias"] = sd[f"_reg_head.layers.{i}.bias"]
    new["query_embed"] = sd["_query_embed.weight"]
    if "_pos_enc.row_embed.weight" in sd:
        # learned positional encoding (reference position_encoding.py:54-86);
        # embed_0=row, embed_1=col, embed_2=depth (see our module docstring)
        pe = new.get("PositionEmbeddingLearned3D_0")
        if pe is not None:
            pe["embed_0"] = sd["_pos_enc.row_embed.weight"]
            pe["embed_1"] = sd["_pos_enc.col_embed.weight"]
            pe["embed_2"] = sd["_pos_enc.depth_embed.weight"]
    if "_seg_head.weight" in sd:
        new["seg_head"]["kernel"] = _conv(sd["_seg_head.weight"])
        new["seg_head"]["bias"] = sd["_seg_head.bias"]
    return jax.tree.map(jnp.asarray, new)

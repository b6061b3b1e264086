"""Shared NN building blocks (flax.linen), channels-last / bf16-first.

TPU-native counterparts of the reference's basic blocks:
- ``ConvInReLU`` / ``EncoderCnnBlock``: reference
  transoar/models/backbones/encoder_blocks.py:14-54 (Conv3d + InstanceNorm3d
  + ReLU, twice). We use NDHWC layout — XLA's TPU conv emitter wants
  channels-last so the contraction lands on the MXU without transposes.
- ``MLP``: reference transoar/models/transoarnet.py:157-171.
- ``MultiHeadSelfAttention``: torch ``nn.MultiheadAttention`` equivalent used
  for query self-attention (focused_decoder.py:126).

All modules take ``dtype`` (compute precision, default bfloat16 on TPU) and
keep parameters in float32 — the functional replacement for torch AMP
(reference trainer.py:29,67).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Xavier/Glorot uniform — the reference decoder's explicit init
# (focused_decoder.py:39-42).
xavier_uniform = nn.initializers.xavier_uniform()


class InstanceNorm(nn.Module):
    """InstanceNorm over spatial dims, channels-last ([B, *spatial, C]).

    Equivalent to torch ``nn.InstanceNorm3d(affine=True, eps=1e-5)``
    (encoder_blocks.py:34): per-sample, per-channel normalization over the
    spatial axes.

    Implemented by hand instead of flax GroupNorm: statistics are f32
    reductions (convert fused into the reduce), but the normalization
    arithmetic stays in the compute dtype — flax's norm layers materialize
    an f32 copy of the activation, which at 256^3-scale volumes costs
    gigabytes of HBM per layer.
    """
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # depth-packed lanes ([..., pack*C], see ops/conv3d.pack_depth): the
    # pack blocks are depth slices of the SAME channel, so statistics
    # aggregate across blocks as well as spatial axes — numerically the
    # per-channel InstanceNorm of the unpacked layout.
    packs: int = 1

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1] // self.packs
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x.astype(jnp.float32), axis=axes, keepdims=True)
        mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes,
                         keepdims=True)
        if self.packs > 1:
            shape = mean.shape[:-1] + (self.packs, C)
            mean = jnp.mean(mean.reshape(shape), axis=-2)
            mean2 = jnp.mean(mean2.reshape(shape), axis=-2)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)

        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        # fold (mean, inv, affine) into one multiply-add in compute dtype
        mul = (inv * scale).astype(self.dtype)
        add = (bias - mean * inv * scale).astype(self.dtype)
        if self.packs > 1:
            mul = jnp.concatenate([mul] * self.packs, axis=-1)
            add = jnp.concatenate([add] * self.packs, axis=-1)
        return x.astype(self.dtype) * mul + add


class FastLayerNorm(nn.Module):
    """Last-axis LayerNorm, drop-in for ``nn.LayerNorm(epsilon=1e-5)``:
    identical params ("scale"/"bias", f32) and identical math (fast
    variance, eps inside rsqrt — what flax and torch both compute).

    Implemented by hand for the same reason as ``InstanceNorm``: flax's
    norm layers materialize an f32 copy of the activation; at SwinFPN
    VISCERAL scale (832k tokens x 48ch per block, 4 LNs per block) that is
    ~25 ms/step of pure conversion traffic (round-4 profile,
    flax/linen/normalization.py lines). Here the f32 convert fuses into the
    reductions and the normalization pass reads bf16 / writes bf16; the f32
    intermediates live in registers.
    """
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return (((xf - mean) * inv).astype(self.dtype)
                * scale.astype(self.dtype) + bias.astype(self.dtype))


class ConvInReLU(nn.Module):
    """Conv3D + InstanceNorm + ReLU (one half of EncoderCnnBlock).

    ``pair_mode`` is threaded to ``FastConv3D`` (paired-depth encoder
    chain); InstanceNorm and ReLU are layout-agnostic — the pair axis is
    just another spatial axis for the per-channel statistics.
    """
    features: int
    kernel_size: int = 3
    strides: Sequence[int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    pair_mode: str = "none"
    packed_chain: int = 0

    @nn.compact
    def __call__(self, x):
        from transoar_tpu.ops.conv3d import FastConv3D

        x = FastConv3D(
            self.features, kernel_size=(self.kernel_size,) * 3,
            strides=tuple(self.strides), use_bias=False,
            dtype=self.dtype, pair_mode=self.pair_mode,
            packed_chain=self.packed_chain)(x)
        x = InstanceNorm(dtype=self.dtype,
                         packs=max(self.packed_chain, 1))(x)
        return nn.relu(x)


class EncoderCnnBlock(nn.Module):
    """One backbone stage: strided Conv-IN-ReLU then unit-stride Conv-IN-ReLU
    (reference encoder_blocks.py:28-54).

    ``pair_in`` / ``pair_out`` select the paired-depth chain layout: a
    stage receiving paired input runs the parity conv without any pair
    split; a stage emitting paired output lets the NEXT stage do the same.
    The only strided depth copy left is pairing the second conv's input —
    at the stage's own (already downsampled) resolution.
    """
    features: int
    kernel_size: int = 3
    strides: Sequence[int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    pair_in: bool = False
    pair_out: bool = False
    # depth-pack factor for stride-1 stages: runs BOTH convs (+IN/ReLU) in
    # the depth-packed lane layout (ops/conv3d.pack_depth) so the small
    # channel count stops starving the MXU; one pack + one unpack copy per
    # stage. Requires stride (1,1,1), kernel 3 and D % pack == 0.
    packed_chain: int = 0
    # pack factor for the SECOND (stride-1) conv of a strided stage.
    packed_second: int = 0

    @nn.compact
    def __call__(self, x):
        s = tuple(self.strides)
        if (self.packed_second and s != (1, 1, 1) and self.kernel_size == 3
                and not (self.pair_in or self.pair_out)):
            from transoar_tpu.ops.conv3d import pack_depth, unpack_depth

            pack = self.packed_second
            x = ConvInReLU(self.features, self.kernel_size, self.strides,
                           dtype=self.dtype)(x)
            if x.shape[1] % pack == 0:
                x = pack_depth(x, pack)
                x = ConvInReLU(self.features, self.kernel_size, (1, 1, 1),
                               dtype=self.dtype, packed_chain=pack)(x)
                return unpack_depth(x, pack)
            x = ConvInReLU(self.features, self.kernel_size, (1, 1, 1),
                           dtype=self.dtype)(x)
            return x
        if (self.packed_chain and s == (1, 1, 1) and self.kernel_size == 3
                and x.shape[1] % self.packed_chain == 0):
            from transoar_tpu.ops.conv3d import pack_depth, unpack_depth

            assert not (self.pair_in or self.pair_out)
            pack = self.packed_chain
            x = pack_depth(x, pack)
            x = ConvInReLU(self.features, self.kernel_size, s,
                           dtype=self.dtype, packed_chain=pack)(x)
            x = ConvInReLU(self.features, self.kernel_size, s,
                           dtype=self.dtype, packed_chain=pack)(x)
            return unpack_depth(x, pack)
        if s == (1, 1, 1):  # full-resolution stage 0
            assert not self.pair_in
            a_mode = "out" if self.pair_out else "none"
            b_mode = "both" if self.pair_out else "none"
        else:
            a_mode = "in" if self.pair_in else "none"
            b_mode = "out" if self.pair_out else "none"
        x = ConvInReLU(self.features, self.kernel_size, self.strides,
                       dtype=self.dtype, pair_mode=a_mode)(x)
        x = ConvInReLU(self.features, self.kernel_size, (1, 1, 1),
                       dtype=self.dtype, pair_mode=b_mode)(x)
        return x


class MLP(nn.Module):
    """Simple ReLU MLP head (reference transoarnet.py:157-171)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.bfloat16
    # Zero-init of the final layer for anchor-offset prediction
    # (reference transoarnet.py:53-58).
    zero_init_last: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32)(x))
        kernel_init = (nn.initializers.zeros if self.zero_init_last
                       else nn.initializers.lecun_normal())
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=kernel_init)(x)


class FFN(nn.Module):
    """Transformer feed-forward block with residual + post-LayerNorm
    (reference focused_decoder.py:165-169)."""
    dim_feedforward: int
    dropout: float = 0.1
    activation: Callable = nn.relu
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        d_model = x.shape[-1]
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=xavier_uniform)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=xavier_uniform)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class MultiHeadSelfAttention(nn.Module):
    """Standard MHA for query self-attention (torch nn.MultiheadAttention
    equivalent, reference focused_decoder.py:126,171-176)."""
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v, deterministic=True, return_weights=False):
        """Returns the output, or (output, head-averaged weights [B, Q, K])
        when ``return_weights`` — matching torch MultiheadAttention's
        ``(out, weights)`` convention the reference hooks for attention-map
        export (reference scripts/test.py:81-84)."""
        d_model = q.shape[-1]
        head_dim = d_model // self.num_heads

        def proj(x, name):
            return nn.DenseGeneral(
                (self.num_heads, head_dim), dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=xavier_uniform,
                name=name)(x)

        qh, kh, vh = proj(q, "q_proj"), proj(k, "k_proj"), proj(v, "v_proj")
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
            head_dim).astype(self.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(*out.shape[:-2], d_model)
        out = nn.Dense(d_model, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=xavier_uniform, name="out_proj")(out)
        if return_weights:
            return out, attn.astype(jnp.float32).mean(axis=1)
        return out

"""3D Swin Transformer encoder blocks (SwinFPN variant).

TPU-native re-design of reference
``transoar/models/backbones/encoder_blocks.py:56-400``:
- ``WindowAttention3D`` (encoder_blocks.py:212-285): window-local MHA with a
  3D relative-position-bias table indexed by precomputed relative indices.
- ``SwinBlock`` (encoder_blocks.py:123-210): LN -> (shifted-)window
  attention -> residual, LN -> MLP(GELU) -> residual. Shifts are cyclic
  rolls; the shifted-window cross-window mask is computed once per static
  shape (encoder_blocks.py:387-400) in numpy and baked in as a constant.
- ``PatchMerging`` (encoder_blocks.py:305-334): 2x2x2 neighborhood concat
  (8C) -> LN -> Linear to 2C. ``ConvPatchMerging`` (encoder_blocks.py:
  336-358): strided conv + InstanceNorm + ReLU.

Everything is channels-last and fixed-shape; window partitioning is pure
reshape/transpose, so XLA fuses it into the attention kernels.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transoar_tpu.models.layers import FastLayerNorm, InstanceNorm
from transoar_tpu.ops.conv3d import FastConv3D

# Kernel-choice flags are read ONCE at import so a run cannot silently mix
# paths across modules traced at different times (advisor finding r4):
# - TRANSOAR_FUSED_ATTN: opt-in Pallas fused window attention (measured
#   end-to-end slower on the current toolchain, see WindowAttention3D).
# - TRANSOAR_SWIN_BLOCKED=0/1: override the config's blocked_attn choice.
_FUSED_ATTN = bool(os.environ.get("TRANSOAR_FUSED_ATTN"))
_BLOCKED_ENV = os.environ.get("TRANSOAR_SWIN_BLOCKED")


def effective_window(spatial, window_size, shift_size):
    """Clamp window to the volume size; no shift along collapsed axes
    (reference get_window_size, encoder_blocks.py:371-384)."""
    ws, ss = list(window_size), list(shift_size)
    for i, s in enumerate(spatial):
        if s <= window_size[i]:
            ws[i] = s
            ss[i] = 0
    return tuple(ws), tuple(ss)


def window_partition(x, ws):
    """[B, D, H, W, C] -> [B*nW, ws0*ws1*ws2, C] (encoder_blocks.py:360-364)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2],
                  C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], C)


def window_reverse(windows, ws, B, D, H, W):
    x = windows.reshape(B, D // ws[0], H // ws[1], W // ws[2], ws[0], ws[1],
                        ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def relative_position_index(ws) -> np.ndarray:
    """[N, N] indices into the (2w0-1)(2w1-1)(2w2-1) bias table
    (encoder_blocks.py:234-248)."""
    coords = np.stack(np.meshgrid(np.arange(ws[0]), np.arange(ws[1]),
                                  np.arange(ws[2]), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [3, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


def shifted_window_regions(padded_shape, ws, ss) -> np.ndarray:
    """[nW, N] per-token region labels of the cyclic shift — the COMPACT
    form of the shifted-window mask (two tokens may attend iff their
    labels match; encoder_blocks.py:387-400). Pure numpy and small
    (~3 MB at VISCERAL stage 2 vs 416 MB for the [nW, N, N] mask), so it
    can live as a host constant; consumers expand it where needed (the
    Pallas fused-attention kernel rebuilds the mask in-register)."""
    Dp, Hp, Wp = padded_shape

    def axis_regions(ws_i, ss_i):
        # A zero-shift axis is ONE region spanning everything (the
        # reference's slice(-0, None) covers the full axis and last-write
        # wins, encoder_blocks.py:387-400); slicing [0:-ws] alone would
        # leave the last window unlabeled and under-mask wrapped windows.
        if ss_i == 0:
            return (slice(None),)
        return (slice(-ws_i), slice(-ws_i, -ss_i), slice(-ss_i, None))

    img = np.zeros((1, Dp, Hp, Wp, 1), np.float32)
    cnt = 0
    for d in axis_regions(ws[0], ss[0]):
        for h in axis_regions(ws[1], ss[1]):
            for w in axis_regions(ws[2], ss[2]):
                img[:, d, h, w, :] = cnt
                cnt += 1
    # window_partition is reshape/transpose method calls — works on the
    # numpy array directly, so the labels stay a host constant
    return window_partition(img, ws)[..., 0].astype(np.float32)


def shifted_window_mask(padded_shape, ws, ss):
    """[nW, N, N] additive mask (0 / -100) expanded ON DEVICE from the
    region labels (the XLA attention path needs the dense form).
    Materializing it host-side would inline a multi-MB literal into the
    HLO per shifted block — at VISCERAL size that overflowed the axon
    remote-compile upload limit (HTTP 413, CLAUDE.md traps); expanding a
    traced-then-np round trip instead raised TracerArrayConversionError.
    Hence: numpy labels in, jnp expansion out."""
    r = jnp.asarray(shifted_window_regions(padded_shape, ws, ss))
    return jnp.where(r[:, :, None] != r[:, None, :], -100.0, 0.0
                     ).astype(jnp.float32)


class WindowAttention3D(nn.Module):
    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    def _bias(self, N):
        ws = self.window_size
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1),
             self.num_heads),
            jnp.float32)
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        return table[idx].reshape(N, N, self.num_heads).transpose(2, 0, 1)

    def _blocked(self, x, regions):
        """Window attention with the partition transposes moved ADJACENT to
        the two Dense matmuls.

        x: [B, p, wd, q, wh, r, ww, C] — the free 8-D reshape of the padded
        volume (window grid (p, q, r), in-window (wd, wh, ww)). The flat
        path transposes the volume-sized activation BEFORE the qkv Dense
        and AFTER the proj Dense (``window_partition``/``window_reverse``);
        those standalone copies plus the qkv-grad reshapes XLA inserts
        around the flat head-split cost ~105 ms/step at VISCERAL stage 2
        (round-4 profile). Here the only transposes sit directly on a dot
        output (qkv) / dot input (proj), where XLA's layout assignment can
        absorb them into the matmul instead of emitting a copy — and the
        attention core runs on clean ``[B, p, q, r, N, ...]`` shapes whose
        minor dims tile well.

        A fully transpose-free variant (11-D ``dot_general`` over the
        interleaved window axes) was tried first and is unusable on this
        toolchain: the dot forces the score tensor into a layout with the
        size-5 window axes as lane/sublane dims, padding (8, 128) tiles
        41x (a 1.25 GB logical tensor allocated 51 GB — compile-time OOM).

        Same contractions, same values as the flat path (equality
        test-pinned, tests/test_swin.py)."""
        B, p, wd, q_, wh, r, ww, C = x.shape
        H = self.num_heads
        hd = C // H
        N = wd * wh * ww

        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        # collect windows AFTER the Dense: transpose [.., 3C]-minor output
        # (a dot output — its layout is XLA's to choose) instead of the
        # pre-Dense activation
        qkv = qkv.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B,p,q,r,wd,wh,ww,3C]
        qkv = qkv.reshape(B, p, q_, r, N, 3, H, hd)
        q = qkv[..., 0, :, :] * (hd ** -0.5)
        k = qkv[..., 1, :, :]
        v = qkv[..., 2, :, :]  # [B, p, q, r, N, H, hd]

        attn = jnp.einsum("bpqrnhd,bpqrmhd->bpqrhnm", q, k)
        logits = attn.astype(jnp.float32) + self._bias(N)[
            None, None, None, None]
        if regions is not None:
            reg = jnp.asarray(np.ascontiguousarray(
                regions.reshape(p, q_, r, N)))
            logits = logits + jnp.where(
                reg[..., :, None] != reg[..., None, :], -100.0, 0.0
            )[None, :, :, :, None]
        # bandwidth-lean softmax: the score tensor is the big object here
        # (f32 [nW, H, N, N] is 1.25 GB at VISCERAL stage 2, and the chain
        # around it measured ~87 ms/step); materialize the exp in compute
        # dtype and fold the 1/sum into the (tiny) AV output instead of a
        # full normalized-score pass. Same math as softmax(logits) @ v —
        # logits are bf16-rounded either way (the QK einsum emits bf16).
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        p_exp = jnp.exp(logits - m)
        denom = jnp.sum(p_exp, axis=-1)             # [., p, q, r, H, N] f32
        attn = p_exp.astype(self.dtype)
        out = jnp.einsum("bpqrhnm,bpqrmhd->bpqrnhd", attn, v)
        out = out / jnp.swapaxes(denom, -1, -2)[..., None].astype(
            self.dtype)
        out = out.reshape(B, p, q_, r, wd, wh, ww, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        # un-collect windows right AFTER the proj Dense (same absorption
        # argument, mirrored)
        return out.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # [B,p,wd,q,wh,r,ww,C]

    @nn.compact
    def __call__(self, x, regions=None, deterministic=True):
        """x: [B_, N, C] (flat windows) or 8-D blocked (see ``_blocked``);
        regions: [nW, N] numpy region labels or None."""
        if x.ndim == 8:
            return self._blocked(x, regions)
        B_, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5
        ws = self.window_size

        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        # Keep q/k/v in the Dense output's native [B_, N, H, hd] order and
        # let the dots carry the head axis — the torch-style
        # `.transpose(2, 0, 3, 1, 4)` head split materializes [3,B_,H,N,hd]
        # tensors whose minor dim is hd=16 (12.5% of a 128-lane tile), and
        # its fwd+bwd copies measured ~50 ms/step at VISCERAL stage 2
        # (PERFORMANCE.md §swin). Same contractions, same values.
        qkv = qkv.reshape(B_, N, 3, H, head_dim)
        q = qkv[:, :, 0] * scale
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]  # [B_, N, H, hd]

        bias = self._bias(N)

        # Pallas fused window attention: measured END-TO-END SLOWER than
        # XLA (swin_fpn_visceral 4.38 -> 3.67 vol/s) despite winning the
        # score-tensor traffic: the pallas_call boundary forces q/k/v into
        # materialized [B_, H, N, d] layouts that XLA otherwise fuses into
        # the surrounding reshapes — same lesson as the round-3 packed-conv
        # kernels (PERFORMANCE.md §round-4 experiment record). Env-gated
        # opt-in for future hardware/toolchains (read once at import —
        # _FUSED_ATTN); correctness stays pinned by tests/test_swin.py.
        use_fused = jax.default_backend() == "tpu" and _FUSED_ATTN
        if use_fused:
            from transoar_tpu.ops.pallas.window_attention import \
                fused_window_attention

            reg = (jnp.asarray(regions) if regions is not None
                   else jnp.zeros((1, N), jnp.float32))
            out = fused_window_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), bias, reg)
            out = out.transpose(0, 2, 1, 3)  # back to [B_, N, H, hd]
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
            attn = attn + bias[None]
            if regions is not None:
                r = jnp.asarray(regions)
                mask = jnp.where(r[:, :, None] != r[:, None, :],
                                 -100.0, 0.0).astype(jnp.float32)
                nW = mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, H, N, N) + \
                    mask[None, :, None]
                attn = attn.reshape(B_, H, N, N)
            attn = nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    blocked_attn: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: [B, D, H, W, C]."""
        B, D, H, W, C = x.shape
        ws, ss = effective_window(
            (D, H, W), self.window_size,
            tuple(w // 2 for w in self.window_size) if self.shift
            else (0, 0, 0))

        shortcut = x
        x = FastLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad = [(0, (ws[i] - x.shape[1 + i] % ws[i]) % ws[i]) for i in range(3)]
        x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
        Dp, Hp, Wp = x.shape[1:4]

        if any(ss):
            x = jnp.roll(x, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            regions = shifted_window_regions((Dp, Hp, Wp), ws, ss)
        else:
            regions = None

        # blocked path (default): attention in the free 8-D reshape — no
        # window_partition/window_reverse transposes (the single largest
        # swin cost, ~105 ms/step at VISCERAL scale; see
        # WindowAttention3D._blocked). The Pallas fused kernel needs flat
        # windows, so TRANSOAR_FUSED_ATTN forces the flat path.
        blocked = self.blocked_attn and not _FUSED_ATTN
        if _BLOCKED_ENV is not None:
            blocked = _BLOCKED_ENV not in ("0", "false", "off")
        attn_mod = WindowAttention3D(C, ws, self.num_heads, self.qkv_bias,
                                     dtype=self.dtype, name="attn")
        if blocked:
            x8 = x.reshape(B, Dp // ws[0], ws[0], Hp // ws[1], ws[1],
                           Wp // ws[2], ws[2], C)
            out8 = attn_mod(x8, regions=regions,
                            deterministic=deterministic)
            x = out8.reshape(B, Dp, Hp, Wp, C)
        else:
            windows = window_partition(x, ws)
            attn = attn_mod(windows, regions=regions,
                            deterministic=deterministic)
            x = window_reverse(attn, ws, B, Dp, Hp, Wp)

        if any(ss):
            x = jnp.roll(x, shift=ss, axis=(1, 2, 3))
        x = x[:, :D, :H, :W]

        # stochastic depth on both residual branches (reference
        # encoder_blocks.py:155,203,208 — timm DropPath): per-sample mask
        # broadcast over all non-batch dims, scaled 1/keep when kept.
        def droppath(branch):
            if self.drop_path <= 0.0:
                return branch
            return nn.Dropout(
                self.drop_path,
                broadcast_dims=tuple(range(1, branch.ndim)))(
                    branch, deterministic=deterministic)

        x = shortcut + droppath(x)

        h = FastLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(h)
        # exact erf GELU (torch nn.GELU default); flax's default is the
        # tanh approximation, which diverges at the 1e-3 level
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp2")(h)
        return x + droppath(h)


class PatchMerging(nn.Module):
    """2x2x2 -> 8C concat -> LN -> Linear(2C) (encoder_blocks.py:305-334)."""
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        pad = [(0, D % 2), (0, H % 2), (0, W % 2)]
        x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
        # Reshape+transpose formulation of the 8-neighbor concat — NOT
        # eight strided slices: XLA lowers the strided-slice TRANSPOSE
        # (grad) as eight chained scatter-adds into the full input grad
        # (measured 8 x 10.4 ms/step on the full-size SwinFPN profile,
        # the single biggest cost in the model); the reshape/transpose
        # twin is a pure layout op both ways.
        # Channel-block order matches the reference's x0..x7 concat
        # (encoder_blocks.py:319-329): d outer, then w, then h — block
        # (d, w, h) = x[:, d::2, h::2, w::2] — which matters for porting
        # reference weights of the following Linear.
        D2, H2, W2 = x.shape[1] // 2, x.shape[2] // 2, x.shape[3] // 2
        x = x.reshape(B, D2, 2, H2, 2, W2, 2, C)
        x = x.transpose(0, 1, 3, 5, 2, 6, 4, 7)  # [B,D2,H2,W2, d,w,h, C]
        x = x.reshape(B, D2, H2, W2, 8 * C)
        x = FastLayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="LayerNorm_0")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class ConvPatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # FastConv3D's kernel==stride path: a non-overlapping patch conv is
        # a block reshape + matmul (XLA's 3D conv emitter is slow on TPU).
        x = FastConv3D(self.dim * 2, kernel_size=(2, 2, 2),
                       strides=(2, 2, 2), use_bias=False,
                       dtype=self.dtype)(x)
        x = InstanceNorm(dtype=self.dtype)(x)
        return nn.relu(x)


class EncoderSwinBlock(nn.Module):
    """One encoder stage: ``depth`` SwinBlocks (alternating shifted windows)
    followed by patch merging (encoder_blocks.py:56-121).

    The reference applies blocks at the incoming channel count, then merges
    (downsample + channel doubling) at the end of the stage.
    """
    depth: int
    num_heads: int
    window_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    conv_merging: bool = False
    drop_path: Sequence[float] = ()
    blocked_attn: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        C = x.shape[-1]
        for i in range(self.depth):
            rate = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinBlock(C, self.num_heads, tuple(self.window_size),
                          shift=(i % 2 == 1), mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias, drop_path=float(rate),
                          blocked_attn=self.blocked_attn, dtype=self.dtype,
                          name=f"block{i}")(x, deterministic=deterministic)
        merging = ConvPatchMerging if self.conv_merging else PatchMerging
        return merging(C, dtype=self.dtype, name="merge")(x)

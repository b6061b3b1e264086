"""TPU-optimized 3D convolution primitives.

XLA's native 3D convolution path on TPU is slow for the small channel
counts of volumetric CNN stems (measured: 36 ms for a 3x3x3 24->24 conv on
a 256x256x128 volume — <1% MXU). Two reformulations recover the speed:

- ``conv3d``: depth-decomposition — stack the K_d depth taps into the
  channel axis (three strided slices + concat) and run ONE 2D convolution
  with kernel [K_h, K_w, K_d * C_in, F] over [B * D_out, H, W, K_d * C_in].
  Numerically identical to the 3D conv (same taps, same sums); ~3x faster
  because XLA's 2D conv emitter is the well-optimized path.
- ``conv_transpose3d_matmul``: for kernel == stride (the FPN up-path,
  reference attn_fpn.py:76-83), a transposed conv is a per-voxel linear map
  to a stride^3 output block — one matmul + block reshape, no conv at all.

Both are shape-static, autodiff-friendly (backward differentiates through
slices/concat into conv2d gradients), and validated against
``lax.conv_general_dilated`` in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv3d(x, w, strides=(1, 1, 1), padding="TORCH"):
    """3D convolution via depth-decomposition.

    x: [B, D, H, W, C]; w: [KD, KH, KW, C, F]; returns [B, D', H', W', F].

    Padding is torch-style symmetric ``(k - 1) // 2`` per side (the
    reference's ``Conv3d(padding=1)``, encoder_blocks.py:28-45) — identical
    to XLA SAME at stride 1 but alignment-matched to torch at stride 2
    (SAME pads (0, 1) where torch pads (1, 1), shifting every strided
    feature map by one voxel).
    """
    if padding != "TORCH":
        raise NotImplementedError("conv3d supports torch-style padding only")
    B, D, H, W, C = x.shape
    KD, KH, KW, C_in, F = w.shape
    assert C == C_in, (C, C_in)
    sd, sh, sw = strides

    pd, ph, pw = (KD - 1) // 2, (KH - 1) // 2, (KW - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    D_out = (D + 2 * pd - KD) // sd + 1

    # stack the KD depth taps into channels: [B, D_out, H, W, KD * C]
    taps = [
        jax.lax.slice_in_dim(xp, k, k + (D_out - 1) * sd + 1, sd, axis=1)
        for k in range(KD)
    ]
    xz = jnp.concatenate(taps, axis=-1)

    # one 2D conv over (H, W) with the taps folded into input channels
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(KH, KW, KD * C, F)
    out = jax.lax.conv_general_dilated(
        xz.reshape(B * D_out, H, W, KD * C), w2, (sh, sw),
        ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    H_out = (H + 2 * ph - KH) // sh + 1
    W_out = (W + 2 * pw - KW) // sw + 1
    return out.reshape(B, D_out, H_out, W_out, F)


def conv3d_split(x, w, strides=(1, 1, 1), padding="TORCH"):
    """Depth decomposition variant: one 2D conv PER depth tap (separate
    kernels, separate outputs) + depth-shifted accumulation.

    Avoids all lane-dimension concats/slices — the depth shifts slice the
    leading (non-lane) spatial axis. Candidate replacement for ``conv3d``;
    which one wins depends on XLA's fusion decisions, so both are kept and
    selected by ``FastConv3D.variant``. Torch-style symmetric padding (see
    ``conv3d``).
    """
    if padding != "TORCH":
        raise NotImplementedError
    B, D, H, W, C = x.shape
    KD, KH, KW, _, F = w.shape
    sd, sh, sw = strides
    ph, pw = (KH - 1) // 2, (KW - 1) // 2
    pad_lo = (KD - 1) // 2
    D_out = (D + 2 * pad_lo - KD) // sd + 1
    H_out = (H + 2 * ph - KH) // sh + 1
    W_out = (W + 2 * pw - KW) // sw + 1

    xb = x.reshape(B * D, H, W, C)
    out = None
    for kd in range(KD):
        y = jax.lax.conv_general_dilated(
            xb, w[kd], (sh, sw), ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = y.reshape(B, D, H_out, W_out, F)
        # output d_out draws tap kd from input depth d_out*sd + kd - pad_lo
        start = kd - pad_lo
        pre = (max(-start, 0) + sd - 1) // sd  # leading out-of-range outputs
        lo = start + pre * sd
        hi = min(start + (D_out - 1) * sd + 1, D)
        tap = jax.lax.slice_in_dim(y, lo, hi, sd, axis=1)
        post = D_out - pre - tap.shape[1]
        tap = jnp.pad(tap, ((0, 0), (pre, post), (0, 0), (0, 0), (0, 0)))
        out = tap if out is None else out + tap
    return out


def conv3d_packed(x, w, pack=4):
    """Stride-1 variant packing ``pack`` depth slices into channels.

    Raises MXU lane utilization for small channel counts: a KD=3 conv on
    packs of 4 becomes ONE 2D conv with C_in' = (pack + 2) * C (halo slices
    included) and C_out' = pack * F — e.g. 24 channels -> 144-in/96-out,
    75% of the 128-lane tile instead of 19%. Costs 1.5x the real FLOPs
    (the block-banded kernel carries zeros) but pads ~4x better.
    """
    B, D, H, W, C = x.shape
    KD, KH, KW, _, F = w.shape
    if KD != 3 or D % pack:
        return conv3d_split(x, w, (1, 1, 1))
    Dp = D // pack

    # packs with one halo slice on each side: [B, Dp, (pack+2)*C] channels
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    slabs = [
        jax.lax.slice_in_dim(xp, g, g + (Dp - 1) * pack + 1, pack, axis=1)
        for g in range(pack + 2)
    ]
    xpk = jnp.concatenate(slabs, axis=-1)  # [B, Dp, H, W, (pack+2)*C]

    # block-banded kernel: output block g (depth offset g within the pack)
    # draws tap kd from input slab block g + kd
    wp = jnp.zeros((KH, KW, (pack + 2) * C, pack * F), x.dtype)
    for g in range(pack):
        for kd in range(KD):
            j = g + kd
            wp = wp.at[:, :, j * C:(j + 1) * C,
                       g * F:(g + 1) * F].set(w[kd].astype(x.dtype))

    y = jax.lax.conv_general_dilated(
        xpk.reshape(B * Dp, H, W, (pack + 2) * C), wp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    y = y.reshape(B, Dp, H, W, pack, F)
    return jnp.moveaxis(y, 4, 2).reshape(B, D, H, W, F)


def pack_depth(x, pack):
    """[B, D, H, W, C] -> [B, D/pack, H, W, pack*C]: fold ``pack``
    consecutive depth slices into the channel (lane) axis, depth offset g
    occupying lanes [g*C, (g+1)*C).

    The MXU hates C=24 (19% lane utilization caps every matmul orientation
    of the stage-0 convs — fwd, dx and dw alike, see the batch-2 trace in
    PERFORMANCE.md); packing depth quads widens the contraction and output
    channels ~4x. One strided-depth copy, paid once per stage-0 chain."""
    B, D, H, W, C = x.shape
    assert D % pack == 0, (x.shape, pack)
    xp = x.reshape(B, D // pack, pack, H, W, C)
    return jnp.moveaxis(xp, 2, 4).reshape(B, D // pack, H, W, pack * C)


def unpack_depth(xp, pack):
    """Inverse of ``pack_depth``."""
    B, Dp, H, W, PC = xp.shape
    C = PC // pack
    x = xp.reshape(B, Dp, H, W, pack, C)
    return jnp.moveaxis(x, 4, 2).reshape(B, Dp * pack, H, W, C)


def _packed_band_kernel(w, pack, dtype):
    """Block-banded 2D kernel for depth-packed KD=3 convs: output depth
    block g draws tap kd from input halo block g + kd (input halo layout:
    [last-C-of-prev | pack*C | first-C-of-next])."""
    KD, KH, KW, C, F = w.shape
    wp = jnp.zeros((KH, KW, (pack + 2) * C, pack * F), dtype)
    for g in range(pack):
        for kd in range(KD):
            j = g + kd
            wp = wp.at[:, :, j * C:(j + 1) * C,
                       g * F:(g + 1) * F].set(w[kd].astype(dtype))
    return wp


def conv3d_packed_chain(xp, w, pack):
    """Stride-1 KD=3 conv on ALREADY-PACKED input [B, Dp, H, W, pack*C],
    output packed [B, Dp, H, W, pack*F] — the packed stage-0 chain runs
    both convs (and InstanceNorm/ReLU) in this layout, paying the
    pack/unpack strided copies once per stage instead of per conv.

    The depth halo needed by the band (one slice each side of the pack) is
    rebuilt from the packed layout itself: the last C lanes of row q-1 and
    the first C lanes of row q+1. Torch-style symmetric padding.
    """
    import os

    B, Dp, H, W, PC = xp.shape
    KD, KH, KW, C, F = w.shape
    assert PC == pack * C and KD == 3, (xp.shape, w.shape, pack)
    ph, pw = (KH - 1) // 2, (KW - 1) // 2

    def run(xp, w):
        prev = _shift_back(xp[..., (pack - 1) * C:])   # x[pack*q - 1]
        nxt = _shift_fwd(xp[..., :C])                  # x[pack*(q+1)]
        xh = jnp.concatenate([prev, xp, nxt], axis=-1)
        wp = _packed_band_kernel(w, pack, xp.dtype)
        xh_flat = xh.reshape(B * Dp, H, W, (pack + 2) * C)
        if os.environ.get("TRANSOAR_PALLAS_CONV", "0") == "1":
            from transoar_tpu.ops.pallas.packed_conv import packed_conv

            y = packed_conv(xh_flat, wp)
        else:
            y = jax.lax.conv_general_dilated(
                xh_flat, wp, (1, 1), ((ph, ph), (pw, pw)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=xp.dtype)
        return y.reshape(B, Dp, H, W, pack * F)

    if os.environ.get("TRANSOAR_PACK_REMAT", "0") == "1":
        # rematerialize the halo tensor xh in the backward: saving it across
        # fwd/bwd forces XLA to copy it between the fwd conv's layout and
        # the dw correlation's layout (~7 ms/step of pure copies in the
        # batch-2 trace); recomputed, it is built directly in the layout
        # its consumer wants for one cheap concat pass.
        from jax.ad_checkpoint import checkpoint_name

        def named(xp, w):
            return checkpoint_name(run(xp, w), "packed_conv_out")

        policy = jax.checkpoint_policies.save_only_these_names(
            "packed_conv_out")
        return jax.checkpoint(named, policy=policy)(xp, w)
    return run(xp, w)


def conv3d_parity(x, w, strides):
    """Stride-2-depth conv via parity decomposition: split D into even/odd
    rows with a pair-axis reshape (NO strided slicing — strided depth
    slices run at ~50 GB/s on TPU because XLA lays depth into lanes),
    run three HALF-depth 2D convs, and shift one tap by a single output
    row. Requires sd == 2, KD == 3, even D.

    Measured vs ``conv3d_split`` (fwd+bwd, v5e): stage-1 strided conv
    50.0 -> 12.8 ms, stage-2 14.8 -> 6.8 ms (PERFORMANCE.md §Per-layer
    conv variants).
    """
    B, D, H, W, C = x.shape
    KD, KH, KW, _, F = w.shape
    sd, sh, sw = strides
    assert sd == 2 and KD == 3 and D % 2 == 0, (x.shape, w.shape, strides)
    ph, pw = (KH - 1) // 2, (KW - 1) // 2
    Do = D // 2
    Ho = (H + 2 * ph - KH) // sh + 1
    Wo = (W + 2 * pw - KW) // sw + 1
    pads = ((ph, ph), (pw, pw))

    def conv2d(xs, ws):
        return jax.lax.conv_general_dilated(
            xs, ws, (sh, sw), pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)

    x2 = x.reshape(B, Do, 2, H, W, C)
    x_even = x2[:, :, 0].reshape(B * Do, H, W, C)
    x_odd = x2[:, :, 1].reshape(B * Do, H, W, C)
    # out[d] = w0 @ x[2d-1] + w1 @ x[2d] + w2 @ x[2d+1]
    #        = w0 @ x_odd[d-1] + w1 @ x_even[d] + w2 @ x_odd[d]
    y1 = conv2d(x_even, w[1]).reshape(B, Do, Ho, Wo, F)
    y2 = conv2d(x_odd, w[2]).reshape(B, Do, Ho, Wo, F)
    y0 = conv2d(x_odd, w[0]).reshape(B, Do, Ho, Wo, F)
    y0 = jnp.pad(y0[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    return y1 + y2 + y0


def pair(x):
    """[B, D, *rest] -> [B, 2, D/2, *rest]: even/odd depth planes as two
    contiguous blocks. The ONLY strided depth copy in the paired-chain
    encoder path — applied once to the raw 1-channel input (~17 MB) instead
    of at every stage boundary (PERFORMANCE.md §Next targets: the parity
    conv's pair-axis split cost ~5 ms/step in layout copies)."""
    B, D = x.shape[:2]
    assert D % 2 == 0, x.shape
    x2 = x.reshape(B, D // 2, 2, *x.shape[2:])
    return jnp.swapaxes(x2, 1, 2)


def unpair(xp):
    """Inverse of ``pair``: [B, 2, D/2, *rest] -> [B, D, *rest]."""
    B, two, Do = xp.shape[:3]
    assert two == 2, xp.shape
    return jnp.swapaxes(xp, 1, 2).reshape(B, 2 * Do, *xp.shape[3:])


def _shift_back(t):
    """t'[j] = t[j-1] along axis 1 (zero at j=0)."""
    return jnp.pad(t[:, :-1], ((0, 0), (1, 0)) + ((0, 0),) * (t.ndim - 2))


def _shift_fwd(t):
    """t'[j] = t[j+1] along axis 1 (zero at j=last)."""
    return jnp.pad(t[:, 1:], ((0, 0), (0, 1)) + ((0, 0),) * (t.ndim - 2))


def conv3d_pair_split(xp, w, strides=(1, 1, 1)):
    """Stride-1 KD=3 conv, paired depth IN and OUT (split-style: one 2D
    conv per depth tap over the full even+odd batch, then pair-aware
    depth-shifted accumulation).

    out_even[j] = w0@odd[j-1] + w1@even[j] + w2@odd[j]
    out_odd[j]  = w0@even[j]  + w1@odd[j]  + w2@even[j+1]

    Identical FLOPs to ``conv3d_split``; all shifts slice the leading
    half-depth axis (never strided), and both output halves are written as
    contiguous blocks — the downstream parity conv reads them for free.
    """
    B, two, Do, H, W, C = xp.shape
    KD, KH, KW, _, F = w.shape
    sd, sh, sw = strides
    assert two == 2 and KD == 3 and sd == 1, (xp.shape, w.shape, strides)
    ph, pw = (KH - 1) // 2, (KW - 1) // 2

    xb = xp.reshape(B * 2 * Do, H, W, C)
    Ho = (H + 2 * ph - KH) // sh + 1
    Wo = (W + 2 * pw - KW) // sw + 1
    y = []
    for kd in range(KD):
        yk = jax.lax.conv_general_dilated(
            xb, w[kd], (sh, sw), ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)
        y.append(yk.reshape(B, 2, Do, Ho, Wo, F))
    e = [yk[:, 0] for yk in y]
    o = [yk[:, 1] for yk in y]
    out_e = _shift_back(o[0]) + e[1] + o[2]
    out_o = e[0] + o[1] + _shift_fwd(e[2])
    return jnp.stack([out_e, out_o], axis=1)


def conv3d_pair_stack(xp, w, strides=(1, 1, 1)):
    """Stride-1 KD=3 conv, paired IN/OUT, stack-style: the three depth taps
    of each output half are channel-concatenated (C -> 3C) and convolved in
    ONE 2D conv per half. Wins over ``conv3d_pair_split`` at small C where
    the lane concat is nearly free (the same regime where ``conv3d`` beats
    ``conv3d_split``, PERFORMANCE.md §Per-layer conv variants)."""
    B, two, Do, H, W, C = xp.shape
    KD, KH, KW, _, F = w.shape
    sd, sh, sw = strides
    assert two == 2 and KD == 3 and sd == 1, (xp.shape, w.shape, strides)
    ph, pw = (KH - 1) // 2, (KW - 1) // 2
    Ho = (H + 2 * ph - KH) // sh + 1
    Wo = (W + 2 * pw - KW) // sw + 1
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(KH, KW, KD * C, F)

    def conv(xs):
        out = jax.lax.conv_general_dilated(
            xs.reshape(B * Do, H, W, KD * C), w2, (sh, sw),
            ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)
        return out.reshape(B, Do, Ho, Wo, F)

    e, o = xp[:, 0], xp[:, 1]
    out_e = conv(jnp.concatenate([_shift_back(o), e, o], axis=-1))
    out_o = conv(jnp.concatenate([e, o, _shift_fwd(e)], axis=-1))
    return jnp.stack([out_e, out_o], axis=1)


def conv3d_parity_pairin(xp, w, strides):
    """Depth-stride-2 parity conv consuming ALREADY-PAIRED input
    [B, 2, D/2, H, W, C] (the output layout of ``conv3d_pair_*``) — the
    pair-axis split that ``conv3d_parity`` pays for on every call is free.
    Output is normal [B, D/2, Ho, Wo, F] (the next stride-1 conv re-pairs
    via its own output layout)."""
    B, two, Do, H, W, C = xp.shape
    KD, KH, KW, _, F = w.shape
    sd, sh, sw = strides
    assert two == 2 and sd == 2 and KD == 3, (xp.shape, w.shape, strides)
    ph, pw = (KH - 1) // 2, (KW - 1) // 2
    Ho = (H + 2 * ph - KH) // sh + 1
    Wo = (W + 2 * pw - KW) // sw + 1
    pads = ((ph, ph), (pw, pw))

    def conv2d(xs, ws):
        out = jax.lax.conv_general_dilated(
            xs.reshape(B * Do, H, W, C), ws, (sh, sw), pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xp.dtype)
        return out.reshape(B, Do, Ho, Wo, F)

    x_even, x_odd = xp[:, 0], xp[:, 1]
    # out[d] = w0 @ x[2d-1] + w1 @ x[2d] + w2 @ x[2d+1]
    #        = w0 @ odd[d-1] + w1 @ even[d] + w2 @ odd[d]
    y1 = conv2d(x_even, w[1])
    y2 = conv2d(x_odd, w[2])
    y0 = _shift_back(conv2d(x_odd, w[0]))
    return y1 + y2 + y0


def conv3d_native(x, w, strides=(1, 1, 1)):
    """XLA's native 3D conv path with torch-style symmetric padding.

    Slow for stride-1 stem convs (the original 36 ms finding), but the
    FASTEST option for strided convs: the depth-decomposed variants must
    conv every input depth slice and then strided-slice the output (fwd)
    / interior-pad it (bwd) — measured 50-104 ms vs native's 29 ms for the
    stage-1 strided conv (PERFORMANCE.md §Per-layer conv variants).
    """
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, strides, pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def conv3d_patch_matmul(x, w, stride):
    """Strided conv with kernel == stride (non-overlapping patches) as
    block reshape + matmul — the inverse of ``conv_transpose3d_matmul``.

    x: [B, D, H, W, C]; w: [s0, s1, s2, C, F]; returns
    [B, D//s0, H//s1, W//s2, F]. Exactly equivalent to the VALID/SAME
    strided conv when each spatial dim divides by its stride.
    """
    s0, s1, s2 = stride
    B, D, H, W, C = x.shape
    F = w.shape[-1]
    assert D % s0 == 0 and H % s1 == 0 and W % s2 == 0, (x.shape, stride)
    xb = x.reshape(B, D // s0, s0, H // s1, s1, W // s2, s2, C)
    xb = xb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, D // s0, H // s1, W // s2, s0 * s1 * s2 * C)
    wmat = w.reshape(s0 * s1 * s2 * C, F)
    return jnp.einsum("bdhwk,kf->bdhwf", xb, wmat.astype(x.dtype))


def conv_transpose3d_matmul(x, w, stride):
    """Transposed conv with kernel == stride as matmul + block interleave.

    x: [B, D, H, W, C]; w: [s0, s1, s2, C, F]; returns
    [B, D*s0, H*s1, W*s2, F]. Exactly equivalent to
    ``lax.conv_transpose`` with kernel_size == strides (every output voxel
    receives exactly one kernel tap).
    """
    s0, s1, s2 = stride
    B, D, H, W, C = x.shape
    F = w.shape[-1]
    # [B, D, H, W, C] @ [C, s0*s1*s2*F]
    wmat = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(C, s0 * s1 * s2 * F)
    out = jnp.einsum("bdhwc,ck->bdhwk", x, wmat.astype(x.dtype))
    out = out.reshape(B, D, H, W, s0, s1, s2, F)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(B, D * s0, H * s1, W * s2, F)


# ---------------------------------------------------------------------------
# flax modules using the fast primitives
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class FastConv3D(nn.Module):
    """Drop-in conv layer using the depth-decomposed path for K>1 and a
    plain matmul for 1x1x1 convs (XLA's conv1x1 path is 3x slower than the
    equivalent dot).

    ``pair_mode`` selects the paired-depth chain layout (encoder stages,
    PERFORMANCE.md §Next targets — kills the parity conv's strided
    pair-axis split copies):
      - "none": normal [B, D, H, W, C] in and out.
      - "in":   input is paired [B, 2, D/2, H, W, C]; depth-stride-2 parity
                conv; output normal [B, D/2, Ho, Wo, F].
      - "out":  input normal, stride 1; output paired (input is paired
                internally — the one remaining strided copy, placed on the
                smallest tensor in the stage).
      - "both": paired in AND out, stride 1.
    """
    features: int
    kernel_size: tuple
    strides: tuple = (1, 1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros
    pair_mode: str = "none"
    packed_chain: int = 0  # pack factor; input/output depth-packed lanes
    # per-layer variant override ("" = TRANSOAR_CONV3D env / auto policy):
    # lets wide-channel call sites (e.g. retina's C=128 towers) pick
    # "native" where the decomposition policy was tuned on narrow stems
    force_variant: str = ""

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        ks = tuple(self.kernel_size)
        if self.packed_chain:
            pack = self.packed_chain
            assert ks == (3, 3, 3) and tuple(self.strides) == (1, 1, 1)
            C = x.shape[-1] // pack
            kernel = self.param("kernel", self.kernel_init,
                                (*ks, C, self.features), jnp.float32)
            out = conv3d_packed_chain(x, kernel.astype(self.dtype), pack)
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,),
                                  jnp.float32)
                out = out + jnp.tile(bias, pack).astype(self.dtype)
            return out
        C = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (*ks, C, self.features), jnp.float32)
        kernel = kernel.astype(self.dtype)
        if self.pair_mode != "none":
            assert ks == (3, 3, 3), (self.pair_mode, ks)
            strides = tuple(self.strides)
            if self.pair_mode == "in":
                assert strides[0] == 2, strides
                out = conv3d_parity_pairin(x, kernel, strides)
            else:
                assert strides == (1, 1, 1), (self.pair_mode, strides)
                if self.pair_mode == "out":
                    x = pair(x)
                if C <= 8 or (C <= 32 and x.shape[0] == 1):
                    out = conv3d_pair_stack(x, kernel, strides)
                else:
                    out = conv3d_pair_split(x, kernel, strides)
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,),
                                  jnp.float32)
                out = out + bias.astype(self.dtype)
            return out
        if ks == (1, 1, 1) and tuple(self.strides) == (1, 1, 1):
            out = jnp.einsum("bdhwc,cf->bdhwf", x,
                             kernel.reshape(C, self.features))
        elif ks == tuple(self.strides):
            # non-overlapping patch conv (kernel == stride, e.g. patch
            # merging): every output voxel is one linear map of a disjoint
            # input block -> block reshape + matmul, no conv at all
            out = conv3d_patch_matmul(x, kernel, ks)
        else:
            import os

            strides = tuple(self.strides)
            variant = self.force_variant or os.environ.get(
                "TRANSOAR_CONV3D", "auto")
            if variant == "auto":
                # measured policy (PERFORMANCE.md §Per-layer conv variants):
                # depth-stride-2 -> parity decomposition (no strided depth
                # slicing); stride-1 tiny C_in -> stack (concat of 1-3
                # channels is free, measured up to C=24); otherwise -> split
                if (strides[0] == 2 and ks[0] == 3
                        and x.shape[1] % 2 == 0):
                    variant = "parity"
                elif strides == (1, 1, 1) and (
                        C <= 8 or (C <= 32 and x.shape[0] == 1)):
                    # stack beats split for the 24ch stem at batch 1
                    # (15.8 vs 15.4 vol/s) but loses at batch 2
                    # (11.1 vs 12.1) — batch-aware threshold, measured
                    variant = "stack"
                else:
                    variant = "split"
            if variant == "parity":
                out = conv3d_parity(x, kernel, strides)
            elif variant == "native":
                out = conv3d_native(x, kernel, strides)
            elif variant == "packed" and strides == (1, 1, 1):
                out = conv3d_packed(x, kernel)
            elif variant == "stack":
                out = conv3d(x, kernel, strides)
            else:
                out = conv3d_split(x, kernel, strides)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class FastConvTranspose3D(nn.Module):
    """Transposed conv with kernel == stride (FPN up-path)."""
    features: int
    stride: tuple
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = x.astype(self.dtype)
        s = tuple(self.stride)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*s, C, self.features), jnp.float32)
        out = conv_transpose3d_matmul(x, kernel.astype(self.dtype), s)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out

"""Pallas TPU kernel: 3x3 2D convolution for small channel counts.

The framework's hot op is the volumetric CNN stem, lowered to 2D convs by
``transoar_tpu.ops.conv3d`` (depth decomposition). XLA's conv emitter
reaches only a few percent of the MXU on these shapes (small C); this
kernel runs 9 accumulated [TH*W, C] x [C, F] matmuls per row-tile with the
taps taken as static in-VMEM slices.

Halo handling: overlapping input windows are not expressible as BlockSpecs
and small-C DMA slices hit Mosaic alignment limits, so the (tiny, ~2/TH)
row overlap is materialized OUTSIDE the kernel by an XLA stack of static
slices — the kernel then consumes clean disjoint blocks.

Forward only, stride 1, SAME padding, NHWC; numerics validated against
``lax.conv_general_dilated`` in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, o_ref, *, TH, W, C, F):
    """x_ref: [1, 1, TH+2, W, C]; w_ref: [9*C, F]; o_ref: [1, TH, W, F]."""
    xp = jnp.pad(x_ref[0, 0], ((0, 0), (1, 1), (0, 0)))  # width halo

    out = jnp.zeros((TH * W, F), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            tap = jax.lax.slice(
                xp, (dh, dw, 0), (dh + TH, dw + W, C)).reshape(TH * W, C)
            w_tap = w_ref[(dh * 3 + dw) * C:(dh * 3 + dw + 1) * C, :]
            out = out + jnp.dot(tap, w_tap,
                                preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(TH, W, F).astype(o_ref.dtype)


def conv2d_3x3_pallas(x, w, tile_rows=32, interpret=False):
    """x: [N, H, W, C]; w: [3, 3, C, F]; stride 1, SAME -> [N, H, W, F]."""
    N, H, W, C = x.shape
    F = w.shape[-1]
    TH = tile_rows
    while H % TH:
        TH //= 2
    KH = H // TH

    # [N, KH, TH+2, W, C]: per-tile rows with one halo row on each side.
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    x_blocks = jnp.stack(
        [jax.lax.slice_in_dim(xp, k * TH, k * TH + TH + 2, axis=1)
         for k in range(KH)], axis=1)

    w2 = w.reshape(9 * C, F).astype(x.dtype)
    kernel = functools.partial(_conv_kernel, TH=TH, W=W, C=C, F=F)
    out = pl.pallas_call(
        kernel,
        grid=(N, KH),
        in_specs=[
            pl.BlockSpec((1, 1, TH + 2, W, C), lambda n, k: (n, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, F), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, F), lambda n, k: (n, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, F), x.dtype),
        interpret=interpret,
    )(x_blocks, w2)
    return out

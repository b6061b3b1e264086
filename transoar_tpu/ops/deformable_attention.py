"""3D multi-scale deformable attention sampling — the reference's custom
CUDA op, rebuilt for TPU.

Semantics mirror the reference exactly (the numerical spec is the pure-
PyTorch path ``ms_deform_attn_core_pytorch``,
transoar/models/ops/functions/ms_deform_attn_func.py:41-65, equal to the
CUDA kernel transoar/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:371-439):

- ``value``: [B, S, M, D] — flattened multi-level feature tokens split by
  ``spatial_shapes`` [(s0, s1, s2), ...] (concatenated along S).
- ``sampling_locations``: [B, Q, M, L, P, 3], normalized [0, 1]; coordinate
  0 indexes the LAST spatial axis of the level volume and coordinate 2 the
  first (the grid_sample WHD/XYZ convention — ms_deform_attn_func.py:57,
  decoder_blocks.py:125, im2col_cuda.cuh:417-426).
- voxel coordinate = loc * size - 0.5 (align_corners=False), 8-corner
  trilinear interpolation, out-of-bounds corners contribute zero
  (padding_mode='zeros').
- ``attention_weights``: [B, Q, M, L, P] (softmax over L*P done by the
  module); output [B, Q, M*D] = sum over levels/points of weighted samples.

Instead of the reference's scatter-add backward with atomics (6 CUDA kernel
variants, im2col_cuda.cuh:441-1507), the TPU path relies on XLA: the forward
is built from gathers (one flat ``take_along_axis`` per corner per level)
and elementwise math, whose transpose XLA emits as segment-sum scatters —
no atomics, deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _level_sample(value_l, spatial_shape, loc, weights):
    """Trilinear-sample one level.

    value_l: [B, M, S_l, D]; loc: [B, Q, M, P, 3] normalized;
    weights: [B, Q, M, P] -> [B, Q, M, D].
    """
    s0, s1, s2 = spatial_shape
    sizes = jnp.asarray([s2, s1, s0], loc.dtype)  # coord order: last..first

    # Voxel-space coordinates (align_corners=False).
    xyz = loc * sizes - 0.5  # [B, Q, M, P, 3]
    floor = jnp.floor(xyz)
    frac = xyz - floor  # [..., 3] fractional offsets
    floor = floor.astype(jnp.int32)

    # Corner contributions: iterate the 8 corners; weight product over axes.
    out = None
    for corner in range(8):
        bits = [(corner >> a) & 1 for a in range(3)]  # per-coordinate 0/1
        idx = floor + jnp.asarray(bits, jnp.int32)
        w = jnp.ones(frac.shape[:-1], frac.dtype)
        for a in range(3):
            fa = frac[..., a]
            w = w * (fa if bits[a] else (1.0 - fa))

        # validity per axis (zeros padding outside the volume)
        valid = jnp.ones(idx.shape[:-1], bool)
        for a, size in enumerate((s2, s1, s0)):
            valid &= (idx[..., a] >= 0) & (idx[..., a] < size)
        w = jnp.where(valid, w, 0.0)

        # flat index: coordinate 0 is the last spatial axis
        c = jnp.clip(idx, 0)
        c = jnp.minimum(c, jnp.asarray([s2 - 1, s1 - 1, s0 - 1]))
        flat = (c[..., 2] * s1 + c[..., 1]) * s2 + c[..., 0]  # [B, Q, M, P]

        # gather: value_l [B, M, S_l, D] over flat [B, Q, M, P]
        flat_t = flat.transpose(0, 2, 1, 3)  # [B, M, Q, P]
        B, M, Q, P = flat_t.shape
        gathered = jnp.take_along_axis(
            value_l[:, :, :, None, :],  # [B, M, S, 1, D]
            flat_t.reshape(B, M, Q * P)[..., None, None],
            axis=2)  # [B, M, Q*P, 1, D]
        gathered = gathered[..., 0, :].reshape(B, M, Q, P, -1)
        gathered = gathered.transpose(0, 2, 1, 3, 4)  # [B, Q, M, P, D]

        contrib = gathered * w[..., None]
        out = contrib if out is None else out + contrib

    return (out * weights[..., None]).sum(axis=3)  # [B, Q, M, D]


def ms_deform_attn(value, spatial_shapes, sampling_locations,
                   attention_weights):
    """Multi-scale deformable attention core (XLA path).

    Args:
      value: [B, S, M, D] with S = sum of level volumes.
      spatial_shapes: static list of (s0, s1, s2) per level.
      sampling_locations: [B, Q, M, L, P, 3] normalized, XYZ order.
      attention_weights: [B, Q, M, L, P] (softmaxed over L*P).

    Returns: [B, Q, M * D].
    """
    B, S, M, D = value.shape
    L = len(spatial_shapes)
    sizes = [int(np.prod(s)) for s in spatial_shapes]
    assert sum(sizes) == S, (spatial_shapes, S)

    splits = np.cumsum(sizes)[:-1]
    value_levels = jnp.split(value, splits, axis=1)

    out = 0.0
    for lvl in range(L):
        value_l = value_levels[lvl].transpose(0, 2, 1, 3)  # [B, M, S_l, D]
        out = out + _level_sample(
            value_l, spatial_shapes[lvl],
            sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl])

    B, Q = out.shape[0], out.shape[1]
    return out.reshape(B, Q, M * D)

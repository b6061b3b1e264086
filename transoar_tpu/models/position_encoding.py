"""3D positional encodings.

Numerical twin of reference ``transoar/models/position_encoding.py``:
- sine: PositionEmbeddingSine3D (position_encoding.py:10-51) — 3-axis
  sin/cos with per-axis channel count ``2 * ceil(C / 6)``, normalized
  half-offset grid, channel order (y, x, z), truncated to C channels.
- learned: PositionEmbeddingLearned3D (position_encoding.py:54-86).

The reference builds the grid with a ``cumsum`` over a ones-mask every
forward pass; the grid only depends on the static spatial shape, so here it
is computed directly from ``arange`` and folded into the jitted graph as a
constant (XLA hoists it out of the step).

Returns channels-last tensors ``[B, S0, S1, S2, C]`` (the reference is
channels-first).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sine_position_encoding(spatial_shape, channels, temperature=10000.0,
                           scale=2 * math.pi, dtype=jnp.float32):
    """Build the [S0, S1, S2, C] sine table for a static spatial shape."""
    per_axis = int(np.ceil(channels / 6) * 2)

    dim_t = np.arange(per_axis, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / per_axis)

    def axis_embed(size):
        # cumsum of ones = arange + 1; reference normalization
        # (position_encoding.py:36-38): (i + 1 - 0.5) / size * scale.
        grid = (np.arange(size, dtype=np.float64) + 0.5) / size * scale
        pos = grid[:, None] / dim_t[None, :]
        # Reference channel layout per axis (position_encoding.py:46-48):
        # ``stack((sin(even), cos(odd)), dim=4).flatten(4)`` stacks the two
        # halves BLOCK-wise, not interleaved — the per-axis channels are
        # [sin(p0), sin(p2), ..., cos(p1), cos(p3), ...]. Verified against
        # the imported reference module in tests/test_model_parity.py.
        out = np.concatenate(
            [np.sin(pos[:, 0::2]), np.cos(pos[:, 1::2])], axis=-1)
        return out

    s0, s1, s2 = spatial_shape
    pos_x = axis_embed(s0)[:, None, None, :]  # varies along axis 0
    pos_y = axis_embed(s1)[None, :, None, :]  # varies along axis 1
    pos_z = axis_embed(s2)[None, None, :, :]  # varies along axis 2

    zeros = np.zeros((s0, s1, s2, per_axis))
    # Reference channel order: (y, x, z) (position_encoding.py:50).
    pos = np.concatenate(
        [pos_y + zeros, pos_x + zeros, pos_z + zeros], axis=-1)
    return jnp.asarray(pos[..., :channels], dtype=dtype)


class PositionEmbeddingSine3D(nn.Module):
    channels: int
    temperature: float = 10000.0
    scale: float = 2 * math.pi
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: [B, S0, S1, S2, C] -> positional table broadcast over batch."""
        pos = sine_position_encoding(
            x.shape[1:4], self.channels, self.temperature, self.scale,
            dtype=self.dtype)
        return jnp.broadcast_to(pos[None], (x.shape[0], *pos.shape))


class PositionEmbeddingLearned3D(nn.Module):
    """Learned per-axis embeddings, outer-summed over the grid
    (reference position_encoding.py:54-86)."""
    channels: int
    max_positions: int = 50
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        per_axis = int(np.ceil(self.channels / 6) * 2)
        s0, s1, s2 = x.shape[1:4]
        init = nn.initializers.uniform(scale=1.0)
        tables = [
            self.param(name, init, (self.max_positions, per_axis), jnp.float32)
            for name in ("embed_0", "embed_1", "embed_2")
        ]
        e0 = tables[0][:s0][:, None, None, :]
        e1 = tables[1][:s1][None, :, None, :]
        e2 = tables[2][:s2][None, None, :, :]
        zeros = jnp.zeros((s0, s1, s2, per_axis), jnp.float32)
        # reference channel-block order: col (axis 1), row (axis 0), depth
        # (axis 2) — position_encoding.py:79-83; embed_0=row, embed_1=col
        pos = jnp.concatenate([e1 + zeros, e0 + zeros, e2 + zeros], axis=-1)
        pos = pos[..., :self.channels].astype(self.dtype)
        return jnp.broadcast_to(pos[None], (x.shape[0], *pos.shape))


def build_pos_enc(kind, channels, dtype=jnp.bfloat16):
    if kind == "sine":
        return PositionEmbeddingSine3D(channels=channels, dtype=dtype)
    if kind == "learned":
        return PositionEmbeddingLearned3D(channels=channels, dtype=dtype)
    raise ValueError(f"unknown positional encoding: {kind}")

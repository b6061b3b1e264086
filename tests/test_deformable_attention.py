"""Deformable-attention numerics: compare the JAX op against a torch
``grid_sample`` oracle (the reference's numerical spec — trilinear,
align_corners=False, zeros padding), values and gradients, across channel
and point counts (mirroring the reference kernel harness
transoar/models/ops/test.py:69-123)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from transoar_tpu.ops.deformable_attention import ms_deform_attn


def torch_oracle(value, spatial_shapes, loc, weights):
    """Torch reference: per-level trilinear grid_sample, weighted sum.

    value [B, S, M, D], loc [B, Q, M, L, P, 3] in [0,1] (xyz = last..first
    axis order), weights [B, Q, M, L, P] -> [B, Q, M*D].
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    sizes = [s0 * s1 * s2 for (s0, s1, s2) in spatial_shapes]
    value_levels = torch.split(value, sizes, dim=1)

    out = torch.zeros(B, Q, M, D, dtype=value.dtype)
    for lvl, (s0, s1, s2) in enumerate(spatial_shapes):
        # [B*M, D, s0, s1, s2]; grid_sample treats dim order (D_in,H,W) with
        # grid x indexing W (the last axis) — matches our convention.
        v = (value_levels[lvl].reshape(B, s0, s1, s2, M, D)
             .permute(0, 4, 5, 1, 2, 3).reshape(B * M, D, s0, s1, s2))
        grid = 2.0 * loc[:, :, :, lvl] - 1.0  # [B, Q, M, P, 3]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * M, 1, Q, P, 3)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, M, D, Q, P).permute(0, 3, 1, 4, 2)
        w = weights[:, :, :, lvl].unsqueeze(-1)  # [B, Q, M, P, 1]
        out = out + (sampled * w).sum(dim=3)
    return out.reshape(B, Q, M * D)


def _random_case(rng, B=2, Q=5, M=2, D=4, P=3,
                 shapes=((4, 5, 3), (2, 3, 2))):
    L = len(shapes)
    S = sum(s0 * s1 * s2 for (s0, s1, s2) in shapes)
    value = rng.normal(size=(B, S, M, D)).astype(np.float64)
    # include off-grid + slightly out-of-range locations
    loc = rng.uniform(-0.1, 1.1, size=(B, Q, M, L, P, 3)).astype(np.float64)
    w = rng.uniform(size=(B, Q, M, L, P)).astype(np.float64)
    w = w / w.sum(axis=(3, 4), keepdims=True)
    return value, loc, w, shapes


def test_forward_matches_torch_oracle(rng):
    value, loc, w, shapes = _random_case(rng)
    ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                          jnp.asarray(w))
    ref = torch_oracle(torch.tensor(value), list(shapes), torch.tensor(loc),
                       torch.tensor(w))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


@pytest.mark.parametrize("D", [1, 3, 16, 31])
def test_forward_channel_widths(rng, D):
    value, loc, w, shapes = _random_case(rng, D=D)
    ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                          jnp.asarray(w))
    ref = torch_oracle(torch.tensor(value), list(shapes), torch.tensor(loc),
                       torch.tensor(w))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_gradients_match_torch(rng):
    value, loc, w, shapes = _random_case(rng, B=1, Q=3, M=2, D=2, P=2)

    def loss_jax(v, l, wt):
        out = ms_deform_attn(v, shapes, l, wt)
        return (out ** 2).sum()

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(loc, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    loss = (torch_oracle(tv, list(shapes), tl, tw) ** 2).sum()
    loss.backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)
    # location grads only match where sampling is differentiable (torch and
    # the analytic CUDA backward agree away from voxel boundaries; our
    # random case avoids exact integer coordinates with prob 1)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)


def test_jit_and_shapes(rng):
    value, loc, w, shapes = _random_case(rng)
    f = jax.jit(lambda v, l, wt: ms_deform_attn(v, shapes, l, wt))
    out = f(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    assert out.shape == (2, 5, 2 * 4)

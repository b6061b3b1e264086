"""Deformable-attention module + FPN refinement block tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_config
from transoar_tpu.models.def_attn import (DecoderDefAttnBlock, MSDeformAttn,
                                          directional_offset_bias,
                                          reference_points)
from transoar_tpu.models.transoarnet import build_transoarnet


def test_directional_bias_structure():
    bias = directional_offset_bias(6, 2, 3).reshape(6, 2, 3, 3)
    # each head moves along exactly one axis, point i steps (i+1)
    for h in range(6):
        d = bias[h, 0, 0]
        assert np.count_nonzero(d) == 1
        for i in range(3):
            np.testing.assert_allclose(bias[h, 0, i], d * (i + 1))
    bias26 = directional_offset_bias(26, 1, 2)
    assert bias26.shape == (26 * 1 * 2 * 3,)
    with pytest.raises(ValueError):
        directional_offset_bias(8, 1, 1)


def test_reference_points_centers():
    shapes = ((2, 2, 2), (1, 1, 1))
    ref = reference_points(shapes)
    assert ref.shape == (9, 2, 3)
    # first voxel of level 0: center (0.25, 0.25, 0.25) in xyz
    np.testing.assert_allclose(ref[0, 0], [0.25, 0.25, 0.25])
    # level 1 single voxel center: 0.5
    np.testing.assert_allclose(ref[8, 0], [0.5, 0.5, 0.5])


def test_msdeformattn_module_shapes():
    shapes = ((4, 4, 2), (2, 2, 1))
    S = sum(np.prod(s) for s in shapes)
    B, Q, C = 2, 5, 12
    mod = MSDeformAttn(d_model=C, n_levels=2, n_heads=6, n_points=2,
                       dtype=jnp.float32)
    query = jnp.ones((B, Q, C))
    src = jnp.ones((B, int(S), C))
    ref = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5]]), (B, Q, 2, 1)).reshape(
        B, Q, 2, 3)
    params = mod.init(jax.random.key(0), query, ref, src, shapes)
    out = mod.apply(params, query, ref, src, shapes)
    assert out.shape == (B, Q, C)
    assert np.isfinite(np.asarray(out)).all()


def test_refine_block_roundtrip_shapes():
    fmaps = [jnp.ones((1, 4, 4, 2, 12)), jnp.ones((1, 2, 2, 1, 12))]
    block = DecoderDefAttnBlock(hidden_dim=12, nheads=6, num_layers=1,
                                dim_feedforward=16, dropout=0.0, n_points=2,
                                dtype=jnp.float32)
    params = block.init(jax.random.key(0), fmaps)
    out = block.apply(params, fmaps)
    assert [o.shape for o in out] == [f.shape for f in fmaps]


def test_transoarnet_with_decoder_attn():
    cfg = tiny_config(num_organs=2, qpo=1, precision="float32")
    cfg["backbone"]["use_decoder_attn"] = True
    cfg["backbone"]["def_attn"].update(
        {"hidden_dim": 24, "nheads": 6, "layers": 1, "n_points": 2,
         "feature_levels": ["P2", "P3"]})
    model = build_transoarnet(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["pred_logits"].shape == (1, 2, 1)

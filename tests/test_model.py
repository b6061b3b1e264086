"""Model construction + forward-shape tests (anchors, bias, TransoarNet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_config
from transoar_tpu.models.anchors import generate_anchors, synthetic_bbox_props
from transoar_tpu.models.focused_decoder import (MASKED_BIAS,
                                                 generate_attn_bias,
                                                 level_spatial_shape)
from transoar_tpu.models.position_encoding import sine_position_encoding
from transoar_tpu.models.transoarnet import build_transoarnet


def test_generate_anchors_shapes_and_ranges():
    props = synthetic_bbox_props(5, seed=1)
    neck = {"num_queries": 5 * 27, "num_organs": 5,
            "anchor_gen_dynamic_offset": True, "anchor_gen_offset": 0.1}
    anchors, restr = generate_anchors(neck, props)
    assert anchors.shape == (135, 6)
    assert restr.shape == (135, 6)
    assert (anchors >= 0).all() and (anchors <= 1).all()
    assert (restr >= 0).all()

    # Zero-offset anchor of each organ sits at the attn-area center with the
    # median size (reference transoarnet.py:96-106).
    for i in range(5):
        attn = np.array(props[str(i + 1)]["attn_area"])
        center = (attn[:3] + attn[3:]) / 2
        median = np.array(props[str(i + 1)]["median"])[3:]
        organ_anchors = anchors[i * 27:(i + 1) * 27]
        dists = np.abs(organ_anchors[:, :3] - center).sum(-1)
        zero_idx = dists.argmin()
        np.testing.assert_allclose(organ_anchors[zero_idx, :3], center,
                                   atol=1e-6)
        np.testing.assert_allclose(organ_anchors[:, 3:],
                                   np.tile(median, (27, 1)), atol=1e-6)


@pytest.mark.parametrize("qpo,expected", [(1, 1), (7, 7), (27, 27)])
def test_generate_anchors_query_counts(qpo, expected):
    props = synthetic_bbox_props(3, seed=2)
    neck = {"num_queries": 3 * qpo, "num_organs": 3,
            "anchor_gen_dynamic_offset": True, "anchor_gen_offset": 0.1}
    anchors, _ = generate_anchors(neck, props)
    assert anchors.shape == (3 * expected, 6)


def test_attn_bias_masks_outside_area():
    props = synthetic_bbox_props(2, seed=0)
    shape = (8, 8, 4)
    bias = generate_attn_bias(props, shape)
    assert bias.shape == (2, 8 * 8 * 4)
    vol = bias.reshape(2, *shape)
    for i in range(2):
        area = np.array(props[str(i + 1)]["attn_area"])
        vox = area * np.array([*shape, *shape])
        lo = np.floor(vox[:3]).astype(int)
        hi = np.ceil(np.clip(vox[3:], 0, shape)).astype(int)
        inside = vol[i, lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        assert (inside == 0).all()
        # something must be masked out (areas are much smaller than volume)
        assert (vol[i] == MASKED_BIAS).any()

    unrestricted = generate_attn_bias(props, shape, restrict=False)
    assert (unrestricted == 0).all()


def test_level_spatial_shape():
    assert level_spatial_shape([256, 256, 128], 3) == (32, 32, 16)
    assert level_spatial_shape([160, 160, 256], 2) == (40, 40, 64)


def test_sine_position_encoding_properties():
    pos = np.asarray(sine_position_encoding((6, 5, 4), channels=24))
    assert pos.shape == (6, 5, 4, 24)
    # per-axis blocks: first 8 channels vary along axis 1 (y), next 8 along
    # axis 0 (x), last 8 along axis 2 (z) — reference channel order
    # (position_encoding.py:50).
    assert np.allclose(pos[0, :, 0, :8].std(axis=0).sum() > 0, True)
    assert (pos[:, 0, 0, :8] == pos[0, 0, 0, :8]).all()  # y-block const in x
    assert (pos[0, 0, :, 8:16] == pos[0, 0, 0, 8:16]).all()  # x-block const in z
    assert np.abs(pos).max() <= 1.0 + 1e-6


def test_transoarnet_forward_shapes():
    cfg = tiny_config(num_organs=3, qpo=7)
    model = build_transoarnet(cfg)
    x = jnp.zeros((2, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)

    Q = cfg["neck"]["num_queries"]
    L = cfg["neck"]["dec_layers"]
    assert out["pred_logits"].shape == (2, Q, 1)
    assert out["pred_boxes"].shape == (2, Q, 6)
    assert out["aux_logits"].shape == (L - 1, 2, Q, 1)
    assert out["aux_boxes"].shape == (L - 1, 2, Q, 6)
    assert out["pred_boxes"].min() >= 0 and out["pred_boxes"].max() <= 1

    # Zero-init heads + anchor decode -> initial boxes equal the anchors.
    anchors, _ = generate_anchors(cfg["neck"], cfg["bbox_properties"])
    np.testing.assert_allclose(np.asarray(out["pred_boxes"][0]), anchors,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]), 0.0, atol=1e-6)


def test_transoarnet_seg_proxy_head():
    cfg = tiny_config(num_organs=2, qpo=1, seg_proxy=True)
    model = build_transoarnet(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["pred_seg"].shape == (1, 32, 32, 16, 2)

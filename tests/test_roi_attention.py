"""RoI-gather focused attention must match the dense masked path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.models.focused_decoder import (generate_attn_bias,
                                                 roi_token_indices)
from transoar_tpu.models.transoarnet import build_transoarnet


def test_roi_token_indices_structure():
    bias = np.full((2, 20), -1e9, np.float32)
    bias[0, [3, 4, 5]] = 0
    bias[1, [10, 11, 12, 13, 14]] = 0
    idx, valid = roi_token_indices(bias, pad_multiple=8)
    assert idx.shape == (2, 8)
    assert idx[0, :3].tolist() == [3, 4, 5]
    assert valid[0].sum() == 3 and valid[1].sum() == 5


def test_roi_matches_dense_forward():
    cfg = tiny_config(num_organs=3, qpo=7, precision="float32")
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 32, 32, 16, 1)).astype(np.float32))

    cfg_dense = {**cfg, "neck": {**cfg["neck"], "roi_attention": False}}
    cfg_roi = {**cfg, "neck": {**cfg["neck"], "roi_attention": True}}

    m_dense = build_transoarnet(cfg_dense)
    m_roi = build_transoarnet(cfg_roi)
    assert m_roi.roi is not None and m_dense.roi is None

    params = m_dense.init(jax.random.key(0), x)
    out_dense = m_dense.apply(params, x)
    out_roi = m_roi.apply(params, x)  # same params: same module structure

    np.testing.assert_allclose(np.asarray(out_roi["pred_logits"]),
                               np.asarray(out_dense["pred_logits"]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_roi["pred_boxes"]),
                               np.asarray(out_dense["pred_boxes"]),
                               atol=2e-4)


def test_roi_weights_scatter_matches_dense():
    cfg = tiny_config(num_organs=2, qpo=1, precision="float32")
    cfg["neck"]["dropout"] = 0.0
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(1, 32, 32, 16, 1)).astype(np.float32))

    cfg_dense = {**cfg, "neck": {**cfg["neck"], "roi_attention": False,
                                 "remat": False}}
    cfg_roi = {**cfg, "neck": {**cfg["neck"], "roi_attention": True,
                               "remat": False}}
    m_dense = build_transoarnet(cfg_dense)
    m_roi = build_transoarnet(cfg_roi)
    params = m_dense.init(jax.random.key(0), x)

    w_dense = np.asarray(
        m_dense.apply(params, x, return_weights=True)["attn_weights"],
        np.float32)
    w_roi = np.asarray(
        m_roi.apply(params, x, return_weights=True)["attn_weights"],
        np.float32)
    np.testing.assert_allclose(w_roi, w_dense, atol=2e-4)


def test_roi_matmul_matches_gather():
    """The one-hot-matmul RoI path equals the gather path (full model)."""
    cfg = tiny_config(num_organs=2, qpo=1, precision="float32")
    cfg["neck"]["dropout"] = 0.0
    x = jnp.asarray(np.random.default_rng(2)
                    .normal(size=(1, 32, 32, 16, 1)).astype(np.float32))

    cfg_g = {**cfg, "neck": {**cfg["neck"], "roi_attention": True}}
    cfg_m = {**cfg, "neck": {**cfg["neck"], "roi_attention": True,
                             "roi_matmul": True}}
    m_g = build_transoarnet(cfg_g)
    m_m = build_transoarnet(cfg_m)
    params = m_g.init(jax.random.key(0), x)
    out_g = m_g.apply(params, x)
    out_m = m_m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_m["pred_logits"]),
                               np.asarray(out_g["pred_logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_m["pred_boxes"]),
                               np.asarray(out_g["pred_boxes"]), atol=2e-4)

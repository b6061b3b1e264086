"""Visualization export tests: .ply structure + attention PNGs."""

import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.utils.visualization import (bbox_wireframe,
                                              save_attn_visualization,
                                              save_pred_visualization,
                                              write_ply)


def test_write_ply_structure(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    colors = np.array([[255, 0, 0]] * 3, np.uint8)
    path = tmp_path / "o.ply"
    write_ply(path, verts, colors, edges=[(0, 1), (1, 2)])
    text = path.read_text().splitlines()
    assert text[0] == "ply"
    assert "element vertex 3" in text
    assert "element edge 2" in text
    assert text[-1] == "1 2"


def test_bbox_wireframe():
    verts, edges = bbox_wireframe(
        np.array([0.1, 0.2, 0.3, 0.5, 0.6, 0.7]), np.array([10, 10, 10]))
    assert verts.shape == (8, 3)
    assert len(edges) == 12
    np.testing.assert_allclose(verts.min(0), [1, 2, 3])
    np.testing.assert_allclose(verts.max(0), [5, 6, 7])


def test_save_pred_visualization(tmp_path):
    seg = np.zeros((16, 16, 8), np.int32)
    seg[4:10, 4:10, 2:6] = 1
    boxes = np.array([[0.4, 0.4, 0.5, 0.3, 0.3, 0.4]], np.float32)
    save_pred_visualization(boxes, np.array([1]), np.array([0.9]),
                            boxes, np.array([1]), seg, tmp_path, case_id=0)
    assert (tmp_path / "case_0_seg.ply").exists()
    assert (tmp_path / "case_0_pred.ply").exists()
    assert (tmp_path / "case_0_gt.ply").exists()


def test_save_attn_visualization(tmp_path):
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16),
                      input_level="P2")
    rng = np.random.default_rng(0)
    S = 8 * 8 * 4
    Q = 14
    seg = np.zeros((32, 32, 16), np.int32)
    seg[4:12, 4:12, 2:8] = 1
    seg[16:24, 16:24, 8:14] = 2
    model_out = {
        "attn_weights": rng.uniform(size=(1, 4, Q, S)).astype(np.float32),
        "self_attn_weights": rng.uniform(size=(1, Q, Q)).astype(np.float32),
        "pred_logits": rng.normal(size=(1, Q, 1)).astype(np.float32),
    }
    save_attn_visualization(model_out, cfg, tmp_path, case_id=3, seg=seg)
    case = tmp_path / "case3"
    # reference export structure (visualization.py:222-308): self-attn
    # affinity PNG + per-class every-5th-frame seg/attn overlays
    assert (case / "case3_cdist.png").exists()
    for cls in (1, 2):
        cdir = case / f"class{cls}"
        assert (cdir / "frame0_attn.png").exists()
        assert (cdir / "frame0_seg.png").exists()
        assert (cdir / "frame5_attn.png").exists()


def test_model_returns_attn_capture():
    """return_weights must expose cross-attn, self-attn, and the backbone
    out-conv fmap (parity with reference scripts/test.py:74-84 hooks)."""
    import jax
    import jax.numpy as jnp

    from transoar_tpu.models.transoarnet import build_transoarnet

    cfg = tiny_config(num_organs=2, qpo=7, precision="float32")
    model = build_transoarnet(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x, deterministic=True, return_weights=True)
    Q = cfg["neck"]["num_queries"]
    S = 8 * 8 * 4
    assert out["attn_weights"].shape[-2:] == (Q, S)
    assert out["self_attn_weights"].shape == (1, Q, Q)
    assert out["backbone_fmap"].shape == (1, 8, 8, 4,
                                          cfg["backbone"]["fpn_channels"])
    # self-attn rows are a softmax -> sum to 1
    np.testing.assert_allclose(
        np.asarray(out["self_attn_weights"]).sum(-1), 1.0, atol=1e-4)

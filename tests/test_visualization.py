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
    S = 8 * 8 * 4
    attn = np.random.default_rng(0).uniform(
        size=(1, 4, 14, S)).astype(np.float32)
    save_attn_visualization(attn, cfg, tmp_path, case_id=3)
    assert (tmp_path / "case_3_organ_1.png").exists()
    assert (tmp_path / "case_3_organ_2.png").exists()

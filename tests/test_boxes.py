"""Box utility tests — golden values against hand-computed formulas and the
reference's semantics (transoar/utils/bboxes.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from transoar_tpu.utils import boxes as B


def test_format_roundtrip(rng):
    c = rng.uniform(0.2, 0.8, size=(7, 3)).astype(np.float32)
    s = rng.uniform(0.05, 0.3, size=(7, 3)).astype(np.float32)
    cbox = np.concatenate([c, s], axis=-1)
    corner = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(cbox))
    back = B.box_xyzxyz_to_cxcyczwhd(corner)
    np.testing.assert_allclose(np.asarray(back), cbox, atol=1e-6)


def test_iou_identical_and_disjoint():
    a = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
                   [2.0, 2.0, 2.0, 3.0, 3.0, 3.0],
                   [0.5, 0.0, 0.0, 1.5, 1.0, 1.0]])
    iou, union = B.box_iou_pairwise(a, b)
    np.testing.assert_allclose(np.asarray(iou[0]), [1.0, 0.0, 0.5 / 1.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(union[0]), [1.0, 2.0, 1.5], atol=1e-6)


def test_giou_matches_formula():
    # Two unit cubes offset by 0.5 along axis 0:
    # inter 0.5, union 1.5, iou 1/3; enclosing 1.5 -> giou = iou - 0 = 1/3.
    a = jnp.array([[0.5, 0.5, 0.5, 1.0, 1.0, 1.0]])  # cxcyczwhd
    b = jnp.array([[1.0, 0.5, 0.5, 1.0, 1.0, 1.0]])
    giou = B.generalized_box_iou_pairwise(
        B.box_cxcyczwhd_to_xyzxyz(a), B.box_cxcyczwhd_to_xyzxyz(b))
    np.testing.assert_allclose(np.asarray(giou), [[1 / 3]], atol=1e-5)

    # Disjoint cubes: iou 0, union 2, enclosing 3 -> giou = -(3-2)/3.
    c = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    d = jnp.array([[2.0, 0.0, 0.0, 3.0, 1.0, 1.0]])
    giou = B.generalized_box_iou_pairwise(c, d)
    np.testing.assert_allclose(np.asarray(giou), [[-1 / 3]], atol=1e-5)


def test_elementwise_matches_pairwise_diag(rng):
    lo = rng.uniform(0, 0.4, size=(5, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 0.5, size=(5, 3)).astype(np.float32)
    b1 = np.concatenate([lo, hi], -1)
    lo2 = rng.uniform(0, 0.4, size=(5, 3)).astype(np.float32)
    hi2 = lo2 + rng.uniform(0.1, 0.5, size=(5, 3)).astype(np.float32)
    b2 = np.concatenate([lo2, hi2], -1)

    g_pair = B.generalized_box_iou_pairwise(jnp.asarray(b1), jnp.asarray(b2))
    g_elem = B.generalized_box_iou_elementwise(jnp.asarray(b1), jnp.asarray(b2))
    np.testing.assert_allclose(np.diag(np.asarray(g_pair)), np.asarray(g_elem),
                               atol=1e-5)


def _synthetic_seg(shape=(32, 32, 16)):
    """Segmentation with class 1 box [4:14, 6:16, 2:10] and class 3 tiny."""
    seg = np.zeros(shape, np.int32)
    seg[4:14, 6:16, 2:10] = 1
    seg[20:23, 20:23, 12:14] = 3  # extent 3/3/2 < 5 -> filtered
    return seg


def test_segmentation2bbox_matches_np_reference():
    seg = _synthetic_seg()
    boxes, present = B.segmentation2bbox(jnp.asarray(seg)[None], num_classes=4,
                                         padding=1)
    boxes, present = np.asarray(boxes), np.asarray(present)

    assert present[0].tolist() == [True, False, False, False]

    # Reference semantics: min=4-1=3, max=13+1=14 (index max) clipped to shape,
    # normalized by shape.
    shape = np.array(seg.shape, np.float32)
    lo = np.array([3, 5, 1]) / shape
    hi = np.array([14, 16, 10]) / shape
    expected = np.concatenate([(lo + hi) / 2, hi - lo])
    np.testing.assert_allclose(boxes[0, 0], expected, atol=1e-6)

    # Host-side ragged variant agrees.
    nb, nc = B.segmentation2bbox_np(seg, padding=1)
    assert nc.tolist() == [1]
    np.testing.assert_allclose(nb[0], expected, atol=1e-6)


def test_segmentation2bbox_small_box_kept_when_threshold_lowered():
    seg = _synthetic_seg()
    _, present = B.segmentation2bbox(jnp.asarray(seg)[None], num_classes=4,
                                     padding=0, min_extent=1)
    assert np.asarray(present)[0].tolist() == [True, False, True, False]


def test_iou_np_agrees_with_jax(rng):
    c = rng.uniform(0.3, 0.7, size=(4, 3)).astype(np.float32)
    s = rng.uniform(0.1, 0.3, size=(4, 3)).astype(np.float32)
    cboxes = np.concatenate([c, s], -1)
    corner = B.box_cxcyczwhd_to_xyzxyz(cboxes)
    iou_np = B.box_iou_np(cboxes, cboxes, box_format="cxcyczwhd")
    iou_j, _ = B.box_iou_pairwise(jnp.asarray(corner), jnp.asarray(corner))
    np.testing.assert_allclose(iou_np, np.asarray(iou_j), atol=1e-5)


@pytest.mark.parametrize("batch", [1, 3])
def test_segmentation2bbox_batched(batch):
    seg = np.stack([_synthetic_seg()] * batch)
    boxes, present = B.segmentation2bbox(jnp.asarray(seg), num_classes=4)
    assert boxes.shape == (batch, 4, 6)
    assert present.shape == (batch, 4)

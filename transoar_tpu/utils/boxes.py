"""3D bounding-box utilities (JAX).

Functional equivalents of the reference's ``transoar/utils/bboxes.py``
(iou_3d: bboxes.py:98-133, generalized_bbox_iou_3d: bboxes.py:6-29,
box_cxcyczwhd_to_xyzxyz: bboxes.py:31-43, segmentation2bbox: bboxes.py:45-96),
re-designed for TPU: everything is fixed-shape, vectorized and jittable — the
reference's per-class ``nonzero`` loops become one-hot masked min/max
reductions so box extraction runs on-device inside the training step.

Coordinate convention: boxes live in the array-axis order of the stored
volume — coordinate 0 indexes spatial axis 0, etc. (the reference calls these
x/y/z). Corner format is ``(x1, y1, z1, x2, y2, z2)``; center format is
``(cx, cy, cz, w, h, d)``. Normalized coordinates are in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def box_cxcyczwhd_to_xyzxyz(boxes):
    """Center format -> corner format. Works on jnp or np arrays [..., 6]."""
    xp = jnp if isinstance(boxes, jax.Array) else np
    c, s = boxes[..., :3], boxes[..., 3:]
    return xp.concatenate([c - 0.5 * s, c + 0.5 * s], axis=-1)


def box_xyzxyz_to_cxcyczwhd(boxes):
    """Corner format -> center format. Works on jnp or np arrays [..., 6]."""
    xp = jnp if isinstance(boxes, jax.Array) else np
    lo, hi = boxes[..., :3], boxes[..., 3:]
    return xp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def box_volume(boxes):
    """Volume of corner-format boxes [..., 6] -> [...]."""
    d = boxes[..., 3:] - boxes[..., :3]
    return d[..., 0] * d[..., 1] * d[..., 2]


def box_iou_pairwise(boxes1, boxes2, eps=0.0):
    """Pairwise IoU of corner-format boxes.

    Mirrors reference ``iou_3d`` (bboxes.py:98-133) but broadcasts over
    arbitrary leading dims: boxes1 [..., N, 6], boxes2 [..., M, 6] ->
    (iou [..., N, M], union [..., N, M]).
    """
    v1 = box_volume(boxes1)  # [..., N]
    v2 = box_volume(boxes2)  # [..., M]

    lo = jnp.maximum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
    hi = jnp.minimum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
    delta = jnp.clip(hi - lo, 0.0)
    inter = delta[..., 0] * delta[..., 1] * delta[..., 2]

    union = v1[..., :, None] + v2[..., None, :] - inter
    iou = inter / (union + eps)
    return iou, union


def generalized_box_iou_pairwise(boxes1, boxes2, eps=1e-7):
    """Pairwise 3D GIoU of corner-format boxes [..., N, 6] x [..., M, 6].

    Mirrors reference ``generalized_bbox_iou_3d`` (bboxes.py:6-29):
    ``giou = iou - (vol_enclosing - union) / vol_enclosing``. The reference
    divides by the raw enclosing volume; we add ``eps`` for NaN-safety under
    jit (degenerate zero-volume pairs).
    """
    iou, union = box_iou_pairwise(boxes1, boxes2, eps=eps)

    lo = jnp.minimum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
    hi = jnp.maximum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
    delta = jnp.clip(hi - lo, 0.0)
    vol = delta[..., 0] * delta[..., 1] * delta[..., 2]

    return iou - (vol - union) / (vol + eps)


def box_iou_elementwise(boxes1, boxes2, eps=0.0):
    """Element-wise IoU of corner-format boxes with identical shape [..., 6]."""
    v1 = box_volume(boxes1)
    v2 = box_volume(boxes2)
    lo = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    hi = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    delta = jnp.clip(hi - lo, 0.0)
    inter = delta[..., 0] * delta[..., 1] * delta[..., 2]
    union = v1 + v2 - inter
    return inter / (union + eps), union


def generalized_box_iou_elementwise(boxes1, boxes2, eps=1e-7):
    """Element-wise 3D GIoU of corner-format boxes with identical shape [..., 6].

    Avoids the reference's pattern of building an [N, N] pairwise matrix and
    taking the diagonal (criterion.py:69-72) — on TPU the diagonal of a large
    pairwise GIoU wastes N× the FLOPs and HBM traffic.
    """
    iou, union = box_iou_elementwise(boxes1, boxes2, eps=eps)
    lo = jnp.minimum(boxes1[..., :3], boxes2[..., :3])
    hi = jnp.maximum(boxes1[..., 3:], boxes2[..., 3:])
    delta = jnp.clip(hi - lo, 0.0)
    vol = delta[..., 0] * delta[..., 1] * delta[..., 2]
    return iou - (vol - union) / (vol + eps)


def segmentation2bbox(seg, num_classes, padding=1, min_extent=5, normalize=True):
    """Derive per-class bounding boxes from an integer segmentation volume.

    TPU-native replacement for reference ``segmentation2bbox``
    (bboxes.py:45-96). The reference loops over the classes present in each
    map and calls ``nonzero`` (dynamic shapes, host sync); here every class
    gets a fixed slot and the min/max corner reduction is a masked reduction,
    so the whole thing is one fused XLA computation with static shapes:

      boxes   [B, num_classes, 6]  (cxcyczwhd, normalized if ``normalize``)
      present [B, num_classes]     bool — class occupies >= ``min_extent``
                                   voxels per axis (reference's ``< 5`` filter,
                                   bboxes.py:61) and appears in the volume.

    Class id ``c`` (1-based in the segmentation) fills slot ``c - 1``.

    Args:
      seg: [B, S0, S1, S2] integer labels, 0 = background.
      num_classes: static number of foreground classes.
      padding: voxels added on each side before clipping (bboxes.py:65-66).
      min_extent: boxes thinner than this (pre-padding) are marked absent.
      normalize: divide coordinates by the spatial shape (bboxes.py:72-74).
    """
    if seg.ndim != 4:
        raise ValueError(f"expected [B, S0, S1, S2] labels, got {seg.shape}")
    spatial = seg.shape[1:]
    big = np.array(spatial, dtype=np.float32)

    # [B, C, S0, S1, S2] one-hot presence per class (classes are 1-based).
    cls_ids = jnp.arange(1, num_classes + 1, dtype=seg.dtype)
    onehot = seg[:, None] == cls_ids[None, :, None, None, None]

    mins, maxs = [], []
    for axis in range(3):
        # Index grid along this axis, broadcast over the volume.
        idx_shape = [1, 1, 1, 1, 1]
        idx_shape[2 + axis] = spatial[axis]
        idx = jnp.arange(spatial[axis], dtype=jnp.float32).reshape(idx_shape)
        reduce_axes = tuple(a for a in (2, 3, 4))
        mins.append(jnp.min(jnp.where(onehot, idx, big[axis]), axis=reduce_axes))
        maxs.append(jnp.max(jnp.where(onehot, idx, -1.0), axis=reduce_axes))

    lo = jnp.stack(mins, axis=-1)  # [B, C, 3]
    hi = jnp.stack(maxs, axis=-1)  # [B, C, 3]

    count = jnp.any(onehot, axis=(2, 3, 4))
    extent_ok = jnp.all((hi - lo) >= min_extent, axis=-1)
    present = count & extent_ok

    lo = jnp.clip(lo - padding, 0.0)
    hi = jnp.minimum(hi + padding, big[None, None])

    if normalize:
        lo = lo / big[None, None]
        hi = hi / big[None, None]

    boxes = jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)
    boxes = jnp.where(present[..., None], boxes, 0.0)
    return boxes, present


# ---------------------------------------------------------------------------
# NumPy variants for the host-side evaluator / preprocessor.
# ---------------------------------------------------------------------------

def box_iou_np(boxes1, boxes2, box_format="cxcyczwhd"):
    """Pairwise IoU on numpy arrays [N, 6] x [M, 6] -> [N, M].

    Mirrors reference ``iou_3d_np`` (bboxes.py:150-186), used by the
    evaluator's greedy matching on host.
    """
    if box_format == "cxcyczwhd":
        boxes1 = box_cxcyczwhd_to_xyzxyz(np.asarray(boxes1))
        boxes2 = box_cxcyczwhd_to_xyzxyz(np.asarray(boxes2))

    d1 = boxes1[:, 3:] - boxes1[:, :3]
    d2 = boxes2[:, 3:] - boxes2[:, :3]
    v1 = d1[:, 0] * d1[:, 1] * d1[:, 2]
    v2 = d2[:, 0] * d2[:, 1] * d2[:, 2]

    lo = np.maximum(boxes1[:, None, :3], boxes2[None, :, :3])
    hi = np.minimum(boxes1[:, None, 3:], boxes2[None, :, 3:])
    delta = np.clip(hi - lo, 0, None)
    inter = delta[..., 0] * delta[..., 1] * delta[..., 2]
    union = v1[:, None] + v2[None, :] - inter
    return inter / union


def segmentation2bbox_np(seg, padding=1, min_extent=5, normalize=True,
                         box_format="cxcyczwhd"):
    """Host-side ragged variant returning (boxes [K, 6], classes [K]).

    Used by the offline preprocessor for dataset statistics, mirroring the
    reference's per-case call (preprocessor_amos.py:99). Unlike the on-device
    ``segmentation2bbox`` this returns only the classes actually present.
    """
    seg = np.asarray(seg)
    assert seg.ndim == 3, f"expected [S0, S1, S2], got {seg.shape}"
    shape = np.array(seg.shape, dtype=np.float32)

    boxes, classes = [], []
    for cls in np.unique(seg)[1:] if (np.unique(seg)[:1] == [0]).all() else np.unique(seg):
        if cls == 0:
            continue
        idx = np.stack(np.nonzero(seg == cls), axis=-1).astype(np.float32)
        lo, hi = idx.min(axis=0), idx.max(axis=0)
        if ((hi - lo) < min_extent).any():
            continue
        lo = np.clip(lo - padding, 0, None)
        hi = np.minimum(hi + padding, shape)
        if normalize:
            lo, hi = lo / shape, hi / shape
        if box_format == "cxcyczwhd":
            boxes.append(np.concatenate([(lo + hi) / 2, hi - lo]))
        else:
            boxes.append(np.concatenate([lo, hi]))
        classes.append(int(cls))
    if boxes:
        return np.stack(boxes), np.array(classes)
    return np.zeros((0, 6), np.float32), np.zeros((0,), np.int64)

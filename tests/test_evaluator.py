"""Evaluator tests: hand-computed AP cases + randomized parity against the
reference implementation (imported from /root/reference, which is pure
numpy/torch on the evaluation path)."""

import sys

import numpy as np
import pytest

from transoar_tpu.eval.evaluator import DetectionEvaluator


def make_evaluator(num_classes=3, per_class=False):
    labels = {str(i + 1): f"c{i + 1}" for i in range(num_classes)}
    subsets = [{"1": "c1"}, {"2": "c2"}, {str(num_classes): f"c{num_classes}"}]
    subsets = [s if all(int(k) <= num_classes for k in s) else {"1": "c1"}
               for s in subsets]
    return DetectionEvaluator(
        classes=list(labels.values()),
        classes_small=subsets[0],
        classes_mid=subsets[1],
        classes_large=subsets[2],
        per_class=per_class,
    )


def _box(c, s=0.2):
    c = np.asarray(c, float)
    return np.array([*c, s, s, s])


def test_perfect_predictions_give_ap_1():
    ev = make_evaluator(num_classes=2)
    gt = np.stack([_box([0.3, 0.3, 0.3]), _box([0.7, 0.7, 0.7])])
    ev.add(
        pred_boxes=[gt.copy()],
        pred_classes=[np.array([1, 2])],
        pred_scores=[np.array([0.9, 0.8])],
        gt_boxes=[gt],
        gt_classes=[np.array([1, 2])],
    )
    scores = ev.eval()
    assert scores["mAP_coco"] == pytest.approx(1.0)
    assert scores["mAP_nndet"] == pytest.approx(1.0)
    assert scores["AP_IoU_0.50"] == pytest.approx(1.0)


def test_miss_gives_zero_for_that_class():
    ev = make_evaluator(num_classes=2)
    gt = np.stack([_box([0.3, 0.3, 0.3]), _box([0.7, 0.7, 0.7])])
    preds = np.stack([gt[0], _box([0.1, 0.1, 0.9])])  # class 2 far off
    ev.add([preds], [np.array([1, 2])], [np.array([0.9, 0.8])],
           [gt], [np.array([1, 2])])
    scores = ev.eval()
    # class 1 perfect, class 2 zero -> mean 0.5
    assert scores["AP_IoU_0.10"] == pytest.approx(0.5)
    assert scores["mAP_coco_s"] == pytest.approx(1.0)   # subset {1}
    assert scores["mAP_coco_m"] == pytest.approx(0.0)   # subset {2}


def test_absent_class_counts_as_zero():
    # 3 classes registered, only 1 ever appears (perfectly) -> mAP = 1/3.
    ev = make_evaluator(num_classes=3)
    gt = _box([0.5, 0.5, 0.5])[None]
    ev.add([gt.copy()], [np.array([1])], [np.array([0.9])],
           [gt], [np.array([1])])
    assert ev.eval()["mAP_coco"] == pytest.approx(1 / 3)


def test_shifted_box_ap_depends_on_threshold():
    # Overlap iou = 0.25/0.75 ≈ 0.333: counts at IoU 0.1 but not 0.5.
    ev = make_evaluator(num_classes=1)
    gt = np.array([[0.5, 0.5, 0.5, 0.2, 0.2, 0.2]])
    pred = np.array([[0.6, 0.5, 0.5, 0.2, 0.2, 0.2]])
    ev.add([pred], [np.array([1])], [np.array([0.9])], [gt], [np.array([1])])
    scores = ev.eval()
    assert scores["AP_IoU_0.10"] == pytest.approx(1.0)
    assert scores["AP_IoU_0.50"] == pytest.approx(0.0)


def _random_case(rng, num_classes, num_images):
    """Random predictions/GT in the 1-box-per-class regime."""
    preds, pcls, pscores, gts, gcls = [], [], [], [], []
    for _ in range(num_images):
        classes = np.arange(1, num_classes + 1)
        present = rng.uniform(size=num_classes) > 0.2
        g = np.stack([
            np.concatenate([rng.uniform(0.3, 0.7, 3),
                            rng.uniform(0.1, 0.3, 3)])
            for _ in range(num_classes)])
        p = g + rng.normal(scale=0.05, size=g.shape)
        p[:, 3:] = np.abs(p[:, 3:]) + 0.01
        preds.append(p)
        pcls.append(classes.copy())
        pscores.append(rng.uniform(0.1, 1.0, num_classes))
        gts.append(g[present])
        gcls.append(classes[present])
    return preds, pcls, pscores, gts, gcls


def test_parity_with_reference_implementation():
    """Randomized golden test against the reference evaluator/metric."""
    sys.path.insert(0, "/root/reference")
    try:
        from transoar.evaluator import DetectionEvaluator as RefEvaluator
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference evaluator unavailable: {e}")
    finally:
        sys.path.pop(0)

    num_classes = 4
    labels = {str(i + 1): f"c{i + 1}" for i in range(num_classes)}
    small, mid, large = {"1": "c1"}, {"2": "c2", "3": "c3"}, {"4": "c4"}

    ref = RefEvaluator(
        classes=list(labels.values()), classes_small=small, classes_mid=mid,
        classes_large=large, iou_range_coco=(0.5, 0.95, 0.05),
        iou_range_nndet=(0.1, 0.5, 0.05), sparse_results=True)
    ours = DetectionEvaluator(
        classes=list(labels.values()), classes_small=small, classes_mid=mid,
        classes_large=large)

    rng = np.random.default_rng(42)
    preds, pcls, pscores, gts, gcls = _random_case(rng, num_classes, 12)
    ref.add(pred_boxes=[p.copy() for p in preds],
            pred_classes=[c.copy() for c in pcls],
            pred_scores=[s.copy() for s in pscores],
            gt_boxes=[g.copy() for g in gts],
            gt_classes=[c.copy() for c in gcls])
    ours.add(preds, pcls, pscores, gts, gcls)

    ref_scores = ref.eval()
    our_scores = ours.eval()
    for key in ["mAP_coco", "mAP_coco_s", "mAP_coco_m", "mAP_coco_l",
                "mAP_nndet", "AP_IoU_0.10", "AP_IoU_0.50", "AP_IoU_0.75"]:
        assert our_scores[key] == pytest.approx(ref_scores[key], abs=1e-9), key

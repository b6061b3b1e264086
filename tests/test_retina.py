"""RetinaNet branch tests: NMS correctness, anchor generation, delta
encode/decode roundtrip, focal loss, end-to-end forward + criterion."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.models.retina import (RetinaCriterion, build_anchors,
                                        build_retinanet, decode_deltas,
                                        encode_deltas,
                                        generate_level_anchors,
                                        retina_inference,
                                        sigmoid_focal_loss)
from transoar_tpu.ops.nms import nms_3d


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        [0.05, 0.0, 0.0, 1.05, 1.0, 1.0],   # IoU ~0.9 with box 0
        [2.0, 2.0, 2.0, 3.0, 3.0, 3.0],     # disjoint
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, valid = nms_3d(boxes, scores, iou_threshold=0.5, max_out=3)
    keep, valid = np.asarray(keep), np.asarray(valid)
    assert keep[valid].tolist() == [0, 2]


def test_nms_score_threshold_and_order():
    boxes = jnp.asarray([[0, 0, 0, 1, 1, 1],
                         [3, 3, 3, 4, 4, 4],
                         [6, 6, 6, 7, 7, 7]], jnp.float32)
    scores = jnp.asarray([0.2, 0.9, 0.01])
    keep, valid = nms_3d(boxes, scores, iou_threshold=0.5, max_out=3,
                         score_threshold=0.1)
    keep = np.asarray(keep)[np.asarray(valid)]
    assert keep.tolist() == [1, 0]  # score order, third filtered


def test_batched_class_nms_keeps_cross_class_overlaps():
    from transoar_tpu.ops.nms import batched_class_nms

    # identical boxes in different classes must NOT suppress each other;
    # same-class overlap must.
    boxes = jnp.asarray([
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],    # class 1: same box, kept
        [0.05, 0.0, 0.0, 1.05, 1.0, 1.0],  # class 0: IoU ~0.9, suppressed
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 1, 0])
    keep, valid = batched_class_nms(boxes, scores, classes,
                                    iou_threshold=0.5, max_out=3)
    keep = np.asarray(keep)[np.asarray(valid)]
    assert sorted(keep.tolist()) == [0, 1]


def test_anchor_generation_counts_and_range():
    a = generate_level_anchors([32, 32, 16], level=2,
                               scales=[8, 16], ratios=[[1, 1, 1],
                                                      [1.5, 1, 0.7]])
    shape = (8, 8, 4)
    assert a.shape == (np.prod(shape) * 4, 6)
    assert (a[:, :3] >= 0).all() and (a[:, :3] <= 1).all()
    assert (a[:, 3:] > 0).all()


def test_delta_roundtrip(rng):
    anchors = jnp.asarray(np.concatenate([
        rng.uniform(0.3, 0.7, (10, 3)), rng.uniform(0.1, 0.3, (10, 3))],
        -1).astype(np.float32))
    boxes = jnp.asarray(np.concatenate([
        rng.uniform(0.3, 0.7, (10, 3)), rng.uniform(0.1, 0.3, (10, 3))],
        -1).astype(np.float32))
    deltas = encode_deltas(boxes, anchors)
    back = decode_deltas(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                               atol=1e-5)


def test_focal_loss_downweights_easy():
    easy_neg = sigmoid_focal_loss(jnp.asarray(-5.0), jnp.asarray(0.0))
    hard_neg = sigmoid_focal_loss(jnp.asarray(5.0), jnp.asarray(0.0))
    assert float(easy_neg) < float(hard_neg) / 100


def _retina_cfg():
    cfg = tiny_config(num_organs=3, qpo=1, precision="float32")
    cfg["retina"] = {
        "levels": ["P2", "P3"],
        "anchor_scales": [8, 12],
        "anchor_ratios": [[1, 1, 1]],
        "tower_depth": 1,
        "tower_channels": 8,
        "pos_iou": 0.4,
        "neg_iou": 0.3,
    }
    cfg["backbone"]["out_fmaps"] = ["P2", "P3"]
    return cfg


def test_retinanet_forward_and_losses():
    cfg = _retina_cfg()
    model = build_retinanet(cfg)
    anchors, counts = build_anchors(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    A = sum(counts)
    assert out["anchor_logits"].shape == (1, A, 3)
    assert out["anchor_deltas"].shape == (1, A, 6)

    crit = RetinaCriterion(cfg)
    # one big GT box so some anchors match positively
    targets = {
        "boxes": jnp.asarray([[[0.5, 0.5, 0.5, 0.4, 0.4, 0.45],
                               [0.2, 0.2, 0.2, 0.3, 0.32, 0.3],
                               [0, 0, 0, 0, 0, 0]]], jnp.float32),
        "present": jnp.asarray([[True, True, False]]),
    }
    losses = jax.jit(lambda o, t: crit(o, t, jnp.asarray(model.anchors)))(
        out, targets)
    for key in ("cls", "bbox", "giou"):
        val = float(losses[key])
        assert np.isfinite(val) and val >= 0

    # inference produces evaluator-compatible ragged lists
    boxes, classes, scores = retina_inference(
        jax.device_get(out), model.anchors, num_classes=3, max_out=5)
    assert len(boxes) == 1
    assert boxes[0].shape[1] == 6
    assert len(classes[0]) == len(scores[0]) == len(boxes[0])


def test_retina_tower_conv_variants_equal():
    """`retina.tower_conv: native` must compute the identical model (the
    decomposed and native conv paths are the same convolution; the knob
    only changes how it lowers — measured per-config, PERFORMANCE.md)."""
    cfg = _retina_cfg()
    model = build_retinanet(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)

    cfg_native = _retina_cfg()
    cfg_native["retina"]["tower_conv"] = "native"
    model_native = build_retinanet(cfg_native)
    out_native = model_native.apply(params, x)

    np.testing.assert_allclose(out["anchor_logits"],
                               out_native["anchor_logits"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out["anchor_deltas"],
                               out_native["anchor_deltas"],
                               rtol=1e-5, atol=1e-5)


def test_retina_grad_accum_matches_batched():
    """microbatch='grads' for RetinaCriterion: the focal/L1/GIoU numerators
    are per-sample and the single batch-coupled denominator (num_pos) is a
    pure function of targets+anchors, precomputed batch-globally
    (batch_normalizer) — per-sample fwd+bwd sums must reproduce the batched
    losses and parameter update."""
    from tests.helpers import synthetic_batch
    from transoar_tpu.models.retina import build_retinanet
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import make_train_step

    cfg = _retina_cfg()
    model = build_retinanet(cfg)
    example = jnp.zeros((3, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=3, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = RetinaCriterion(cfg)
    assert crit.grads_scan_exact
    rng = jax.random.key(5)

    results = {}
    for flag in (False, "grads"):
        cfg_i = {**cfg, "trainer": {**cfg["trainer"], "microbatch": flag}}
        state = create_train_state(model, cfg_i, example, jax.random.key(0),
                                   4)
        step = jax.jit(make_train_step(model, crit, cfg_i, model.anchors))
        state, losses = step(state, batch, rng)
        results[flag] = (losses, state.params)

    for key in results[False][0]:
        np.testing.assert_allclose(
            float(results[False][0][key]), float(results["grads"][0][key]),
            rtol=2e-4, err_msg=key)
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results["grads"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

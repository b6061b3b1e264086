"""DETR branch tests: auction Hungarian vs scipy, decoder forwards, set
criterion behavior."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from tests.helpers import tiny_config
from transoar_tpu.models.criterion import build_criterion
from transoar_tpu.models.detr import SetCriterion
from transoar_tpu.models.hungarian import auction_assignment, hungarian_match
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training.inference import inference


def test_auction_matches_scipy_cost(rng):
    for trial in range(10):
        G, Q = 5, 20
        cost = rng.normal(size=(G, Q)).astype(np.float32) * 3
        ours = np.asarray(auction_assignment(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        ours_cost = cost[np.arange(G), ours].sum()
        opt_cost = cost[rows, cols].sum()
        # auction is eps-optimal; assignments must be valid and near-optimal
        assert len(set(ours.tolist())) == G  # one-to-one
        assert ours_cost <= opt_cost + 0.05 * abs(opt_cost) + 0.1


def test_auction_with_invalid_rows(rng):
    cost = rng.normal(size=(4, 10)).astype(np.float32)
    valid = np.array([True, False, True, False])
    out = np.asarray(auction_assignment(jnp.asarray(cost),
                                        jnp.asarray(valid)))
    assert out[1] == -1 and out[3] == -1
    assert out[0] != out[2] and out[0] >= 0 and out[2] >= 0


def test_hungarian_batched(rng):
    cost = rng.normal(size=(3, 4, 12)).astype(np.float32)
    out = np.asarray(hungarian_match(jnp.asarray(cost)))
    assert out.shape == (3, 4)
    for b in range(3):
        assert len(set(out[b].tolist())) == 4


def _detr_cfg(name="detr", organs=3):
    cfg = tiny_config(num_organs=organs, qpo=7, precision="float32")
    cfg["neck"]["name"] = name
    cfg["neck"]["num_queries"] = 12
    cfg["neck"]["anchor_offset_pred"] = False
    cfg["matching"].update({"cost_class": 2, "cost_bbox": 5, "cost_giou": 2,
                            "eos_coef": 0.1})
    if name == "def_detr":
        cfg["neck"]["feature_levels"] = ["P2", "P3"]
        cfg["neck"]["n_points"] = 2
        cfg["neck"]["nheads"] = 6  # directional init needs 6 or 26 heads
        cfg["backbone"]["out_fmaps"] = ["P2", "P3"]
    return cfg


def test_detr_forward_and_criterion():
    cfg = _detr_cfg("detr")
    model = build_transoarnet(cfg)
    x = jnp.zeros((2, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["pred_logits"].shape == (2, 12, 4)  # organs + no-object
    assert out["pred_boxes"].shape == (2, 12, 6)

    crit = build_criterion(cfg)
    assert isinstance(crit, SetCriterion)
    targets = {
        "boxes": jnp.asarray(np.tile(
            np.array([[0.4, 0.4, 0.4, 0.2, 0.2, 0.2]] * 3, np.float32),
            (2, 1, 1))),
        "present": jnp.ones((2, 3), bool),
    }
    losses = jax.jit(lambda o, t: crit(o, t, None))(out, targets)
    for key in ("cls", "bbox", "giou", "cls_0", "bbox_0"):
        assert np.isfinite(float(losses[key])), key


def test_detr_attention_weights_export():
    """--save_attn_map support: the DETR neck returns the last layer's
    head-averaged cross-attention (rows sum to 1 over source tokens)."""
    cfg = _detr_cfg("detr")
    model = build_transoarnet(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x, return_weights=True)
    w = out["attn_weights"]
    assert w is not None
    lvl = cfg["neck"]["input_levels"]
    stage = int(lvl[-1])
    tokens = (32 >> stage) * (32 >> stage) * (16 >> stage)
    assert w.shape == (1, cfg["neck"]["num_queries"], tokens)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-3)


def test_def_detr_forward():
    cfg = _detr_cfg("def_detr")
    model = build_transoarnet(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["pred_logits"].shape == (1, 12, 4)
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_detr_inference_softmax_path():
    logits = np.zeros((1, 4, 3), np.float32)  # 2 classes + no-object
    logits[0, 2, 1] = 5.0  # query 2 -> class 1
    logits[0, 3, 2] = 4.0  # query 3 -> class 2
    boxes = np.random.default_rng(0).uniform(size=(1, 4, 6)).astype(
        np.float32)
    out = {"pred_logits": jnp.asarray(logits), "pred_boxes":
           jnp.asarray(boxes)}
    b, c, s = inference(out, num_organs=2)
    assert c[0].tolist() == [1, 2]
    np.testing.assert_allclose(b[0][0], boxes[0, 2])
    np.testing.assert_allclose(b[0][1], boxes[0, 3])


def test_set_criterion_learns_assignment(rng):
    """Perfect predictions at matched queries -> near-zero box losses."""
    cfg = _detr_cfg("detr")
    crit = SetCriterion(cfg)
    G, Q = 3, 12
    tgt_boxes = np.array([[0.3, 0.3, 0.3, 0.2, 0.2, 0.2],
                          [0.6, 0.6, 0.6, 0.25, 0.2, 0.2],
                          [0.5, 0.2, 0.7, 0.15, 0.2, 0.1]], np.float32)
    boxes = np.tile(np.array([0.1, 0.1, 0.1, 0.05, 0.05, 0.05], np.float32),
                    (1, Q, 1))
    boxes[0, 4] = tgt_boxes[0]
    boxes[0, 7] = tgt_boxes[1]
    boxes[0, 9] = tgt_boxes[2]
    logits = np.zeros((1, Q, G + 1), np.float32)
    logits[:, :, 0] = 3.0
    logits[0, 4, 1] = 6.0
    logits[0, 7, 2] = 6.0
    logits[0, 9, 3] = 6.0

    losses = crit({"pred_logits": jnp.asarray(logits),
                   "pred_boxes": jnp.asarray(boxes)},
                  {"boxes": jnp.asarray(tgt_boxes[None]),
                   "present": jnp.ones((1, G), bool)}, None)
    assert float(losses["bbox"]) < 1e-4
    assert float(losses["giou"]) < 1e-3
    assert float(losses["cls"]) < 0.1


def test_set_criterion_absent_slot_does_not_clobber_query0():
    """Regression: absent GT slots (assign=-1) used to be clipped to index 0
    and scattered no-object onto query 0, silently erasing a real match
    there. Query 0 matched to class 1 + classes 2/3 absent must yield a
    near-zero cls loss when query 0 confidently predicts class 1."""
    cfg = _detr_cfg("detr")
    crit = SetCriterion(cfg)
    G, Q = 3, 12
    tgt_boxes = np.zeros((1, G, 6), np.float32)
    tgt_boxes[0, 0] = [0.3, 0.3, 0.3, 0.2, 0.2, 0.2]
    present = np.array([[True, False, False]])

    boxes = np.tile(np.array([0.8, 0.8, 0.8, 0.05, 0.05, 0.05], np.float32),
                    (1, Q, 1))
    boxes[0, 0] = tgt_boxes[0, 0]  # query 0 is the only sensible match
    logits = np.zeros((1, Q, G + 1), np.float32)
    logits[:, :, 0] = 6.0
    logits[0, 0] = [0.0, 6.0, 0.0, 0.0]  # query 0 -> class 1, confidently

    losses = crit({"pred_logits": jnp.asarray(logits),
                   "pred_boxes": jnp.asarray(boxes)},
                  {"boxes": jnp.asarray(tgt_boxes),
                   "present": jnp.asarray(present)}, None)
    # with the clipping bug the target for query 0 flips to no-object and
    # cls explodes (>1); correct behavior is near-zero CE everywhere
    assert float(losses["cls"]) < 0.05
    assert float(losses["bbox"]) < 1e-4


def test_detr_grad_accum_matches_batched():
    """microbatch='grads' for SetCriterion: per-sample Hungarian matching is
    independent across rows, and both batch-coupled denominators (the CE
    weight sum and num_boxes) are pure functions of the present-count,
    precomputed batch-globally (batch_normalizer) — per-sample fwd+bwd
    sums must reproduce the batched losses and parameter update."""
    from tests.helpers import synthetic_batch
    from transoar_tpu.models.detr import SetCriterion
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import make_train_step

    cfg = _detr_cfg("detr")
    cfg["neck"]["dropout"] = 0.0
    model = build_transoarnet(cfg)
    example = jnp.zeros((3, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=3, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = SetCriterion(cfg)
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

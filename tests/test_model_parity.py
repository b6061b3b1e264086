"""Full-model golden parity vs the reference torch implementation.

Imports the ACTUAL reference TransoarNet / TransoarCriterion from
/root/reference (torch CPU), maps its weights onto the flax model, and
asserts the composed network agrees end to end:

- anchors / offset restrictions (reference transoarnet.py:60-117, incl. the
  in-place ``restrictions[:, :3] /= 2`` at :29),
- forward pred_logits / pred_boxes + aux outputs (transoarnet.py:119-155):
  CNN encoder (InstanceNorm semantics, torch conv padding alignment), FPN
  decoder, sine positional encoding, FocusedDecoder (shared-QK quirk,
  attention masks), anchor-offset box decode,
- criterion losses (criterion.py:92-125) incl. the seg proxy
  (CE + nnU-Net SoftDice, criterion.py:77-89,127-205).

The reference imports timm only for DropPath/trunc_normal_; a minimal stub
is injected. ``.cuda()`` calls are no-op'd (CPU-only image).

Known conscious fix NOT asserted equal: the reference computes aux bbox/giou
losses on the FINAL outputs with aux matches (criterion.py:118 passes
``outputs``); we use the aux layer's own boxes. Aux cls losses (which the
reference computes correctly) are asserted equal.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from tests.helpers import tiny_config
from transoar_tpu.models.transoarnet import build_transoarnet


def _stub_timm():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    tl.DropPath = DropPath
    tl.trunc_normal_ = trunc_normal_
    timm.models = tm
    tm.layers = tl
    sys.modules.update({"timm": timm, "timm.models": tm,
                        "timm.models.layers": tl})


def _import_reference():
    _stub_timm()
    torch.Tensor.cuda = lambda self, *a, **k: self
    tnn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from transoar.models.criterion import TransoarCriterion
    from transoar.models.matcher import Matcher
    from transoar.models.transoarnet import TransoarNet
    return TransoarNet, TransoarCriterion, Matcher


def _ref_config(cfg):
    """Reference-format config dict from our tiny config."""
    bb = cfg["backbone"]
    num_stages = bb["num_stages"]
    swin = bb.get("swin", {})
    out = {
        "backbone": {
            "in_channels": bb["in_channels"],
            "start_channels": bb["start_channels"],
            "conv_kernels": [3] * num_stages,
            "strides": bb["strides"],
            "fpn_channels": bb["fpn_channels"],
            "out_fmaps": bb["out_fmaps"],
            "feature_levels": [],
            "use_encoder_attn": bb.get("use_encoder_attn", False),
            "use_decoder_attn": False,
            "use_seg_proxy_loss": bb["use_seg_proxy_loss"],
            "fg_bg": bb["fg_bg"],
            "depths": list(swin.get("depths", [1, 1])),
            "num_heads": list(swin.get("num_heads", [2, 2])),
            "window_size": tuple(swin.get("window_size", (2, 2, 2))),
            "mlp_ratio": swin.get("mlp_ratio", 4),
            "qkv_bias": swin.get("qkv_bias", True),
            "qk_scale": None,
            "drop_rate": 0.0,
            "attn_drop_rate": 0.0,
            "drop_path_rate": swin.get("drop_path_rate", 0.0),
            "conv_merging": swin.get("conv_merging", False),
        },
        "neck": dict(cfg["neck"]),
        "bbox_properties": cfg["bbox_properties"],
    }
    if bb.get("use_decoder_attn"):
        _add_refine(out, cfg)
    return out


def _add_refine(ref_cfg, cfg):
    """Enable the deformable FPN refinement on the reference config."""
    da = cfg["backbone"]["def_attn"]
    ref_cfg["backbone"].update({
        "use_decoder_attn": True,
        "feature_levels": list(da["feature_levels"]),
        "pos_encoding": da.get("pos_encoding", "sine"),
        "hidden_dim": da["hidden_dim"],
        "nheads": da["nheads"],
        "layers": da["layers"],
        "dim_feedforward": da["dim_feedforward"],
        "dropout": da["dropout"],
        "n_points": da["n_points"],
        "use_cuda": False,  # pure-torch grid_sample path (the numeric spec)
    })
    return ref_cfg


def _build_reference(cfg, tiny_level_shape, seed=0):
    TransoarNet, _, _ = _import_reference()
    torch.manual_seed(seed)
    ref = TransoarNet(_ref_config(cfg))
    ref.eval()

    # anchor_offset_pred zero-inits the heads (input-independent outputs);
    # randomize so the comparison exercises the full network body
    with torch.no_grad():
        ref._cls_head.weight.normal_(0, 0.2)
        ref._cls_head.bias.normal_(0, 0.2)
        ref._reg_head.layers[-1].weight.normal_(0, 0.2)
        ref._reg_head.layers[-1].bias.normal_(0, 0.2)

    # the reference hard-codes AMOS/VISCERAL P-level shape tables keyed on
    # num_organs == 20 (focused_decoder.py:99-117); point them at the tiny
    # shapes and regenerate the masks
    for layer in ref._neck.decoder.layers:
        layer.input_shape = torch.tensor(tiny_level_shape)
        layer.attn_mask = layer.generate_attn_masks()
    return ref


def _map_weights(ref, params, cfg, sd=None):
    """Copy a torch name->array dict (default: the state dict) onto our
    param tree via the user-facing import library
    (transoar_tpu/utils/torch_import.py — the mapping lives there so
    scripts/import_torch_checkpoint.py and these golden tests share one
    implementation). Passing per-parameter GRADIENTS as ``sd`` maps them
    too — every transform is a transpose/reshape, which commutes with
    differentiation."""
    from transoar_tpu.utils.torch_import import map_reference_state_dict

    if sd is None:
        sd = {k: v.detach().numpy().copy()  # copy: .numpy() aliases torch
              for k, v in ref.state_dict().items()}  # storage, which optim.step() mutates in place
    return map_reference_state_dict(sd, params, cfg)


def _setup(seg_proxy=False, use_swin=False, use_refine=False):
    from transoar_tpu.models.focused_decoder import level_spatial_shape

    cfg = tiny_config(num_organs=3, qpo=7, precision="float32",
                      seg_proxy=seg_proxy)
    if use_swin:
        cfg["backbone"]["use_encoder_attn"] = True
        cfg["backbone"]["swin"] = {
            "depths": [2, 2], "num_heads": [2, 4],
            "window_size": [4, 4, 4], "mlp_ratio": 2, "qkv_bias": True,
            "drop_path_rate": 0.0, "conv_merging": False,
        }
    if use_refine:
        cfg["backbone"]["use_decoder_attn"] = True
        cfg["backbone"]["def_attn"] = {
            "pos_encoding": "sine",
            "feature_levels": ["P2", "P3"],
            # hidden_dim must equal fpn_channels (the refine operates on
            # the P-level channels, reference attn_fpn.py:85-103)
            "hidden_dim": cfg["backbone"]["fpn_channels"],
            "dim_feedforward": 32, "dropout": 0.0,
            "nheads": 6, "layers": 2, "n_points": 2,
        }
    patch = cfg["augmentation"]["patch_size"]
    level = int(cfg["neck"]["input_levels"][-1])
    tiny_shape = level_spatial_shape(patch, level)

    ref = _build_reference(cfg, tiny_shape)
    model = build_transoarnet(cfg)
    x_np = np.random.default_rng(0).normal(
        size=(2, *patch, 1)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x_np))["params"]
    params = _map_weights(ref, params, cfg)

    with torch.no_grad():
        ref_out = ref(torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3))))
    ours = model.apply({"params": params}, jnp.asarray(x_np),
                       deterministic=True)
    return cfg, ref, model, ref_out, ours, params, x_np


def test_anchor_generation_parity():
    from transoar_tpu.models.anchors import generate_anchors

    TransoarNet, _, _ = _import_reference()
    for qpo in (1, 7, 27):
        cfg = tiny_config(num_organs=3, qpo=qpo, precision="float32")
        ours_a, ours_r = generate_anchors(cfg["neck"],
                                          cfg["bbox_properties"])
        ref_a, ref_r = TransoarNet._generate_anchors(
            None, cfg["neck"], cfg["bbox_properties"])
        ref_r[:, :3] /= 2  # reference transoarnet.py:29
        np.testing.assert_allclose(np.asarray(ours_a), ref_a.numpy(),
                                   atol=1e-6, err_msg=f"qpo={qpo}")
        np.testing.assert_allclose(np.asarray(ours_r), ref_r.numpy(),
                                   atol=1e-6, err_msg=f"qpo={qpo}")


def test_full_model_forward_parity():
    cfg, ref, model, ref_out, ours, _, _ = _setup(seg_proxy=False)

    np.testing.assert_allclose(np.asarray(model.anchors),
                               ref._anchors.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.restrictions),
                               ref._restrictions.numpy(), atol=1e-6)

    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]), ref_out["pred_logits"].numpy(),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]), ref_out["pred_boxes"].numpy(),
        atol=2e-5)
    for i, aux in enumerate(ref_out["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(ours["aux_logits"][i]), aux["pred_logits"].numpy(),
            atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(ours["aux_boxes"][i]), aux["pred_boxes"].numpy(),
            atol=2e-5)


def test_swin_fpn_forward_parity():
    """SwinFPN variant (use_encoder_attn): window attention, relative
    position bias, shifted-window masks, and patch merging against the
    reference EncoderSwinBlock (encoder_blocks.py:56-400)."""
    cfg, ref, model, ref_out, ours, _, _ = _setup(use_swin=True)
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]), ref_out["pred_logits"].numpy(),
        atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]), ref_out["pred_boxes"].numpy(),
        atol=5e-5)


def test_deformable_refine_forward_parity():
    """Deformable FPN refinement (use_decoder_attn): MSDeformAttn sampling,
    level embeddings, reference points, and the DefAttn layers against the
    reference's pure-torch grid_sample path (decoder_blocks.py:12-177,
    ms_deform_attn_func.py:41-65)."""
    cfg, ref, model, ref_out, ours, _, _ = _setup(use_refine=True)
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]), ref_out["pred_logits"].numpy(),
        atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]), ref_out["pred_boxes"].numpy(),
        atol=5e-5)


def _targets(cfg, batch=2, seed=4):
    """Padded targets (ours) + list-of-dicts targets (reference); class 2
    absent in sample 1 to exercise the soft-label -1 path."""
    rng = np.random.default_rng(seed)
    organs = cfg["neck"]["num_organs"]
    present = np.ones((batch, organs), bool)
    present[1, 1] = False
    boxes = np.zeros((batch, organs, 6), np.float32)
    for b in range(batch):
        for o in range(organs):
            boxes[b, o] = np.concatenate([
                rng.uniform(0.3, 0.7, 3), rng.uniform(0.1, 0.3, 3)])
    boxes[~present] = 0.0

    ref_targets = []
    for b in range(batch):
        ids = [o + 1 for o in range(organs) if present[b, o]]
        ref_targets.append({
            "labels": torch.tensor(ids),
            "boxes": torch.tensor(
                np.stack([boxes[b, i - 1] for i in ids])),
        })
    return boxes, present, ref_targets


def test_full_model_criterion_parity():
    _, TransoarCriterion, Matcher = _import_reference()
    cfg, ref, model, ref_out, ours, _, _ = _setup(seg_proxy=False)
    m = cfg["matching"]
    organs = cfg["neck"]["num_organs"]

    boxes, present, ref_targets = _targets(cfg)

    ref_crit = TransoarCriterion(
        num_classes=organs,
        matcher=Matcher(cost_class=m["cost_class"], cost_bbox=m["cost_bbox"],
                        cost_giou=m["cost_giou"],
                        anchor_matching=m["anchor_matching"],
                        num_organs=organs),
        seg_proxy=False, seg_fg_bg=True)
    with torch.no_grad():
        ref_losses = ref_crit(ref_out, ref_targets, None,
                              ref._anchors)

    from transoar_tpu.models.criterion import Criterion
    crit = Criterion(cfg)
    ours_losses = crit(ours, {"boxes": jnp.asarray(boxes),
                              "present": jnp.asarray(present)},
                       jnp.asarray(model.anchors))

    for key in ("cls", "bbox", "giou"):
        np.testing.assert_allclose(
            float(ours_losses[key]), float(ref_losses[key]), rtol=1e-4,
            atol=1e-5, err_msg=key)

    # ALL reference aux losses are computed on the FINAL outputs with
    # aux-derived matches/soft-labels (criterion.py:116-120 passes
    # ``outputs``) — a bug we consciously fix by using each aux layer's own
    # outputs. Prove the divergence is exactly that fix: recomputing OUR
    # losses in the reference's bug-compatible way reproduces the
    # reference's aux values.
    from transoar_tpu.models.criterion import loss_bboxes, loss_class

    anchors = jnp.asarray(model.anchors)
    for i in range(len(ref_out["aux_outputs"])):
        m_i, s_i = crit._match(ours["aux_logits"][i], ours["aux_boxes"][i],
                               anchors, jnp.asarray(boxes),
                               jnp.asarray(present))
        bug_cls = loss_class(ours["pred_logits"], s_i, organs)
        bug_bbox, bug_giou = loss_bboxes(ours["pred_boxes"], m_i,
                                         jnp.asarray(boxes),
                                         jnp.asarray(present), organs)
        np.testing.assert_allclose(float(bug_cls),
                                   float(ref_losses[f"cls_{i}"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(bug_bbox),
                                   float(ref_losses[f"bbox_{i}"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(bug_giou),
                                   float(ref_losses[f"giou_{i}"]),
                                   rtol=1e-4, atol=1e-5)

    # the shipped reference-faithful mode (neck.aux_loss_on_final) must
    # reproduce the same values end to end through Criterion itself
    import copy

    cfg_bug = copy.deepcopy(cfg)
    cfg_bug["neck"]["aux_loss_on_final"] = True
    bug_losses = Criterion(cfg_bug)(
        ours, {"boxes": jnp.asarray(boxes), "present": jnp.asarray(present)},
        anchors)
    for i in range(len(ref_out["aux_outputs"])):
        for key in ("cls", "bbox", "giou"):
            np.testing.assert_allclose(
                float(bug_losses[f"{key}_{i}"]),
                float(ref_losses[f"{key}_{i}"]), rtol=1e-4, atol=1e-5,
                err_msg=f"aux_loss_on_final {key}_{i}")


def test_full_model_seg_proxy_parity():
    _, TransoarCriterion, Matcher = _import_reference()
    cfg, ref, model, ref_out, ours, _, _ = _setup(seg_proxy=True)
    organs = cfg["neck"]["num_organs"]
    m = cfg["matching"]

    # forward seg parity
    np.testing.assert_allclose(
        np.asarray(ours["pred_seg"]),
        np.transpose(ref_out["pred_seg"].numpy(), (0, 2, 3, 4, 1)),
        atol=2e-4)

    boxes, present, ref_targets = _targets(cfg)
    patch = cfg["augmentation"]["patch_size"]
    seg = np.zeros((2, *patch), np.int32)
    seg[:, 4:20, 6:22, 2:10] = 1
    seg[:, 22:30, 2:10, 10:14] = 2

    ref_crit = TransoarCriterion(
        num_classes=organs,
        matcher=Matcher(cost_class=m["cost_class"], cost_bbox=m["cost_bbox"],
                        cost_giou=m["cost_giou"],
                        anchor_matching=m["anchor_matching"],
                        num_organs=organs),
        seg_proxy=True, seg_fg_bg=True)
    with torch.no_grad():
        ref_losses = ref_crit(ref_out, ref_targets,
                              torch.tensor(seg)[:, None], ref._anchors)

    from transoar_tpu.models.criterion import Criterion
    crit = Criterion(cfg)
    ours_losses = crit(ours, {"boxes": jnp.asarray(boxes),
                              "present": jnp.asarray(present),
                              "seg": jnp.asarray(seg)},
                       jnp.asarray(model.anchors))

    for key in ("cls", "bbox", "giou", "segce", "segdice"):
        np.testing.assert_allclose(
            float(ours_losses[key]), float(ref_losses[key]), rtol=1e-4,
            atol=1e-5, err_msg=key)


def test_sine_position_encoding_parity():
    _stub_timm()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from transoar.models.position_encoding import PositionEmbeddingSine3D

    from transoar_tpu.models.position_encoding import sine_position_encoding

    for C, shape in ((24, (8, 8, 4)), (96, (16, 8, 4)), (384, (4, 4, 2))):
        ref = PositionEmbeddingSine3D(channels=C)
        rp = ref(torch.zeros((1, C, *shape))).numpy()
        rp = np.transpose(rp[0], (1, 2, 3, 0))
        op = np.asarray(sine_position_encoding(shape, C))
        np.testing.assert_allclose(op, rp, atol=1e-5,
                                   err_msg=f"C={C} shape={shape}")


def test_learned_position_encoding_parity():
    _stub_timm()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from transoar.models.position_encoding import PositionEmbeddingLearned3D

    from transoar_tpu.models.position_encoding import \
        PositionEmbeddingLearned3D as Ours

    C, shape = 24, (6, 5, 4)
    torch.manual_seed(0)
    ref = PositionEmbeddingLearned3D(channels=C)
    x = torch.zeros((2, C, *shape))
    rp = np.transpose(ref(x).detach().numpy(), (0, 2, 3, 4, 1))

    ours = Ours(channels=C, dtype=jnp.float32)
    params = ours.init(jax.random.key(0), jnp.zeros((2, *shape, C)))
    params = {"params": {
        "embed_0": jnp.asarray(ref.row_embed.weight.detach().numpy()),
        "embed_1": jnp.asarray(ref.col_embed.weight.detach().numpy()),
        "embed_2": jnp.asarray(ref.depth_embed.weight.detach().numpy()),
    }}
    op = np.asarray(ours.apply(params, jnp.zeros((2, *shape, C))))
    np.testing.assert_allclose(op, rp, atol=1e-6)


# ---------------------------------------------------------------------------
# Training-dynamics parity: gradients + one AdamW step
# ---------------------------------------------------------------------------

def _grad_sd(ref):
    """torch per-parameter gradients as a name->numpy dict (None grads —
    dead params like the unused cross-attn q_proj — become zeros)."""
    return {
        k: (p.grad if p.grad is not None
            else torch.zeros_like(p)).detach().numpy().copy()
        for k, p in ref.named_parameters()
    }


def _bug_compatible_loss_fn(model, crit, cfg, x, tgt_boxes, tgt_present,
                            anchors):
    """Composed total training loss with the reference's aux-loss bug
    REPRODUCED (criterion.py:118 computes aux losses on the final outputs
    with aux matches) so gradients are comparable term by term."""
    from transoar_tpu.models.criterion import (loss_bboxes, loss_class,
                                               total_loss)

    organs = cfg["neck"]["num_organs"]
    coefs = cfg["loss_coefs"]

    def loss_fn(params):
        out = model.apply({"params": params}, x, deterministic=True)
        losses = crit(out, {"boxes": tgt_boxes, "present": tgt_present},
                      anchors)
        for i in range(out["aux_logits"].shape[0]):
            m_i, s_i = crit._match(out["aux_logits"][i], out["aux_boxes"][i],
                                   anchors, tgt_boxes, tgt_present)
            losses[f"cls_{i}"] = loss_class(out["pred_logits"], s_i, organs)
            losses[f"bbox_{i}"], losses[f"giou_{i}"] = loss_bboxes(
                out["pred_boxes"], m_i, tgt_boxes, tgt_present, organs)
        return total_loss(losses, coefs)

    return loss_fn


def test_full_model_gradient_and_adamw_step_parity():
    """Backprop through the COMPOSED network (InstanceNorm, shared-QK
    attention, FPN transposed convs, anchor-offset decode) + one AdamW step
    with the reference's two LR groups must match torch autograd + torch
    AdamW (reference trainer.py:67-86 backward/clip, scripts/train.py:52-65
    param groups)."""
    import flax

    from transoar_tpu.models.criterion import Criterion, total_loss
    from transoar_tpu.training.train_state import TrainState, make_optimizer

    _, TransoarCriterion, Matcher = _import_reference()
    cfg, ref, model, ref_out, _ours, params, x_np = _setup(seg_proxy=False)
    organs = cfg["neck"]["num_organs"]
    m = cfg["matching"]
    coefs = cfg["loss_coefs"]
    boxes, present, ref_targets = _targets(cfg)

    # --- torch: forward, composed loss, backward, global-norm clip -------
    ref_crit = TransoarCriterion(
        num_classes=organs,
        matcher=Matcher(cost_class=m["cost_class"], cost_bbox=m["cost_bbox"],
                        cost_giou=m["cost_giou"],
                        anchor_matching=m["anchor_matching"],
                        num_organs=organs),
        seg_proxy=False, seg_fg_bg=True)
    ref.zero_grad()
    out_t = ref(torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3))))
    loss_dict = ref_crit(out_t, ref_targets, None, ref._anchors)
    loss_t = sum(v * coefs[k.split("_")[0]] for k, v in loss_dict.items())
    loss_t.backward()

    # active clipping (reference trainer.py:79-82): pick max_norm BELOW the
    # actual grad norm so the clip path is exercised, not a no-op
    total_norm = float(torch.nn.utils.clip_grad_norm_(
        ref.parameters(), float("inf")))
    max_norm = 0.5 * total_norm
    torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm)
    cfg["trainer"]["clip_max_norm"] = max_norm

    # --- ours: same composed loss via jax.grad + optax clip --------------
    crit = Criterion(cfg)
    anchors = jnp.asarray(model.anchors)
    tb, tp = jnp.asarray(boxes), jnp.asarray(present)
    loss_fn = _bug_compatible_loss_fn(model, crit, cfg, jnp.asarray(x_np),
                                      tb, tp, anchors)
    loss_o, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_o), float(loss_t.detach()),
                               rtol=1e-4)

    # --- per-tensor gradient comparison (map torch grads like weights) ---
    nan_base = jax.tree.map(lambda a: jnp.full(a.shape, jnp.nan, jnp.float32),
                            params)
    ref_grads = _map_weights(ref, nan_base, cfg, sd=_grad_sd(ref))
    clip_scale = max_norm / total_norm  # torch grads were already clipped
    flat_o = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads))
    flat_r = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, ref_grads))
    assert set(flat_o) == set(flat_r)
    # leaves with analytically-ZERO gradients (e.g. self-attn k_proj bias:
    # a key bias shifts every attention score of a row equally — softmax
    # invariant) carry only float noise in both frameworks; floor the
    # denominator at a fraction of the global norm and track them
    negligible = set()
    for key in sorted(flat_o):
        o, r = flat_o[key] * clip_scale, flat_r[key]
        name = "/".join(key)
        assert not np.isnan(r).any(), f"unmapped param leaf {name}"
        floor = 1e-5 * total_norm * clip_scale
        if np.linalg.norm(r) < floor and np.linalg.norm(o) < floor:
            negligible.add(key)
            continue
        rel = np.linalg.norm(o - r) / max(np.linalg.norm(r), floor)
        assert rel < 1e-2, f"{name}: rel grad err {rel:.2e}"

    # --- one AdamW step, two LR groups (scripts/train.py:52-65) ----------
    lr, lr_backbone = (float(cfg["trainer"]["lr"]),
                       float(cfg["trainer"]["lr_backbone"]))
    wd = float(cfg["trainer"]["weight_decay"])
    param_dicts = [
        {"params": [p for n, p in ref.named_parameters()
                    if n.startswith("_backbone") and p.requires_grad]},
        {"params": [p for n, p in ref.named_parameters()
                    if not n.startswith("_backbone") and p.requires_grad],
         "lr": lr},
    ]
    optim = torch.optim.AdamW(param_dicts, lr=lr_backbone, weight_decay=wd)
    optim.step()
    ref_new = _map_weights(ref, nan_base, cfg)

    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(cfg, steps_per_epoch=100))
    state = state.apply_gradients(grads=grads)

    flat_old = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, params))
    flat_new_o = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state.params))
    flat_new_r = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, ref_new))
    for key in sorted(flat_old):
        if key in negligible:
            # analytically-zero gradient: g/(|g|+eps) is pure float noise,
            # the AdamW update direction is undefined — skip
            continue
        name = "/".join(key)
        group_lr = lr_backbone if key[0] == "backbone" else lr
        delta_o = flat_new_o[key] - flat_old[key]
        delta_r = flat_new_r[key] - flat_old[key]
        # first-step AdamW updates are ~= -lr * sign(g) - lr*wd*p; compare
        # deltas with an lr-scaled absolute tolerance (eps-scale grads make
        # g/(|g|+eps) hypersensitive — a 1e-9 grad difference swings the
        # ratio anywhere in [0, 1] — so elementwise rtol alone is brittle)
        np.testing.assert_allclose(
            delta_o, delta_r, rtol=0.05, atol=0.25 * group_lr,
            err_msg=f"{name} (group lr={group_lr})")

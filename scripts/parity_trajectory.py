"""Side-by-side training-trajectory parity: reference torch vs rebuild.

Trains the ACTUAL reference TransoarNet (torch, CPU, f32, augmentation off;
reference trainer.py:45-110) and this rebuild from the SAME mapped initial
weights on the SAME synthetic data with the SAME batch order, and records
both loss trajectories. This is the strongest accuracy-parity evidence
obtainable without the real AMOS dataset: identical inits + identical data
+ matching per-step losses over hundreds of steps means the two frameworks
descend the same loss landscape the same way.

The rebuild side uses the bug-compatible aux-loss composition (the
reference computes aux box losses on the FINAL outputs with aux matches,
criterion.py:118) so the composed totals are comparable term by term.

Usage:  python scripts/parity_trajectory.py [--steps 300] [--cases 16]
Writes runs/parity_trajectory/trajectory.json and prints a summary.
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from tests.helpers import tiny_config  # noqa: E402
from tests.test_model_parity import (_build_reference, _import_reference,  # noqa: E402
                                     _map_weights)
from transoar_tpu.data.synthetic import make_case  # noqa: E402
from transoar_tpu.models.criterion import (Criterion, loss_bboxes,  # noqa: E402
                                           loss_class, total_loss)
from transoar_tpu.models.focused_decoder import level_spatial_shape  # noqa: E402
from transoar_tpu.models.transoarnet import build_transoarnet  # noqa: E402
from transoar_tpu.training.train_state import TrainState, make_optimizer  # noqa: E402
from transoar_tpu.training.trainer import make_train_step  # noqa: E402


class BugCompatCriterion(Criterion):
    """Criterion with the reference's aux-loss bug REPRODUCED
    (criterion.py:116-120: aux losses use the final outputs with
    aux-derived matches) for apples-to-apples trajectory comparison."""

    def __call__(self, outputs, targets, anchors):
        losses = super().__call__(outputs, targets, anchors)
        if "aux_logits" not in outputs:
            return losses
        organs = self.num_organs
        tb = targets["boxes"].astype(jnp.float32)
        tp = targets["present"]
        for i in range(outputs["aux_logits"].shape[0]):
            m_i, s_i = self._match(outputs["aux_logits"][i],
                                   outputs["aux_boxes"][i], anchors, tb, tp)
            losses[f"cls_{i}"] = loss_class(outputs["pred_logits"], s_i,
                                            organs)
            losses[f"bbox_{i}"], losses[f"giou_{i}"] = loss_bboxes(
                outputs["pred_boxes"], m_i, tb, tp, organs)
        return losses


def build_data(cfg, n_cases, seed=7):
    rng = np.random.default_rng(seed)
    patch = tuple(cfg["augmentation"]["patch_size"])
    images, segs = [], []
    for _ in range(n_cases):
        img, lbl = make_case(rng, patch, cfg["bbox_properties"])
        images.append(img)
        segs.append(lbl)
    return np.stack(images), np.stack(segs)


def torch_targets(seg_batch, num_classes, padding):
    """Reference-format list-of-dicts targets from the SAME on-device
    derivation the rebuild uses (so both sides see identical boxes)."""
    from transoar_tpu.utils.boxes import segmentation2bbox

    boxes, present = segmentation2bbox(jnp.asarray(seg_batch), num_classes,
                                       padding=padding)
    boxes, present = np.asarray(boxes), np.asarray(present)
    out = []
    for b in range(len(boxes)):
        ids = np.nonzero(present[b])[0]
        out.append({
            "labels": torch.tensor(ids + 1),
            "boxes": torch.tensor(boxes[b][ids]),
        })
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--cases", type=int, default=16)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--organs", type=int, default=3)
    args = parser.parse_args()

    cfg = tiny_config(num_organs=args.organs, qpo=7, precision="float32")
    cfg["trainer"]["lr_drop"] = 10_000  # constant LR over the run
    cfg["neck"]["dropout"] = 0.0
    patch = cfg["augmentation"]["patch_size"]
    level = int(cfg["neck"]["input_levels"][-1])

    # --- identical weights ------------------------------------------------
    ref = _build_reference(cfg, level_spatial_shape(patch, level))
    model = build_transoarnet(cfg)
    x0 = jnp.zeros((args.batch, *patch, 1))
    params = model.init(jax.random.key(0), x0)["params"]
    params = _map_weights(ref, params, cfg)

    # --- identical data + batch order ------------------------------------
    images, segs = build_data(cfg, args.cases)
    order_rng = np.random.default_rng(11)
    idx = np.stack([order_rng.choice(args.cases, args.batch, replace=False)
                    for _ in range(args.steps)])

    organs = cfg["neck"]["num_organs"]
    coefs = cfg["loss_coefs"]
    m = cfg["matching"]
    padding = cfg.get("bbox_padding", 1)

    # --- torch side (reference trainer.py:45-110, CPU so no autocast) ----
    _, TransoarCriterion, Matcher = _import_reference()
    ref_crit = TransoarCriterion(
        num_classes=organs,
        matcher=Matcher(cost_class=m["cost_class"], cost_bbox=m["cost_bbox"],
                        cost_giou=m["cost_giou"],
                        anchor_matching=m["anchor_matching"],
                        num_organs=organs),
        seg_proxy=False, seg_fg_bg=True)
    param_dicts = [
        {"params": [p for n, p in ref.named_parameters()
                    if n.startswith("_backbone") and p.requires_grad]},
        {"params": [p for n, p in ref.named_parameters()
                    if not n.startswith("_backbone") and p.requires_grad],
         "lr": float(cfg["trainer"]["lr"])},
    ]
    optim = torch.optim.AdamW(param_dicts,
                              lr=float(cfg["trainer"]["lr_backbone"]),
                              weight_decay=float(
                                  cfg["trainer"]["weight_decay"]))
    ref.train()
    torch.manual_seed(0)

    ref_losses = []
    for step in range(args.steps):
        img = images[idx[step]]
        seg = segs[idx[step]]
        data = torch.tensor(img[:, None])  # [B, 1, S0, S1, S2]
        det_targets = torch_targets(seg, organs, padding)
        out = ref(data)
        loss_dict = ref_crit(out, det_targets, None, ref._anchors)
        loss = sum(v * coefs[k.split("_")[0]] for k, v in loss_dict.items())
        optim.zero_grad()
        loss.backward()
        optim.step()
        ref_losses.append({
            "total": float(loss.detach()),
            "cls": float(loss_dict["cls"].detach()),
            "bbox": float(loss_dict["bbox"].detach()),
            "giou": float(loss_dict["giou"].detach()),
        })
        if step % 20 == 0:
            print(f"[torch] step {step} total={ref_losses[-1]['total']:.4f}",
                  flush=True)

    # --- rebuild side: the REAL train step (trainer.py) ------------------
    crit = BugCompatCriterion(cfg)
    step_fn = jax.jit(
        make_train_step(model, crit, cfg, model.anchors),
        donate_argnums=(0,))
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(cfg, steps_per_epoch=10_000))
    rng = jax.random.key(0)

    our_losses = []
    for step in range(args.steps):
        batch = {"image": jnp.asarray(images[idx[step]][..., None]),
                 "seg": jnp.asarray(segs[idx[step]])}
        state, losses = step_fn(state, batch, rng)
        our_losses.append({k: float(losses[k])
                           for k in ("total", "cls", "bbox", "giou")})
        if step % 20 == 0:
            print(f"[jax]   step {step} total={our_losses[-1]['total']:.4f}",
                  flush=True)

    # --- compare ----------------------------------------------------------
    rel = [abs(o["total"] - r["total"]) / max(abs(r["total"]), 1e-6)
           for o, r in zip(our_losses, ref_losses)]
    out_dir = REPO / "runs" / "parity_trajectory"
    out_dir.mkdir(parents=True, exist_ok=True)
    result = {
        "steps": args.steps,
        "cases": args.cases,
        "batch": args.batch,
        "torch": ref_losses,
        "jax": our_losses,
        "rel_total_diff": rel,
        "max_rel_first_50": max(rel[:50]),
        "mean_rel_first_50": float(np.mean(rel[:50])),
        "max_rel_all": max(rel),
        "mean_rel_all": float(np.mean(rel)),
        "final_torch": ref_losses[-1]["total"],
        "final_jax": our_losses[-1]["total"],
    }
    (out_dir / "trajectory.json").write_text(json.dumps(result))
    print(json.dumps({k: result[k] for k in (
        "steps", "max_rel_first_50", "mean_rel_first_50", "max_rel_all",
        "mean_rel_all", "final_torch", "final_jax")}, indent=2))


if __name__ == "__main__":
    main()

"""Train state + optimizer factory.

TPU-native counterpart of the reference's optimizer setup
(scripts/train.py:52-65): AdamW with two learning-rate groups (backbone at
``lr_backbone``, everything else at ``lr``), weight decay, StepLR decay of
10x at epoch ``lr_drop`` (torch StepLR default gamma, train.py:65), optional
global-norm gradient clipping (trainer.py:79-82).

Implemented as one optax chain: the schedule is a function of the step count
(epoch boundaries are ``lr_drop * steps_per_epoch``), and the two groups are
an ``optax.multi_transform`` keyed on the top-level parameter collection
('backbone' vs rest — the reference matches parameter *names* against
'_backbone', train.py:54-57).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def make_lr_schedule(base_lr, lr_drop_epochs, steps_per_epoch, gamma=0.1):
    """StepLR: lr * gamma^(epoch // lr_drop), stepped per epoch
    (train.py:65, trainer.py:220)."""
    boundary = max(int(lr_drop_epochs) * int(steps_per_epoch), 1)
    return optax.piecewise_constant_schedule(
        init_value=float(base_lr), boundaries_and_scales={boundary: gamma})


def make_optimizer(config, steps_per_epoch):
    tcfg = config["trainer"]
    wd = float(tcfg["weight_decay"])
    clip = float(tcfg.get("clip_max_norm", -1))

    def group(lr):
        schedule = make_lr_schedule(lr, tcfg["lr_drop"], steps_per_epoch)
        return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd)

    def label_fn(params):
        flat = flax.traverse_util.flatten_dict(params)
        labels = {
            k: ("backbone" if k[0] == "backbone" else "rest") for k in flat
        }
        return flax.traverse_util.unflatten_dict(labels)

    tx = optax.multi_transform(
        {"backbone": group(float(tcfg["lr_backbone"])),
         "rest": group(float(tcfg["lr"]))},
        label_fn)

    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    # Gradient accumulation: effective batch = batch_size * grad_accum_steps.
    # On one v5e chip the flagship trains fastest at device batch 1
    # (PERFORMANCE.md); accum 2 reproduces the reference's batch-2 semantics.
    accum = int(tcfg.get("grad_accum_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(model, config, example_input, rng,
                       steps_per_epoch=1) -> TrainState:
    params = model.init(rng, example_input)["params"]
    tx = make_optimizer(config, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def current_lrs(state: TrainState, config, steps_per_epoch):
    """Learning rates at the state's current step, for logging
    (reference trainer.py:210-215)."""
    tcfg = config["trainer"]
    step = int(state.step)
    lrs = {}
    for name, base in (("backbone", tcfg["lr_backbone"]),
                       ("neck", tcfg["lr"])):
        sched = make_lr_schedule(base, tcfg["lr_drop"], steps_per_epoch)
        lrs[name] = float(sched(step))
    return lrs


def tree_size_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

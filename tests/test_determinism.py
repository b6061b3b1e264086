"""Determinism: identical seeds give identical losses and parameters —
the TPU equivalent of the reference's cudnn-deterministic seeding
discipline (scripts/train.py:110-116)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import synthetic_batch, tiny_config
from transoar_tpu.models.criterion import Criterion
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import make_train_step


def _run(seed, steps=3, dropout=0.1):
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    cfg["neck"]["dropout"] = dropout
    model = build_transoarnet(cfg)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(seed), 4)
    step = jax.jit(make_train_step(model, Criterion(cfg), cfg,
                                   model.anchors))
    images, seg = synthetic_batch(cfg, batch_size=2, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    rng = jax.random.key(seed)
    losses = []
    for _ in range(steps):
        state, l = step(state, batch, rng)
        losses.append(float(l["total"]))
    return losses, state.params


def test_same_seed_bitwise_identical():
    l1, p1 = _run(0)
    l2, p2 = _run(0)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_differs():
    l1, _ = _run(0)
    l2, _ = _run(1)
    assert l1 != l2

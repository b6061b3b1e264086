"""In-step microbatching (lax.map over samples) must match the batched
forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import synthetic_batch, tiny_config
from transoar_tpu.models.criterion import Criterion
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import make_train_step


def test_microbatch_matches_batched():
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    cfg["neck"]["dropout"] = 0.0  # isolate numerics from dropout draws
    model = build_transoarnet(cfg)
    example = jnp.zeros((3, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=3, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = Criterion(cfg)
    rng = jax.random.key(5)

    results = {}
    for flag in (False, True):
        cfg_i = {**cfg, "trainer": {**cfg["trainer"], "microbatch": flag}}
        state = create_train_state(model, cfg_i, example, jax.random.key(0),
                                   4)
        step = jax.jit(make_train_step(model, crit, cfg_i, model.anchors))
        state, losses = step(state, batch, rng)
        results[flag] = (losses, state.params)

    for key in results[False][0]:
        np.testing.assert_allclose(
            float(results[False][0][key]), float(results[True][0][key]),
            rtol=2e-4, err_msg=key)
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

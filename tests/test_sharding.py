"""Multi-chip sharding tests on the virtual 8-device CPU mesh: dp/sp train
steps compile, run, and match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import synthetic_batch, tiny_config
from transoar_tpu.models.criterion import Criterion
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.parallel import mesh as mesh_lib
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import make_train_step


def _build(batch):
    cfg = tiny_config(num_organs=3, qpo=7, patch=(32, 32, 16))
    cfg["trainer"]["batch_size"] = batch
    model = build_transoarnet(cfg)
    example = jnp.zeros((batch, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=4)
    step_fn = make_train_step(model, Criterion(cfg), cfg, model.anchors)
    images, seg = synthetic_batch(cfg, batch_size=batch, seed=1)
    return cfg, model, state, step_fn, {"image": images, "seg": seg}


def test_dp_matches_single_device():
    batch = 8
    cfg, model, state, step_fn, batch_data = _build(batch)

    # single device
    step1 = jax.jit(step_fn)
    state1, losses1 = step1(state, jax.device_put(batch_data),
                            jax.random.key(1))

    # dp=8 mesh
    mesh = mesh_lib.make_mesh(dp=8, sp=1)
    rep = mesh_lib.replicated(mesh)
    step8 = jax.jit(step_fn, out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    # re-create identical initial state
    state_b = create_train_state(model, cfg,
                                 jnp.zeros((batch, 32, 32, 16, 1)),
                                 jax.random.key(0), steps_per_epoch=4)
    state8, losses8 = step8(state_b, device_batch, jax.random.key(1))

    np.testing.assert_allclose(float(losses1["total"]),
                               float(losses8["total"]), rtol=2e-4)
    # parameters after one update agree
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dp_sp_mesh_runs():
    batch = 4
    cfg, model, state, step_fn, batch_data = _build(batch)
    mesh = mesh_lib.make_mesh(dp=4, sp=2)
    rep = mesh_lib.replicated(mesh)
    step = jax.jit(step_fn, out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    _, losses = step(state, device_batch, jax.random.key(1))
    assert np.isfinite(float(losses["total"]))


def test_pad_batch_to():
    batch = {"image": np.zeros((3, 4, 4, 2, 1)), "seg": np.zeros((3, 4, 4, 2))}
    padded, mask = mesh_lib.pad_batch_to(batch, 4)
    assert padded["image"].shape[0] == 4
    assert mask.tolist() == [True, True, True, False]

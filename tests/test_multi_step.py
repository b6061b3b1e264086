"""Multi-step scan dispatch must match sequential single steps exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import synthetic_batch, tiny_config
from transoar_tpu.models.criterion import Criterion
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import (Trainer, make_multi_train_step,
                                           make_train_step)


def test_scan_matches_sequential_steps():
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    model = build_transoarnet(cfg)
    B, K = 2, 3
    example = jnp.zeros((B, 32, 32, 16, 1))

    images, seg = synthetic_batch(cfg, batch_size=B, seed=0)
    batches = [{"image": images + 0.01 * k, "seg": seg} for k in range(K)]
    stacked = {key: jnp.stack([jnp.asarray(b[key]) for b in batches])
               for key in ("image", "seg")}

    crit = Criterion(cfg)
    step = jax.jit(make_train_step(model, crit, cfg, model.anchors))
    multi = jax.jit(make_multi_train_step(model, crit, cfg, model.anchors))
    rng = jax.random.key(7)

    s1 = create_train_state(model, cfg, example, jax.random.key(0), 4)
    seq_losses = []
    for b in batches:
        s1, losses = step(s1, {k: jnp.asarray(v) for k, v in b.items()}, rng)
        seq_losses.append(float(losses["total"]))

    s2 = create_train_state(model, cfg, example, jax.random.key(0), 4)
    s2, m_losses = multi(s2, stacked, rng)

    np.testing.assert_allclose(np.asarray(m_losses["total"]), seq_losses,
                               rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_steps_per_dispatch(tmp_path):
    from tests.test_training import _setup_run
    from transoar_tpu.data.dataset import get_loader

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    cfg["trainer"]["steps_per_dispatch"] = 2
    model = build_transoarnet(cfg)
    loader = get_loader(cfg, "train", data_dir=ds_root)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=len(loader))
    trainer = Trainer(cfg, model, loader, loader, tmp_path / "runs" / "ms",
                      state=state)
    trainer._writer = None
    means = trainer._train_one_epoch(1)
    assert np.isfinite(means["total"])
    assert int(trainer.state.step) == len(loader)


def test_grad_accumulation():
    """grad_accum_steps=2: params update only every second step, and the
    update equals one step on the averaged gradients."""
    cfg = tiny_config(num_organs=2, qpo=1, patch=(32, 32, 16))
    cfg["trainer"]["grad_accum_steps"] = 2
    model = build_transoarnet(cfg)
    example = jnp.zeros((1, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0), 4)

    images, seg = synthetic_batch(cfg, batch_size=1, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = Criterion(cfg)
    step = jax.jit(make_train_step(model, crit, cfg, model.anchors))

    p0 = jax.tree.leaves(state.params)
    state, _ = step(state, batch, jax.random.key(1))
    p1 = jax.tree.leaves(state.params)
    for a, b in zip(p0, p1):  # first micro-step: no update yet
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, _ = step(state, batch, jax.random.key(1))
    p2 = jax.tree.leaves(state.params)
    changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(p1, p2))
    assert changed


def test_multi_step_dispatch_composes_with_grads_scan_on_dp_mesh():
    """steps_per_dispatch wraps make_train_step, which under
    microbatch='grads' regroups per-DEVICE rows — the K-stacked outer scan
    over the inner grads scan on a dp>1 mesh must match sequential
    single-dispatch grads steps on the same mesh exactly (same losses and
    post-K params)."""
    from transoar_tpu.parallel import mesh as mesh_lib

    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    cfg["neck"]["dropout"] = 0.0
    cfg["trainer"]["microbatch"] = "grads"
    model = build_transoarnet(cfg)
    B, K = 4, 2
    example = jnp.zeros((B, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=B, seed=0)
    batches = [{"image": jnp.asarray(images) + 0.01 * k,
                "seg": jnp.asarray(seg)} for k in range(K)]
    crit = Criterion(cfg)
    rng = jax.random.key(7)

    mesh = mesh_lib.make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    rep = mesh_lib.replicated(mesh)

    s1 = create_train_state(model, cfg, example, jax.random.key(0), 4)
    step = jax.jit(make_train_step(model, crit, cfg, model.anchors,
                                   mesh=mesh), out_shardings=(rep, rep))
    seq = []
    for b in batches:
        s1, losses = step(s1, mesh_lib.shard_batch(b, mesh), rng)
        seq.append(float(losses["total"]))

    s2 = create_train_state(model, cfg, example, jax.random.key(0), 4)
    multi = jax.jit(make_multi_train_step(model, crit, cfg, model.anchors,
                                          mesh=mesh),
                    out_shardings=(rep, rep))
    stacked = {key: np.stack([np.asarray(b[key]) for b in batches])
               for key in ("image", "seg")}
    s2, m_losses = multi(s2, mesh_lib.shard_stacked_batch(stacked, mesh),
                         rng)

    np.testing.assert_allclose(np.asarray(m_losses["total"]), seq, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

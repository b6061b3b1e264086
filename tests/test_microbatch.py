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


def test_grad_accum_microbatch_matches_batched():
    """trainer.microbatch: "grads" (per-sample fwd+bwd scan) must reproduce
    the batched losses and the batched parameter update — the per-sample
    criterion calls use the batch-global normalizers (present_total), so
    summing per-sample losses/grads is exact up to fp reassociation."""
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    cfg["neck"]["dropout"] = 0.0  # isolate numerics from dropout draws
    model = build_transoarnet(cfg)
    example = jnp.zeros((3, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=3, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = Criterion(cfg)
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


def test_grads_mode_composes_with_dp_mesh():
    """microbatch='grads' on a dp>1 mesh scans per-DEVICE rows (sub-batches
    of size dp, one global row per shard per scan step) and must reproduce
    the single-device grads scan exactly — same losses and post-step params
    up to fp reassociation (the dp path sums grads in a different order)."""
    from transoar_tpu.parallel import mesh as mesh_lib

    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    cfg["neck"]["dropout"] = 0.0  # dp regroups the per-sample RNG folds
    cfg["trainer"]["microbatch"] = "grads"
    model = build_transoarnet(cfg)
    example = jnp.zeros((4, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=4, seed=0)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = Criterion(cfg)
    rng = jax.random.key(5)

    state1 = create_train_state(model, cfg, example, jax.random.key(0), 4)
    step1 = jax.jit(make_train_step(model, crit, cfg, model.anchors))
    state1, losses1 = step1(state1, batch, rng)

    mesh = mesh_lib.make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    rep = mesh_lib.replicated(mesh)
    state2 = create_train_state(model, cfg, example, jax.random.key(0), 4)
    step2 = jax.jit(
        make_train_step(model, crit, cfg, model.anchors, mesh=mesh),
        out_shardings=(rep, rep))
    state2, losses2 = step2(state2, mesh_lib.shard_batch(batch, mesh), rng)

    for key in losses1:
        np.testing.assert_allclose(float(losses1[key]), float(losses2[key]),
                                   rtol=2e-4, err_msg=key)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_grads_mode_trains_on_dp_mesh(tmp_path):
    """Trainer keeps microbatch='grads' on a dp>1 mesh (the r3 gate that
    downgraded it to plain batching is gone) and the epoch trains finite."""
    from tests.test_training import _setup_run
    from transoar_tpu.data.dataset import get_loader
    from transoar_tpu.parallel import mesh as mesh_lib
    from transoar_tpu.training.trainer import Trainer

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    cfg["trainer"]["microbatch"] = "grads"
    cfg["trainer"]["batch_size"] = 4  # localB=2: a real in-shard scan
    model = build_transoarnet(cfg)
    loader = get_loader(cfg, "train", data_dir=ds_root)
    example = jnp.zeros((4, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=max(len(loader), 1))
    mesh = mesh_lib.make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    trainer = Trainer(cfg, model, loader, loader, tmp_path / "runs" / "gg",
                      mesh=mesh, state=state)
    trainer._writer = None
    assert trainer._config["trainer"]["microbatch"] == "grads"
    means = trainer._train_one_epoch(1)
    assert np.isfinite(means["total"])


def test_grad_accum_matches_map_with_dropout():
    """With dropout ON, grads mode and map mode draw identical per-sample
    dropout keys (fold_in(step_rng, idx)), so their losses must agree."""
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    model = build_transoarnet(cfg)
    example = jnp.zeros((2, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=2, seed=1)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    crit = Criterion(cfg)
    rng = jax.random.key(7)

    results = {}
    for flag in (True, "grads"):
        cfg_i = {**cfg, "trainer": {**cfg["trainer"], "microbatch": flag}}
        state = create_train_state(model, cfg_i, example, jax.random.key(0),
                                   4)
        step = jax.jit(make_train_step(model, crit, cfg_i, model.anchors))
        state, losses = step(state, batch, rng)
        results[flag] = (losses, state.params)

    for key in results[True][0]:
        np.testing.assert_allclose(
            float(results[True][0][key]), float(results["grads"][0][key]),
            rtol=2e-4, err_msg=key)
    for a, b in zip(jax.tree.leaves(results[True][1]),
                    jax.tree.leaves(results["grads"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_per_sample_apply_matches_batched_forward():
    """The serving/eval per-device-row map (per_sample_apply) must equal the
    plain batched forward — on one device and on a dp>1 mesh."""
    from transoar_tpu.parallel import mesh as mesh_lib
    from transoar_tpu.training.trainer import per_sample_apply

    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    model = build_transoarnet(cfg)
    images, _ = synthetic_batch(cfg, batch_size=4, seed=2)
    image = jnp.asarray(images)
    params = model.init(jax.random.key(0), image)["params"]

    ref = model.apply({"params": params}, image, deterministic=True)

    mapped = jax.jit(
        lambda p, x: per_sample_apply(model, p, x))(params, image)
    for key in ref:
        np.testing.assert_allclose(np.asarray(ref[key]),
                                   np.asarray(mapped[key]),
                                   atol=2e-5, err_msg=key)

    mesh = mesh_lib.make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    db = jax.device_put(image, mesh_lib.batch_sharding(mesh))
    mapped2 = jax.jit(
        lambda p, x: per_sample_apply(model, p, x, mesh=mesh),
        out_shardings=mesh_lib.replicated(mesh))(params, db)
    for key in ref:
        np.testing.assert_allclose(np.asarray(ref[key]),
                                   np.asarray(mapped2[key]),
                                   atol=2e-5, err_msg=key)

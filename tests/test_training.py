"""End-to-end training integration tests on a synthetic dataset — the
TPU-native analogue of the reference's overfit-one-case smoke test
(scripts/train.py:34-37)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.data.dataset import get_loader
from transoar_tpu.data.synthetic import generate_dataset
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training import checkpoints as ckpt_lib
from transoar_tpu.training.train_state import (create_train_state,
                                               current_lrs, make_lr_schedule)
from transoar_tpu.training.trainer import Trainer
from transoar_tpu.utils.io import get_config, load_json


def _setup_run(tmp_path, num_classes=3, epochs=2):
    ds_root = tmp_path / "dataset"
    generate_dataset(ds_root, name="synthetic", shape=(32, 32, 16),
                     num_classes=num_classes, num_train=4, num_val=2,
                     num_test=2, seed=0)
    info = load_json(ds_root / "synthetic" / "data_info.json")

    cfg = tiny_config(num_organs=num_classes, qpo=7, patch=(32, 32, 16))
    cfg["dataset"] = "synthetic"
    cfg["trainer"]["epochs"] = epochs
    cfg["trainer"]["batch_size"] = 2
    cfg.update({k: info[k] for k in (
        "labels", "labels_small", "labels_mid", "labels_large",
        "bbox_properties")})
    return cfg, ds_root


def test_lr_schedule_step_semantics():
    sched = make_lr_schedule(1e-3, lr_drop_epochs=2, steps_per_epoch=5)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-6)


def test_train_end_to_end_and_checkpoint_roundtrip(tmp_path):
    cfg, ds_root = _setup_run(tmp_path)
    model = build_transoarnet(cfg)

    train_loader = get_loader(cfg, "train", data_dir=ds_root)
    val_loader = get_loader(cfg, "val", data_dir=ds_root)

    example = jnp.zeros((cfg["trainer"]["batch_size"], 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=len(train_loader))

    run_dir = tmp_path / "runs" / "tiny"
    cfg["debug_mode"] = False
    trainer = Trainer(cfg, model, train_loader, val_loader, run_dir,
                      state=state, log_writer=False and None)
    trainer._writer = None  # keep the test filesystem-quiet
    trainer.run()

    # losses finite and training progressed
    assert int(trainer.state.step) == 2 * len(train_loader)

    # checkpoints written with best/last semantics
    assert (run_dir / "model_last").exists()
    bests = list(run_dir.glob("model_best*"))
    assert len(bests) == 1

    # resume roundtrip restores params + counters exactly
    state2 = create_train_state(model, cfg, example, jax.random.key(1),
                                steps_per_epoch=len(train_loader))
    restored, epoch, best_val = ckpt_lib.restore_checkpoint(
        run_dir / "model_last", state2)
    assert epoch == 2
    assert best_val == trainer._metric_max_val
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lrs = current_lrs(restored, cfg, len(train_loader))
    np.testing.assert_allclose(lrs["backbone"], 2e-5 * 0.1, rtol=1e-4)
    np.testing.assert_allclose(lrs["neck"], 2e-4 * 0.1, rtol=1e-4)


def test_overfit_single_case_reduces_loss(tmp_path):
    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    cfg["overfit"] = True
    model = build_transoarnet(cfg)

    # raise LR for a fast, visible overfit signal (must be set before the
    # optimizer is built)
    cfg["trainer"]["lr"] = 1e-3
    cfg["trainer"]["lr_backbone"] = 1e-3
    cfg["trainer"]["lr_drop"] = 1000

    loader = get_loader(cfg, "train", data_dir=ds_root)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=len(loader))

    trainer = Trainer(cfg, model, loader, loader, tmp_path / "runs" / "of",
                      state=state)
    trainer._writer = None
    trainer.state = state

    first = trainer._train_one_epoch(1)
    for _ in range(6):
        last = trainer._train_one_epoch(1)
    assert np.isfinite(last["total"])
    assert last["total"] < first["total"]


def test_config_roundtrip_with_data_info(tmp_path):
    ds_root = tmp_path / "dataset"
    generate_dataset(ds_root, name="synthetic", shape=(32, 32, 16),
                     num_classes=3, num_train=2, num_val=1, num_test=1)
    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "exp.yaml").write_text(
        "experiment_name: exp\ndataset: synthetic\n")
    cfg = get_config("exp", config_dir=cfg_dir, dataset_dir=ds_root)
    assert "bbox_properties" in cfg
    assert cfg["labels"]["1"] == "organ1"


def test_auto_resume_relaunch(tmp_path, monkeypatch):
    """--auto_resume: the same command resumes from model_last if present
    (preemption-safe relaunch), else starts fresh."""
    import argparse

    from scripts.train import train

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    cfg["experiment_name"] = "ar"
    cfg["debug_mode"] = False  # tiny_config default disables ckpt writes
    monkeypatch.chdir(tmp_path)
    args = argparse.Namespace(resume=None, auto_resume=True,
                              data_dir=ds_root)

    train(dict(cfg), args)  # fresh start (no checkpoint yet)
    run_dir = tmp_path / "runs" / "ar"
    assert (run_dir / "model_last").exists()

    # relaunch with more epochs: must resume at epoch 1, not retrain it
    cfg2 = dict(cfg)
    cfg2["trainer"] = {**cfg["trainer"], "epochs": 2}
    train(cfg2, args)
    model = build_transoarnet(cfg2)
    example = jnp.zeros((2, 32, 32, 16, 1))
    st = create_train_state(model, cfg2, example, jax.random.key(0), 2)
    _, epoch, _ = ckpt_lib.restore_checkpoint(run_dir / "model_last", st)
    assert epoch == 2


def test_h2d_compression_step_equivalence():
    """Transfer compression (Trainer._compress_h2d: image bf16, seg int8)
    must leave the step semantically intact: the seg int8 path is lossless
    (identical targets), the image bf16 path only moves the bf16 rounding
    ahead of the intensity window (losses agree to bf16 tolerance)."""
    from tests.helpers import synthetic_batch, tiny_config
    from transoar_tpu.models.criterion import Criterion
    from transoar_tpu.models.transoarnet import build_transoarnet
    from transoar_tpu.training.trainer import make_train_step

    cfg = tiny_config(num_organs=3, qpo=7, patch=(32, 32, 16))
    cfg["neck"]["dropout"] = 0.0
    model = build_transoarnet(cfg)
    example = jnp.zeros((2, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=2, seed=0)
    crit = Criterion(cfg)
    rng = jax.random.key(3)

    results = {}
    for compressed in (False, True):
        if compressed:
            batch = {"image": jnp.asarray(images).astype(jnp.bfloat16),
                     "seg": jnp.asarray(seg.astype(np.int8))}
        else:
            batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
        state = create_train_state(model, cfg, example, jax.random.key(0),
                                   4)
        step = jax.jit(make_train_step(model, crit, cfg, model.anchors))
        state, losses = step(state, batch, rng)
        results[compressed] = losses

    for key in results[False]:
        np.testing.assert_allclose(
            float(results[False][key]), float(results[True][key]),
            rtol=2e-2, err_msg=key)


def test_trainer_compress_h2d_dtypes(tmp_path):
    """Trainer._compress_h2d: image -> bf16 when the run computes in bf16,
    seg -> int8 always; a trainer.precision float32 run defaults to
    float32 transfers (no silent bf16 rounding of full-precision inputs),
    and explicit h2d_dtype overrides either way."""
    from transoar_tpu.data.dataset import get_loader
    from transoar_tpu.models.transoarnet import build_transoarnet
    from transoar_tpu.training.trainer import Trainer

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    model = build_transoarnet(cfg)
    loader = get_loader(cfg, "train", data_dir=ds_root)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=max(len(loader), 1))
    trainer = Trainer(cfg, model, loader, loader, tmp_path / "runs" / "hh",
                      state=state)
    trainer._writer = None
    batch = next(iter(loader))
    comp = trainer._compress_h2d(batch)
    # tiny_config runs precision=float32 -> transfers stay float32
    assert cfg["trainer"]["precision"] == "float32"
    assert comp["image"].dtype == np.float32
    assert comp["seg"].dtype == np.int8

    # bf16-precision run: transfers default to bf16
    cfg2 = {**cfg, "trainer": {**cfg["trainer"], "precision": "bfloat16"}}
    trainer2 = Trainer(cfg2, model, loader, loader,
                       tmp_path / "runs" / "hh2", state=trainer.state)
    trainer2._writer = None
    assert trainer2._compress_h2d(batch)["image"].dtype == jnp.bfloat16

    # explicit h2d_dtype beats the precision-derived default
    cfg3 = {**cfg, "trainer": {**cfg["trainer"],
                               "precision": "bfloat16",
                               "h2d_dtype": "float32"}}
    trainer3 = Trainer(cfg3, model, loader, loader,
                       tmp_path / "runs" / "hh3", state=trainer.state)
    trainer3._writer = None
    assert trainer3._compress_h2d(batch)["image"].dtype == np.float32
    means = trainer._train_one_epoch(1)
    assert np.isfinite(means["total"])

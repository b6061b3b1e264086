"""End-to-end test of the torch-checkpoint migration tool.

Writes a reference-format checkpoint file (torch.save with the trainer's
payload keys, reference trainer.py:235-241), runs
scripts/import_torch_checkpoint.py's import path, restores the produced
Orbax run checkpoint the way scripts/test.py does, and asserts the
restored flax model reproduces the torch model's forward outputs.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.test_model_parity import _build_reference, _map_weights, _setup
from tests.helpers import tiny_config
from transoar_tpu.models.transoarnet import build_transoarnet


def test_import_torch_checkpoint_roundtrip(tmp_path, monkeypatch):
    from scripts.import_torch_checkpoint import (import_checkpoint,
                                                 load_reference_state_dict)
    from transoar_tpu.training import checkpoints as ckpt_lib
    from transoar_tpu.training.train_state import create_train_state

    cfg, ref, model, ref_out, _, _, x_np = _setup(seg_proxy=False)

    # reference-format checkpoint file
    pt = tmp_path / "model_best_0.712.pt"
    torch.save({
        "epoch": 17,
        "metric_max_val": 0.712,
        "model_state_dict": ref.state_dict(),
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
    }, pt)

    monkeypatch.chdir(tmp_path)
    sd, epoch, best = load_reference_state_dict(pt)
    assert epoch == 17 and abs(best - 0.712) < 1e-9
    target = import_checkpoint(cfg, sd, epoch, best, "imported_test")
    assert target.name == "model_best_0.712"

    # restore exactly like scripts/test.py
    run = tmp_path / "runs" / "imported_test"
    restored_cfg = ckpt_lib.load_run_config(run)
    assert restored_cfg["neck"]["num_organs"] == cfg["neck"]["num_organs"]
    example = jnp.zeros((1, *cfg["augmentation"]["patch_size"],
                         cfg["backbone"]["in_channels"]))
    state = create_train_state(model, cfg, example, jax.random.key(0))
    state, ck_epoch, ck_best = ckpt_lib.restore_checkpoint(
        ckpt_lib.pick_checkpoint(run), state)
    assert ck_epoch == 17 and abs(ck_best - 0.712) < 1e-6

    ours = model.apply({"params": state.params}, jnp.asarray(x_np),
                       deterministic=True)
    np.testing.assert_allclose(np.asarray(ours["pred_logits"]),
                               ref_out["pred_logits"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours["pred_boxes"]),
                               ref_out["pred_boxes"].numpy(), atol=2e-5)


def test_import_rejects_non_flagship(tmp_path, monkeypatch):
    from scripts.import_torch_checkpoint import import_checkpoint
    import pytest

    cfg = tiny_config(num_organs=2, qpo=7)
    cfg["neck"]["name"] = "detr"
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="flagship"):
        import_checkpoint(cfg, {}, 0, 0.0, "nope")

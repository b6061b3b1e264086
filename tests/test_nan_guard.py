"""trainer.nan_guard: non-finite-loss policy.

"skip" drops the whole update in-graph (params, optimizer moments, step
counter) when the loss goes non-finite; "error" makes the epoch loop fail
loudly; "off" (default) preserves reference behavior (NaNs propagate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import synthetic_batch, tiny_config
from transoar_tpu.models.criterion import Criterion
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import make_train_step


def _step_states(nan_guard, poison):
    cfg = tiny_config(num_organs=2, qpo=7, patch=(32, 32, 16))
    cfg["trainer"]["nan_guard"] = nan_guard
    model = build_transoarnet(cfg)
    example = jnp.zeros((2, 32, 32, 16, 1))
    images, seg = synthetic_batch(cfg, batch_size=2, seed=0)
    if poison:
        images = np.full_like(images, np.inf)
    batch = {"image": jnp.asarray(images), "seg": jnp.asarray(seg)}
    state = create_train_state(model, cfg, example, jax.random.key(0), 4)
    step = jax.jit(make_train_step(model, Criterion(cfg), cfg,
                                   model.anchors))
    new_state, losses = step(state, batch, jax.random.key(1))
    return state, new_state, losses


def test_nan_guard_skip_preserves_state_on_nonfinite_loss():
    state, new_state, losses = _step_states("skip", poison=True)
    assert not np.isfinite(float(losses["total"]))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step)  # counter skipped too


def test_nan_guard_skip_applies_normal_updates():
    state, new_state, losses = _step_states("skip", poison=False)
    assert np.isfinite(float(losses["total"]))
    assert int(new_state.step) == int(state.step) + 1
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(new_state.params))]
    assert max(diffs) > 0.0


def test_nan_guard_off_propagates():
    state, new_state, losses = _step_states("off", poison=True)
    assert not np.isfinite(float(losses["total"]))
    leaves = [np.asarray(l) for l in jax.tree.leaves(new_state.params)]
    assert any(not np.all(np.isfinite(l)) for l in leaves)


def test_nan_guard_error_raises_in_epoch(tmp_path):
    from tests.test_training import _setup_run
    from transoar_tpu.data.dataset import get_loader
    from transoar_tpu.training.trainer import Trainer

    cfg, ds_root = _setup_run(tmp_path, epochs=1)
    cfg["trainer"]["nan_guard"] = "error"
    # poison one training case on disk
    case_dirs = sorted((ds_root / "synthetic" / "train").iterdir())
    data = np.load(case_dirs[0] / "data.npy")
    np.save(case_dirs[0] / "data.npy", np.full_like(data, np.inf))

    model = build_transoarnet(cfg)
    loader = get_loader(cfg, "train", data_dir=ds_root)
    example = jnp.zeros((2, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=len(loader))
    trainer = Trainer(cfg, model, loader, loader, tmp_path / "runs" / "ng",
                      state=state)
    trainer._writer = None
    with pytest.raises(RuntimeError, match="non-finite training loss"):
        trainer._train_one_epoch(1)

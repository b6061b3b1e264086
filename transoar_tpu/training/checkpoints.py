"""Checkpointing with Orbax: best/last semantics + resume.

Mirrors the reference's scheme (trainer.py:230-241, scripts/train.py:68-77):
- ``model_last`` written every epoch;
- ``model_best_<mAP>`` written when val mAP_coco improves, deleting the
  previous best;
- checkpoints carry epoch + best-metric + full train state (params,
  optimizer state, step), so ``--resume`` restores training exactly;
- the frozen run config is written alongside (``config.json``,
  train.py:86-88) and is the only config read at test time (test.py:20-22).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from transoar_tpu.utils.io import load_json, write_json


_CHECKPOINTER = None


def _checkpointer():
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_checkpoint(path_to_run, name, state, epoch, metric_max_val):
    """Write one checkpoint directory ``<run>/<name>``.

    Multi-process safe: the filesystem cleanup (single-best policy,
    stale-target removal) runs on process 0 only, with a global barrier
    before the collective Orbax save — every process reaches ``save`` with
    the shared directory already in its final pre-save state."""
    path_to_run = Path(path_to_run).resolve()
    path_to_run.mkdir(parents=True, exist_ok=True)

    target = path_to_run / name
    if jax.process_index() == 0:
        if "best" in name:  # single best (reference trainer.py:231-233)
            for prev in path_to_run.glob("model_best*"):
                shutil.rmtree(prev, ignore_errors=True)
        if target.exists():
            shutil.rmtree(target, ignore_errors=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"transoar-ckpt-clean-{name}")

    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "metric_max_val": np.asarray(metric_max_val, np.float64),
    }
    ckptr = _checkpointer()
    ckptr.save(target, payload)
    ckptr.wait_until_finished()  # saves are async by default
    return target


def pick_checkpoint(path_to_run, prefer_best=True):
    """Choose best (if present) else last — explicit, instead of the
    reference's sort-by-path-string-length trick (test.py:33-38)."""
    path_to_run = Path(path_to_run)
    bests = sorted(path_to_run.glob("model_best*"))
    if prefer_best and bests:
        return bests[-1]
    last = path_to_run / "model_last"
    if last.exists():
        return last
    raise FileNotFoundError(f"no checkpoint found in {path_to_run}")


def restore_checkpoint(path, state):
    """Restore into an abstract-shaped copy of ``state``.

    Returns (state, epoch, metric_max_val).
    """
    path = Path(path).resolve()
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
        "metric_max_val": np.asarray(0.0, np.float64),
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    restored = _checkpointer().restore(path, abstract)
    new_state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=int(restored["step"]))
    return new_state, int(restored["epoch"]), float(restored["metric_max_val"])


def freeze_run_config(config, path_to_run):
    from transoar_tpu.utils.io import get_meta_data

    path_to_run = Path(path_to_run)
    path_to_run.mkdir(parents=True, exist_ok=True)
    frozen = dict(config)
    frozen.update(get_meta_data())
    write_json(frozen, path_to_run / "config.json")


def load_run_config(path_to_run):
    return load_json(Path(path_to_run) / "config.json")

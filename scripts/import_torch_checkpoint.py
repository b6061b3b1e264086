"""Import a reference (torch) checkpoint into a transoar-tpu run.

Migration tool for users switching from bwittmann/transoar: converts a
checkpoint written by the reference trainer
(``torch.save({'model_state_dict': ...})``, reference trainer.py:235-241)
into a ``runs/<name>/`` directory with an Orbax checkpoint + frozen config,
directly usable by ``scripts/test.py --run <name>`` (and as a warm start
via ``scripts/train.py --resume``):

    python scripts/import_torch_checkpoint.py \
        --checkpoint /path/to/model_best_0.712.pt --config foc_dec_amos \
        [--name imported_run] [--data_dir D]

The weight mapping (transpose/reshape only — lossless) lives in
``transoar_tpu/utils/torch_import.py`` and is golden-tested end to end in
tests/test_model_parity.py and tests/test_torch_import.py. The optimizer
state is NOT imported (torch AdamW moments don't map onto optax's tree
layout usefully across the two step counters); the imported run carries a
fresh optimizer, which only matters if you resume training from it.
"""

from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def load_reference_state_dict(path):
    """Read a reference checkpoint file -> (name->np.ndarray, epoch, best).

    Accepts both the trainer payload dict (reference trainer.py:235-241)
    and a bare ``state_dict``.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    epoch, best = 0, 0.0
    if isinstance(payload, dict) and "model_state_dict" in payload:
        epoch = int(payload.get("epoch", 0))
        best = float(payload.get("metric_max_val", 0.0))
        payload = payload["model_state_dict"]
    sd = {k: v.detach().cpu().numpy().copy() for k, v in payload.items()}
    return sd, epoch, best


def import_checkpoint(config, sd, epoch, best, run_name):
    from transoar_tpu.models.transoarnet import build_model
    from transoar_tpu.training import checkpoints as ckpt_lib
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.utils.torch_import import map_reference_state_dict

    neck = config.get("neck", {}).get("name", "foc_attn")
    if neck not in ("foc_attn", None) or "retina" in config:
        raise SystemExit(
            f"import supports the flagship model family (foc_attn, incl. "
            f"Swin encoder / deformable refine / seg proxy); got neck="
            f"{neck!r}. The reference only ships flagship checkpoints.")

    model = build_model(config)
    patch = config["augmentation"]["patch_size"]
    example = jnp.zeros((1, *patch, config["backbone"]["in_channels"]))
    state = create_train_state(model, config, example,
                               jax.random.key(config.get("seed", 0)))

    params = map_reference_state_dict(sd, state.params, config)
    # shape check: mapping must not have broadcast/reshaped anything wrong
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        if a.shape != b.shape:
            raise SystemExit(f"shape mismatch at {jax.tree_util.keystr(ka)}: "
                             f"init {a.shape} vs imported {b.shape}")
    state = state.replace(params=params)

    path_to_run = Path.cwd() / "runs" / run_name
    ckpt_lib.freeze_run_config(config, path_to_run)
    name = f"model_best_{best:.3f}" if best else "model_last"
    target = ckpt_lib.save_checkpoint(path_to_run, name, state, epoch, best)
    logger.info("imported %d tensors -> %s (epoch %d, best %.3f)",
                len(sd), target, epoch, best)
    return target


def main():
    from transoar_tpu.utils.io import (get_config, set_root_logger,
                                       validate_config)

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to the reference .pt checkpoint.")
    parser.add_argument("--config", type=str, required=True,
                        help="Config name in ./config (without .yaml); must "
                             "match the architecture the checkpoint was "
                             "trained with.")
    parser.add_argument("--name", type=str, default=None,
                        help="Run name (default: imported_<experiment>).")
    parser.add_argument("--data_dir", type=str, default=None)
    args = parser.parse_args()

    set_root_logger(Path.cwd() / "logs" / "import.log")
    config = validate_config(get_config(args.config,
                                        dataset_dir=args.data_dir))
    run_name = args.name or f"imported_{config['experiment_name']}"
    config = {**config, "experiment_name": run_name}

    sd, epoch, best = load_reference_state_dict(args.checkpoint)
    import_checkpoint(config, sd, epoch, best, run_name)
    print(f"run ready: runs/{run_name}  "
          f"(evaluate with: python scripts/test.py --run {run_name})")


if __name__ == "__main__":
    main()

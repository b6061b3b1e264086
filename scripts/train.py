"""Training entry point.

Public API preserved from the reference (scripts/train.py:98-118):

    python scripts/train.py --config <name> [--resume <ckpt>] [--data_dir D]

Builds loaders/model/criterion/optimizer, seeds everything, freezes the run
config to ``runs/<experiment>/config.json`` and runs the Trainer.
"""

from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
import logging
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from transoar_tpu.data.dataset import get_loader
from transoar_tpu.models.transoarnet import build_model, count_params
from transoar_tpu.parallel.mesh import mesh_from_config
from transoar_tpu.training import checkpoints as ckpt_lib
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import Trainer
from transoar_tpu.utils.io import get_config, set_root_logger, validate_config

logger = logging.getLogger(__name__)


def train(config, args):
    data_dir = args.data_dir

    model = build_model(config)
    par = config.get("parallel", {}) or {}
    if par.get("dp", -1) == -1 and par.get("sp", 1) == 1:
        # default: largest data-parallel mesh that divides the batch
        from transoar_tpu.parallel.mesh import auto_mesh

        mesh = auto_mesh(config["trainer"]["batch_size"])
    else:
        mesh = mesh_from_config(config)

    # Multi-host: each process loads only its rows of every global train
    # batch (None single-process). Validation feeds identical full batches
    # from every process, and the eval step replicates its outputs
    # (Trainer out_shardings) so every process computes the same metrics
    # and makes the same checkpoint-best decision.
    from transoar_tpu.parallel.mesh import local_batch_rows

    rows = local_batch_rows(mesh, config["trainer"]["batch_size"])
    train_loader = get_loader(config, "train", data_dir=data_dir, rows=rows)
    # overfit mode trains and validates on the same data
    # (reference train.py:34-37)
    val_split = "train" if config.get("overfit") else "val"
    val_loader = get_loader(config, val_split, data_dir=data_dir)

    patch = config["augmentation"]["patch_size"]
    batch = config["trainer"]["batch_size"]
    example = jnp.zeros((batch, *patch, config["backbone"]["in_channels"]))
    rng = jax.random.key(config["seed"])
    state = create_train_state(model, config, example, rng,
                               steps_per_epoch=max(len(train_loader), 1))
    logger.info("model parameters: %.2fM", count_params(state.params) / 1e6)

    path_to_run = Path.cwd() / "runs" / config["experiment_name"]
    resume_from = args.resume
    if not resume_from and getattr(args, "auto_resume", False):
        # preemption-safe relaunch: the same command resumes if the run
        # already has a checkpoint, else starts fresh
        last = path_to_run / "model_last"
        if last.exists():
            resume_from = last
        else:
            logger.info("--auto_resume: no checkpoint at %s, fresh start",
                        last)

    epoch, metric_start_val = 0, 0.0
    if resume_from:
        state, epoch, metric_start_val = ckpt_lib.restore_checkpoint(
            resume_from, state)
        logger.info("resumed from %s at epoch %d (best %.3f)", resume_from,
                    epoch, metric_start_val)
    ckpt_lib.freeze_run_config(config, path_to_run)

    trainer = Trainer(config, model, train_loader, val_loader, path_to_run,
                      mesh=mesh, start_epoch=epoch,
                      metric_start_val=metric_start_val, state=state, rng=rng)
    trainer.run()


def main():
    from transoar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Multi-host pods: initialize the distributed runtime when launched via
    # a cluster scheduler (env-detected; single-host runs are unaffected).
    import os

    if os.environ.get("TRANSOAR_DISTRIBUTED") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Config name in ./config (without .yaml).")
    parser.add_argument("--resume", type=str, default=None,
                        help="Path to a checkpoint directory to resume from.")
    parser.add_argument("--auto_resume", action="store_true",
                        help="Resume from runs/<experiment>/model_last if it "
                             "exists (preemption-safe relaunch), else start "
                             "fresh.")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="Dataset root (default ./dataset).")
    args = parser.parse_args()

    config = validate_config(get_config(args.config,
                                        dataset_dir=args.data_dir))

    np.random.seed(config["seed"])
    random.seed(config["seed"])

    set_root_logger(Path.cwd() / "logs" / "train.log")
    train(config, args)


if __name__ == "__main__":
    main()

"""Input-pipeline-inclusive sustained training throughput at full size.

The official bench (bench.py) times the device step on resident data; this
harness measures what a user actually gets from ``scripts/train.py``-style
training at full AMOS size (256x256x128): the C++ threaded loader +
host-thread augmentation + async H2D prefetch + the jitted train step, over
real epochs on a full-size on-disk synthetic dataset. The reference keeps
its GPU fed with 16 DataLoader worker processes
(reference dataloader.py:19-23, num_workers=16 in
config/attn_fpn_foc_dec_amos.yaml:27); this host's core budget decides
which side of step-bound/input-bound the pipeline lands on — the
components mode quantifies exactly that budget.

Modes:
  --mode components   per-stage costs: raw loader vol/s, augment_case_np
                      ms/volume, and the implied host-core budget to feed
                      the measured device step rate
  --mode train        sustained vol/s over real epochs through the Trainer
                      (flagship config; --no_aug to isolate the loader)

Writes one JSON line per measurement; results recorded in PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

DATASET = "synthetic_amos_full"
SHAPE = (256, 256, 128)
NUM_CLASSES = 20


def ensure_dataset(num_train):
    from transoar_tpu.data.synthetic import generate_dataset

    ds = REPO / "dataset" / DATASET
    if (ds / "data_info.json").exists() and \
            len(list((ds / "train").iterdir())) >= num_train:
        return ds
    print(f"generating {num_train}+4+4 cases at {SHAPE} ...", flush=True)
    return generate_dataset(REPO / "dataset", name=DATASET, shape=SHAPE,
                            num_classes=NUM_CLASSES, num_train=num_train,
                            num_val=4, num_test=4, seed=0)


def build_config(batch_size, num_workers, use_aug):
    from transoar_tpu.utils.io import get_config

    cfg = get_config("foc_dec_amos")
    cfg["dataset"] = DATASET
    # merge the generated dataset's statistics (anchors etc. derive from it)
    from transoar_tpu.utils.io import load_json

    info = load_json(REPO / "dataset" / DATASET / "data_info.json")
    cfg.update(info)
    # adapt the organ count to the dataset (the shipped config is AMOS-15;
    # queries-per-organ is the architectural constant that carries over)
    qpo = cfg["neck"]["num_queries"] // cfg["neck"]["num_organs"]
    cfg["neck"]["num_organs"] = info["num_classes"]
    cfg["neck"]["num_queries"] = qpo * info["num_classes"]
    cfg["trainer"]["batch_size"] = batch_size
    cfg["trainer"]["num_workers"] = num_workers
    cfg["augmentation"]["use_augmentation"] = use_aug
    cfg["debug_mode"] = True  # no checkpoints: measure the pipeline
    return cfg


def mode_components(args):
    cfg = build_config(args.batch_size, args.num_workers, True)
    ensure_dataset(args.cases)

    from transoar_tpu.data.dataset import get_loader
    from transoar_tpu.data.transforms import augment_case_np

    # raw loader (C++ threaded when num_workers>0): volumes/sec off disk /
    # page cache, no augmentation, no device
    loader = get_loader(cfg, "train", data_dir=REPO / "dataset")
    for _ in loader:  # warm the page cache
        pass
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["image"].shape[0]
    loader_vps = n / (time.perf_counter() - t0)

    # augmentation cost per volume on THIS host (single-threaded; the
    # loader pool scales it by the worker count)
    batch = next(iter(loader))
    img, seg = batch["image"][0], batch["seg"][0]
    stats = cfg["foreground_voxel_statistics"]
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        augment_case_np(img, seg, 1234 + i, cfg["augmentation"], stats)
    aug_ms = (time.perf_counter() - t0) / reps * 1000.0

    # host-core budget: cores needed so host augmentation keeps up with the
    # measured device step rate (bench.py r3 headline: ~15.8 vol/s/chip)
    step_vps = args.step_vps
    budget = step_vps * aug_ms / 1000.0
    result = {
        "metric": "input pipeline components (256x256x128)",
        "loader_volumes_per_sec": round(loader_vps, 3),
        "augment_ms_per_volume": round(aug_ms, 1),
        "device_step_volumes_per_sec": step_vps,
        "host_cores_needed_for_aug": round(budget, 1),
        "host_cores_available": __import__("os").cpu_count(),
    }
    print(json.dumps(result))


def mode_train(args):
    import jax

    from transoar_tpu.data.dataset import get_loader
    from transoar_tpu.models.transoarnet import build_model
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import Trainer
    from transoar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ensure_dataset(args.cases)
    cfg = build_config(args.batch_size, args.num_workers,
                       not args.no_aug)
    cfg["trainer"]["epochs"] = args.epochs
    cfg["trainer"]["val_interval"] = 10**9  # no validation: pipeline only
    import jax.numpy as jnp

    model = build_model(cfg)
    train_loader = get_loader(cfg, "train", data_dir=REPO / "dataset")
    val_loader = get_loader(cfg, "val", data_dir=REPO / "dataset")
    patch = cfg["augmentation"]["patch_size"]
    state = create_train_state(
        model, cfg, jnp.zeros((args.batch_size, *patch, 1)),
        jax.random.key(0), steps_per_epoch=max(len(train_loader), 1))

    trainer = Trainer(cfg, model, train_loader, val_loader,
                      REPO / "runs" / "pipeline_throughput", state=state,
                      log_writer=False)
    trainer._writer = None

    epoch_times = []
    steps = len(train_loader)
    vols = steps * args.batch_size
    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        trainer._train_one_epoch(epoch)
        dt = time.perf_counter() - t0
        epoch_times.append(dt)
        print(f"epoch {epoch}: {dt:.1f}s = {vols / dt:.2f} vol/s",
              flush=True)

    best = min(epoch_times[1:] or epoch_times)  # skip the compile epoch
    result = {
        "metric": "sustained training throughput incl. input pipeline "
                  "(%dx%dx%d, batch %d, aug %s, workers %d)"
                  % (*SHAPE, args.batch_size,
                     "off" if args.no_aug else "host",
                     args.num_workers),
        "value": round(vols / best, 3),
        "unit": "volumes/sec",
        "epoch_seconds": [round(t, 1) for t in epoch_times],
    }
    print(json.dumps(result))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["components", "train"],
                        required=True)
    parser.add_argument("--cases", type=int, default=32,
                        help="train cases in the on-disk dataset")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--no_aug", action="store_true",
                        help="disable augmentation (isolates loader + step)")
    parser.add_argument("--step_vps", type=float, default=15.8,
                        help="device-step vol/s (bench.py headline) used "
                             "for the core-budget arithmetic")
    args = parser.parse_args()
    {"components": mode_components, "train": mode_train}[args.mode](args)


if __name__ == "__main__":
    main()

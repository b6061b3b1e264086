"""Worker process for the real multi-process ``jax.distributed`` test.

Launched (2x) by tests/test_sharding.py::test_distributed_two_process_dp
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=2 per
process: each worker contributes 2 local CPU devices to a 4-device global
dp mesh, runs ONE jitted train step on the tiny flagship with the SAME
seeded init + batch as the single-process oracle, and prints the loss and
a parameter checksum for the test to compare.

This validates the actual multi-host path the train CLI gates on
TRANSOAR_DISTRIBUTED (scripts/train.py): global NamedSharding device_put
from per-process full values, XLA gradient psum across process boundaries,
and replicated outputs being fully-addressable on every process.
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def cross_process_tp_mesh(devices=None):
    """dp=2 x sp=1 x tp=2 mesh whose TP pairs each SPAN both processes:
    devices ordered so mesh[d, 0, :] = (a process-0 device, a process-1
    device) — GSPMD must place the tensor-parallel collectives (neck param
    all_gathers, activation reductions) across the process boundary,
    exactly where single-process mesh tests cannot look. With 4
    single-process devices (the oracle) the same logical arrangement is
    built from the local devices."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = list(devices) if devices is not None else list(jax.devices())
    assert len(devs) == 4, devs
    by_proc = {}
    for d in devs:
        by_proc.setdefault(d.process_index, []).append(d)
    if len(by_proc) == 2:
        p0, p1 = (by_proc[k] for k in sorted(by_proc))
        devs = [p0[0], p1[0], p0[1], p1[1]]
    arr = np.array(devs, dtype=object).reshape(2, 1, 2)
    return Mesh(arr, ("dp", "sp", "tp"))


def cross_process_sp_mesh(devices=None):
    """dp=2 x sp=2 mesh whose SP pairs each SPAN both processes: the
    image's spatial shards (and the conv halo exchanges GSPMD inserts
    between them) live on different processes — the one mesh axis the
    round-4 cross-process tests did not cover."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = list(devices) if devices is not None else list(jax.devices())
    assert len(devs) == 4, devs
    by_proc = {}
    for d in devs:
        by_proc.setdefault(d.process_index, []).append(d)
    if len(by_proc) == 2:
        p0, p1 = (by_proc[k] for k in sorted(by_proc))
        devs = [p0[0], p1[0], p0[1], p1[1]]
    arr = np.array(devs, dtype=object).reshape(2, 2, 1)
    return Mesh(arr, ("dp", "sp", "tp"))


def run_full_trainer(args):
    """End-to-end multi-process training: the REAL ``Trainer.run`` loop —
    epochs, validation (+ best-checkpoint writes), model_last writes — on a
    4-device dp mesh spanning two processes with row-sharded input
    feeding, followed by a resume from the shared checkpoint for one more
    epoch. Prints the final val mAP and parameter checksums for the test's
    single-process oracle comparison."""
    import jax
    import jax.numpy as jnp

    from tests.helpers import tiny_config
    from transoar_tpu.data.dataset import get_loader
    from transoar_tpu.parallel import mesh as mesh_lib
    from transoar_tpu.models.transoarnet import build_transoarnet
    from transoar_tpu.training import checkpoints as ckpt_lib
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import Trainer
    from transoar_tpu.utils.io import load_json

    work = Path(args.workdir)
    ds_root = work / "dataset"
    info = load_json(ds_root / "synthetic" / "data_info.json")
    B = 4
    cfg = tiny_config(num_organs=3, qpo=7, patch=(32, 32, 16))
    cfg["dataset"] = "synthetic"
    cfg["trainer"]["epochs"] = 2
    cfg["trainer"]["batch_size"] = B
    cfg["trainer"]["num_workers"] = 0
    cfg["debug_mode"] = False
    cfg.update({k: info[k] for k in (
        "labels", "labels_small", "labels_mid", "labels_large",
        "bbox_properties")})

    mesh = (mesh_lib.make_mesh(dp=4, sp=1) if jax.process_count() > 1
            else mesh_lib.make_mesh(dp=4, sp=1,
                                    devices=jax.devices()[:4]))
    rows = mesh_lib.local_batch_rows(mesh, B)
    train_loader = get_loader(cfg, "train", data_dir=ds_root, rows=rows)
    val_loader = get_loader(cfg, "val", data_dir=ds_root)
    model = build_transoarnet(cfg)
    example = jnp.zeros((B, 32, 32, 16, 1))
    steps = max(len(train_loader), 1)
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=steps)
    run_dir = work / "run"
    trainer = Trainer(cfg, model, train_loader, val_loader, run_dir,
                      mesh=mesh, state=state)
    trainer._writer = None
    trainer.run()

    checksum_fn = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                      for leaf in jax.tree.leaves(p)),
        out_shardings=mesh_lib.replicated(mesh))
    ck_train = float(checksum_fn(trainer.state.params))
    trainer._config = {**trainer._config, "debug_mode": True}  # no re-save
    _, scores = trainer._validate(cfg["trainer"]["epochs"])
    best = sorted(Path(run_dir).glob("model_best*"))
    assert (run_dir / "model_last").exists(), "model_last not written"
    assert best, "no best checkpoint written"

    # resume from the shared model_last for one more epoch
    cfg3 = {**cfg, "trainer": {**cfg["trainer"], "epochs": 3}}
    fresh = create_train_state(model, cfg3, example, jax.random.key(0),
                               steps_per_epoch=steps)
    restored, epoch, metric_best = ckpt_lib.restore_checkpoint(
        run_dir / "model_last", fresh)
    assert epoch == 2, epoch
    trainer2 = Trainer(cfg3, model, train_loader, val_loader, run_dir,
                       mesh=mesh, start_epoch=epoch,
                       metric_start_val=metric_best, state=restored)
    trainer2._writer = None
    trainer2.run()
    ck_resume = float(checksum_fn(trainer2.state.params))

    print(f"RESULT process={args.process_id} map={scores['mAP_coco']!r} "
          f"ck_train={ck_train!r} ck_resume={ck_resume!r}", flush=True)
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--process_id", type=int, required=True)
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--sharded_data", action="store_true",
                        help="feed only this process's batch rows "
                             "(mesh.local_batch_rows) instead of the full "
                             "global batch — validates multi-host input "
                             "sharding end to end")
    parser.add_argument("--mesh", choices=["dp", "tp", "sp"], default="dp",
                        help="dp: 4-way data parallel; tp: dp=2 x tp=2 with "
                             "each TP SHARD GROUP SPANNING BOTH PROCESSES — "
                             "the tensor-parallel collectives (neck param "
                             "all_gathers, activation psums) must cross the "
                             "process boundary; sp: dp=2 x sp=2 with the "
                             "spatial halo exchanges crossing it")
    parser.add_argument("--full_trainer", action="store_true",
                        help="run the full Trainer loop (epochs, validation,"
                             " checkpoints, resume) instead of one step")
    parser.add_argument("--workdir", default=None,
                        help="shared scratch dir for --full_trainer "
                             "(dataset + run/checkpoints)")
    args = parser.parse_args()

    import jax

    # sitecustomize pins JAX_PLATFORMS=axon before any script runs; the
    # config update (before first backend use) is the supported override
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id)

    assert jax.process_count() == args.num_processes
    if args.full_trainer:
        # 2-process x 2 local devices, or the 1-process x 4-device oracle
        assert len(jax.devices()) == 4, jax.devices()
        run_full_trainer(args)
        return
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 2 * args.num_processes

    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import synthetic_batch, tiny_config
    from transoar_tpu.models.criterion import Criterion
    from transoar_tpu.models.transoarnet import build_transoarnet
    from transoar_tpu.parallel import mesh as mesh_lib
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import make_train_step

    batch = 4
    cfg = tiny_config(num_organs=3, qpo=7, patch=(32, 32, 16))
    cfg["trainer"]["batch_size"] = batch
    model = build_transoarnet(cfg)
    example = jnp.zeros((batch, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=4)
    images, seg = synthetic_batch(cfg, batch_size=batch, seed=1)

    if args.mesh == "tp":
        mesh = cross_process_tp_mesh()
        import numpy as _np

        tp_procs = {d.process_index
                    for d in _np.asarray(mesh.devices)[0, 0, :]}
        assert tp_procs == {0, 1}, f"tp group does not span processes: " \
                                   f"{tp_procs}"
        rep = mesh_lib.replicated(mesh)
        from transoar_tpu.parallel.tp import state_shardings

        state_sh = state_shardings(state, mesh)
        state = jax.device_put(state, state_sh)
        step_fn = make_train_step(model, Criterion(cfg), cfg, model.anchors,
                                  mesh=mesh)
        step = jax.jit(step_fn, out_shardings=(state_sh, rep))
    elif args.mesh == "sp":
        mesh = cross_process_sp_mesh()
        import numpy as _np

        sp_procs = {d.process_index
                    for d in _np.asarray(mesh.devices)[0, :, 0]}
        assert sp_procs == {0, 1}, f"sp group does not span processes: " \
                                   f"{sp_procs}"
        rep = mesh_lib.replicated(mesh)
        step_fn = make_train_step(model, Criterion(cfg), cfg, model.anchors,
                                  mesh=mesh)
        step = jax.jit(step_fn, out_shardings=(rep, rep))
    else:
        mesh = mesh_lib.make_mesh(dp=4, sp=1)  # spans BOTH processes
        rep = mesh_lib.replicated(mesh)
        step_fn = make_train_step(model, Criterion(cfg), cfg, model.anchors)
        step = jax.jit(step_fn, out_shardings=(rep, rep))
    if args.sharded_data:
        # multi-host input sharding: drop the rows this process does NOT
        # own BEFORE placement — the step must still see the identical
        # global batch, assembled from per-process shards
        rows = mesh_lib.local_batch_rows(mesh, batch)
        assert rows is not None and 0 < len(rows) < batch, rows
        device_batch = mesh_lib.shard_batch(
            {"image": np.asarray(images)[rows], "seg": np.asarray(seg)[rows]},
            mesh, local_rows=rows, global_batch=batch)
    else:
        device_batch = mesh_lib.shard_batch({"image": images, "seg": seg},
                                            mesh)
    new_state, losses = step(state, device_batch, jax.random.key(1))

    total = float(losses["total"])
    # tp-sharded params have non-addressable shards; reduce them to a
    # replicated scalar INSIDE jit (jnp ops on non-fully-addressable global
    # arrays are not allowed outside)
    checksum_fn = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                      for leaf in jax.tree.leaves(p)),
        out_shardings=mesh_lib.replicated(mesh))
    checksum = float(checksum_fn(new_state.params))
    print(f"RESULT process={args.process_id} total={total!r} "
          f"checksum={checksum!r}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

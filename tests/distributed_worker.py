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
    parser.add_argument("--mesh", choices=["dp", "tp"], default="dp",
                        help="dp: 4-way data parallel; tp: dp=2 x tp=2 with "
                             "each TP SHARD GROUP SPANNING BOTH PROCESSES — "
                             "the tensor-parallel collectives (neck param "
                             "all_gathers, activation psums) must cross the "
                             "process boundary")
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

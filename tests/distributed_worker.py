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
    step_fn = make_train_step(model, Criterion(cfg), cfg, model.anchors)
    images, seg = synthetic_batch(cfg, batch_size=batch, seed=1)

    mesh = mesh_lib.make_mesh(dp=4, sp=1)  # spans BOTH processes
    rep = mesh_lib.replicated(mesh)
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
    checksum = float(sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                         for leaf in jax.tree.leaves(new_state.params)))
    print(f"RESULT process={args.process_id} total={total!r} "
          f"checksum={checksum!r}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

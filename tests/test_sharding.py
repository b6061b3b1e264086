"""Multi-chip sharding tests on the virtual 8-device CPU mesh: dp/sp train
steps compile, run, and match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import synthetic_batch, tiny_config
from transoar_tpu.models.criterion import Criterion
from transoar_tpu.models.transoarnet import build_transoarnet
from transoar_tpu.parallel import mesh as mesh_lib
from transoar_tpu.training.train_state import create_train_state
from transoar_tpu.training.trainer import make_train_step


def _build(batch):
    cfg = tiny_config(num_organs=3, qpo=7, patch=(32, 32, 16))
    cfg["trainer"]["batch_size"] = batch
    model = build_transoarnet(cfg)
    example = jnp.zeros((batch, 32, 32, 16, 1))
    state = create_train_state(model, cfg, example, jax.random.key(0),
                               steps_per_epoch=4)
    step_fn = make_train_step(model, Criterion(cfg), cfg, model.anchors)
    images, seg = synthetic_batch(cfg, batch_size=batch, seed=1)
    return cfg, model, state, step_fn, {"image": images, "seg": seg}


def test_dp_matches_single_device():
    batch = 8
    cfg, model, state, step_fn, batch_data = _build(batch)

    # single device
    step1 = jax.jit(step_fn)
    state1, losses1 = step1(state, jax.device_put(batch_data),
                            jax.random.key(1))

    # dp=8 mesh
    mesh = mesh_lib.make_mesh(dp=8, sp=1)
    rep = mesh_lib.replicated(mesh)
    step8 = jax.jit(step_fn, out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    # re-create identical initial state
    state_b = create_train_state(model, cfg,
                                 jnp.zeros((batch, 32, 32, 16, 1)),
                                 jax.random.key(0), steps_per_epoch=4)
    state8, losses8 = step8(state_b, device_batch, jax.random.key(1))

    np.testing.assert_allclose(float(losses1["total"]),
                               float(losses8["total"]), rtol=2e-4)
    # parameters after one update agree
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dp_sp_mesh_runs():
    batch = 4
    cfg, model, state, step_fn, batch_data = _build(batch)
    mesh = mesh_lib.make_mesh(dp=4, sp=2)
    rep = mesh_lib.replicated(mesh)
    step = jax.jit(step_fn, out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    _, losses = step(state, device_batch, jax.random.key(1))
    assert np.isfinite(float(losses["total"]))


def test_pad_batch_to():
    batch = {"image": np.zeros((3, 4, 4, 2, 1)), "seg": np.zeros((3, 4, 4, 2))}
    padded, mask = mesh_lib.pad_batch_to(batch, 4)
    assert padded["image"].shape[0] == 4
    assert mask.tolist() == [True, True, True, False]


def test_dp_sp_matches_single_device():
    """dp x sp sharded step must agree numerically with the unsharded step
    (same tolerance discipline as the dp-only test: allclose, not
    bit-equality — reduction orders differ across partitions)."""
    batch = 4
    cfg, model, state, step_fn, batch_data = _build(batch)

    step1 = jax.jit(step_fn)
    state1, losses1 = step1(state, jax.device_put(batch_data),
                            jax.random.key(1))

    mesh = mesh_lib.make_mesh(dp=4, sp=2)
    rep = mesh_lib.replicated(mesh)
    step_sp = jax.jit(step_fn, out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    state_b = create_train_state(model, cfg,
                                 jnp.zeros((batch, 32, 32, 16, 1)),
                                 jax.random.key(0), steps_per_epoch=4)
    state_sp, losses_sp = step_sp(state_b, device_batch, jax.random.key(1))

    np.testing.assert_allclose(float(losses1["total"]),
                               float(losses_sp["total"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dp_sp_tp_matches_single_device():
    """Full 3-axis mesh (dp=2 x sp=2 x tp=2): the tensor-parallel neck
    (head-sharded q/k/v, row-parallel out projections, hidden-sharded FFN —
    parallel/tp.py) must reproduce the unsharded step's loss and updated
    params, and the neck params must actually END UP tp-sharded."""
    from transoar_tpu.parallel.tp import state_shardings

    batch = 4
    cfg, model, state, step_fn, batch_data = _build(batch)

    step1 = jax.jit(step_fn)
    state1, losses1 = step1(state, jax.device_put(batch_data),
                            jax.random.key(1))

    mesh = mesh_lib.make_mesh(dp=2, sp=2, tp=2)
    rep = mesh_lib.replicated(mesh)
    state_b = create_train_state(model, cfg,
                                 jnp.zeros((batch, 32, 32, 16, 1)),
                                 jax.random.key(0), steps_per_epoch=4)
    state_sh = state_shardings(state_b, mesh)
    step_tp = jax.jit(step_fn, out_shardings=(state_sh, rep))
    state_b = jax.device_put(state_b, state_sh)
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    state_tp, losses_tp = step_tp(state_b, device_batch, jax.random.key(1))

    np.testing.assert_allclose(float(losses1["total"]),
                               float(losses_tp["total"]), rtol=2e-4)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(state1.params)[0])
    flat_tp = jax.tree_util.tree_flatten_with_path(state_tp.params)[0]
    sharded_axes = 0
    for path, leaf in flat_tp:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat1[path]), atol=5e-5)
        spec = leaf.sharding.spec
        if any(ax == "tp" for ax in spec):
            sharded_axes += 1
    # the flagship tiny config has a decoder layer: q/k/v + out projections
    # and both FFN denses must be tp-sharded, not silently replicated
    assert sharded_axes >= 6, f"only {sharded_axes} tp-sharded params"


def test_tp_param_rules():
    """Name-keyed sharding rules (parallel/tp.py): column-parallel q/k/v
    heads, row-parallel out projections, FFN hidden split, everything else
    replicated; fsdp extends any spec on the largest divisible free axis."""
    from jax.sharding import PartitionSpec as P

    from transoar_tpu.parallel.tp import _divides, _fsdp_spec, param_pspec

    assert param_pspec(("neck", "layer0", "self_attn", "q_proj", "kernel"),
                       (24, 4, 6)) == P(None, "tp", None)
    assert param_pspec(("neck", "layer0", "self_attn", "q_proj", "bias"),
                       (4, 6)) == P("tp", None)
    assert param_pspec(("neck", "layer0", "cross_attn", "proj", "kernel"),
                       (24, 24)) == P("tp", None)
    # row-parallel bias is added once, after the psum -> replicated
    assert param_pspec(("neck", "layer0", "cross_attn", "proj", "bias"),
                       (24,)) == P()
    assert param_pspec(("neck", "layer0", "ffn", "Dense_0", "kernel"),
                       (24, 32)) == P(None, "tp")
    assert param_pspec(("neck", "layer0", "ffn", "Dense_1", "kernel"),
                       (32, 24)) == P("tp", None)
    # DETR wraps attention in an "mha" child module
    assert param_pspec(("neck", "layer0", "cross_attn", "mha", "k_proj",
                        "kernel"), (24, 4, 6)) == P(None, "tp", None)
    assert param_pspec(("backbone", "Conv_0", "kernel"), (3, 3, 1, 24)) == P()
    assert param_pspec(("neck", "layer0", "norm_sa", "scale"), (24,)) == P()

    assert _divides(P(None, "tp", None), (24, 4, 6), 2)
    assert not _divides(P(None, "tp", None), (24, 3, 8), 2)

    assert _fsdp_spec(P(None, "tp", None), (24, 4, 6), 4) == \
        P("dp", "tp", None)
    assert _fsdp_spec(P(), (3, 3, 1, 24), 4) == P(None, None, None, "dp")
    assert _fsdp_spec(P(), (7,), 4) == P()
    assert _fsdp_spec(P("tp", None), (32, 24), 4) == P("tp", "dp")


def test_fsdp_matches_single_device():
    """ZeRO/FSDP-style param + optimizer sharding over dp
    (parallel/tp.py::state_shardings(fsdp=True)): same loss and updated
    params as the unsharded step, with the weights actually dp-sharded
    (all-gather-on-use / reduce-scatter are GSPMD-inserted)."""
    from transoar_tpu.parallel.tp import state_shardings

    batch = 4
    cfg, model, state, step_fn, batch_data = _build(batch)

    step1 = jax.jit(step_fn)
    state1, losses1 = step1(state, jax.device_put(batch_data),
                            jax.random.key(1))

    mesh = mesh_lib.make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
    rep = mesh_lib.replicated(mesh)
    state_b = create_train_state(model, cfg,
                                 jnp.zeros((batch, 32, 32, 16, 1)),
                                 jax.random.key(0), steps_per_epoch=4)
    state_sh = state_shardings(state_b, mesh, fsdp=True)
    step_f = jax.jit(step_fn, out_shardings=(state_sh, rep))
    state_b = jax.device_put(state_b, state_sh)
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    state_f, losses_f = step_f(state_b, device_batch, jax.random.key(1))

    np.testing.assert_allclose(float(losses1["total"]),
                               float(losses_f["total"]), rtol=2e-4)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(state1.params)[0])
    sharded = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            state_f.params)[0]:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat1[path]), atol=5e-5)
        if any(ax == "dp" for ax in leaf.sharding.spec):
            sharded += 1
    # most weight matrices divide by 4 — they must NOT all be replicated
    assert sharded >= 10, f"only {sharded} dp-sharded params"


def test_multi_step_dispatch_on_mesh():
    """steps_per_dispatch > 1 must run on a dp>1 mesh with the stacked
    sharding (regression: bare device_put used to fight the mesh)."""
    from transoar_tpu.training.trainer import make_multi_train_step
    from transoar_tpu.models.criterion import Criterion as Crit

    batch = 4
    cfg, model, state, _, batch_data = _build(batch)
    mesh = mesh_lib.make_mesh(dp=4, sp=2)
    rep = mesh_lib.replicated(mesh)
    multi = jax.jit(make_multi_train_step(model, Crit(cfg), cfg,
                                          model.anchors),
                    donate_argnums=(0,), out_shardings=(rep, rep))
    K = 2
    stacked = {k: np.stack([np.asarray(v)] * K) for k, v in
               batch_data.items()}
    device_batch = mesh_lib.shard_stacked_batch(stacked, mesh)
    state, losses = multi(state, device_batch, jax.random.key(1))
    assert losses["total"].shape == (K,)
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_distributed_init_single_process(tmp_path):
    """Exercise the train CLI's distributed-init hook
    (scripts/train.py: TRANSOAR_DISTRIBUTED gate) in a 1-process
    coordinator setting: jax.distributed.initialize must succeed and the
    process/device counts must be coherent."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import os\n"
        "os.environ['TRANSOAR_DISTRIBUTED'] = '1'\n"
        "jax.distributed.initialize(coordinator_address='127.0.0.1:40921',"
        " num_processes=1, process_id=0)\n"
        "assert jax.process_count() == 1\n"
        "assert len(jax.devices()) >= 1\n"
        "import jax.numpy as jnp\n"
        "print('distributed ok', float(jnp.ones(4).sum()))\n")
    res = subprocess.run([sys.executable, "-c", code], cwd=str(repo),
                         env=env, capture_output=True, text=True,
                         timeout=300)
    assert res.returncode == 0, res.stderr[-1500:]
    assert "distributed ok 4.0" in res.stdout


def test_distributed_two_process_dp(sharded_data=False):
    """REAL 2-process jax.distributed run: coordinator + worker
    subprocesses, each contributing 2 local CPU devices to one 4-device
    global dp mesh (tests/distributed_worker.py). One train step's loss and
    post-update parameter checksum must agree across BOTH processes and
    with the single-process oracle computed here — i.e. the gradient psum
    really crossed the process boundary and produced the same update."""
    import os
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        cmd = [sys.executable,
               str(repo / "tests" / "distributed_worker.py"),
               "--process_id", str(pid), "--port", str(port)]
        if sharded_data:
            cmd.append("--sharded_data")
        procs.append(subprocess.Popen(
            cmd, cwd=str(repo), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"

    results = {}
    for out, _ in outs:
        m = re.search(r"RESULT process=(\d+) total=([\d.e+-]+) "
                      r"checksum=([\d.e+-]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    # both processes saw identical replicated outputs
    assert results[0] == results[1], results

    # single-process oracle on 4 of this process's virtual devices
    batch = 4
    cfg, model, state, step_fn, batch_data = _build(batch)
    mesh = mesh_lib.make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
    rep = mesh_lib.replicated(mesh)
    step = jax.jit(step_fn, out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    new_state, losses = step(state, device_batch, jax.random.key(1))
    total = float(losses["total"])
    checksum = float(sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                         for leaf in jax.tree.leaves(new_state.params)))
    np.testing.assert_allclose(results[0][0], total, rtol=2e-4)
    np.testing.assert_allclose(results[0][1], checksum, rtol=1e-5)


def test_distributed_two_process_sharded_input():
    """Multi-host input sharding end to end: each process feeds ONLY its
    own rows of the global batch (mesh.local_batch_rows + the
    shard_batch(local_rows=...) assembly path); the step must produce the
    SAME loss and parameter update as full-batch feeding and the
    single-process oracle — i.e. the per-process shards really reassemble
    into the identical global batch."""
    test_distributed_two_process_dp(sharded_data=True)


def test_distributed_two_process_tp():
    """REAL 2-process run on a dp=2 x tp=2 mesh whose TP SHARD GROUPS SPAN
    THE PROCESS BOUNDARY (tests/distributed_worker.py
    cross_process_tp_mesh): the Megatron-sharded neck params' all_gathers
    and activation reductions must cross processes — exactly where GSPMD
    collective placement differs from any single-process mesh. Both
    processes' loss + post-update checksum must agree with each other and
    with the single-process oracle on the same logical mesh layout."""
    import os
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(subprocess.Popen(
            [sys.executable, str(repo / "tests" / "distributed_worker.py"),
             "--process_id", str(pid), "--port", str(port), "--mesh", "tp"],
            cwd=str(repo), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"

    results = {}
    for out, _ in outs:
        m = re.search(r"RESULT process=(\d+) total=([\d.e+-]+) "
                      r"checksum=([\d.e+-]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    assert results[0] == results[1], results

    # single-process oracle: same logical dp=2 x tp=2 layout on 4 local
    # virtual devices, tp-sharded state
    from tests.distributed_worker import cross_process_tp_mesh
    from transoar_tpu.parallel.tp import state_shardings

    batch = 4
    cfg, model, state, step_fn_base, batch_data = _build(batch)
    mesh = cross_process_tp_mesh(jax.devices()[:4])
    rep = mesh_lib.replicated(mesh)
    state_sh = state_shardings(state, mesh)
    state = jax.device_put(state, state_sh)
    from transoar_tpu.models.criterion import Criterion
    from transoar_tpu.training.trainer import make_train_step

    step = jax.jit(
        make_train_step(model, Criterion(cfg), cfg, model.anchors,
                        mesh=mesh),
        out_shardings=(state_sh, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    new_state, losses = step(state, device_batch, jax.random.key(1))
    checksum_fn = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                      for leaf in jax.tree.leaves(p)),
        out_shardings=rep)
    total = float(losses["total"])
    checksum = float(checksum_fn(new_state.params))
    np.testing.assert_allclose(results[0][0], total, rtol=2e-4)
    np.testing.assert_allclose(results[0][1], checksum, rtol=1e-5)


def test_local_batch_rows_and_put_local():
    """Single-process mechanics of the multi-host input path:
    local_batch_rows is None single-process (full-feed fast path), and
    _put_local with all rows reproduces device_put exactly on a dp x sp
    mesh, including the sp-sharded image layout."""
    mesh = mesh_lib.make_mesh(dp=4, sp=2)
    assert mesh_lib.local_batch_rows(mesh, 8) is None

    rng = np.random.default_rng(0)
    image = rng.normal(size=(8, 4, 4, 2, 1)).astype(np.float32)
    sharding = mesh_lib.batch_sharding(mesh)
    via_put = jax.device_put(image, sharding)
    via_local = mesh_lib._put_local(image, sharding, 8, np.arange(8))
    assert via_local.sharding.is_equivalent_to(sharding, image.ndim)
    np.testing.assert_array_equal(np.asarray(via_local), np.asarray(via_put))

    # stacked twin: batch axis 1
    stacked = rng.normal(size=(3, 8, 4, 4, 2, 1)).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P
    st_sh = NamedSharding(mesh, P(None, "dp", "sp"))
    np.testing.assert_array_equal(
        np.asarray(mesh_lib._put_local(stacked, st_sh, 8, np.arange(8),
                                       batch_axis=1)),
        np.asarray(jax.device_put(stacked, st_sh)))


def test_loader_rows_subsets_global_batches():
    """Loader(rows=...) yields exactly rows r of every global batch the
    full loader would produce — same seeded shuffle order, so the union
    over processes is the single-process epoch."""
    from transoar_tpu.data.dataset import Loader

    class _FakeDataset:
        def __len__(self):
            return 10

        def __getitem__(self, idx):
            img = np.full((2, 2, 2, 1), float(idx), np.float32)
            return img, np.full((2, 2, 2), idx, np.int32)

    full = Loader(_FakeDataset(), batch_size=4, shuffle=True, seed=7)
    part = Loader(_FakeDataset(), batch_size=4, shuffle=True, seed=7,
                  rows=np.array([1, 3]))
    fb, pb = list(full), list(part)
    assert len(fb) == len(pb) == 2
    for f, p in zip(fb, pb):
        for key in ("image", "seg", "index"):
            np.testing.assert_array_equal(p[key], f[key][[1, 3]])


def test_distributed_two_process_sp():
    """REAL 2-process run on a dp=2 x sp=2 mesh whose SP PAIRS SPAN THE
    PROCESS BOUNDARY (distributed_worker.cross_process_sp_mesh): the
    image's spatial shards — and every conv-halo exchange GSPMD inserts
    between them — live on different processes, the one axis the round-4
    cross-process tests left uncovered. Both processes' loss + post-update
    checksum must agree with each other and with the single-process oracle
    on the same logical mesh layout."""
    import os
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(subprocess.Popen(
            [sys.executable, str(repo / "tests" / "distributed_worker.py"),
             "--process_id", str(pid), "--port", str(port), "--mesh", "sp"],
            cwd=str(repo), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"

    results = {}
    for out, _ in outs:
        m = re.search(r"RESULT process=(\d+) total=([\d.e+-]+) "
                      r"checksum=([\d.e+-]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    assert results[0] == results[1], results

    # single-process oracle: same logical dp=2 x sp=2 layout
    from tests.distributed_worker import cross_process_sp_mesh
    from transoar_tpu.models.criterion import Criterion
    from transoar_tpu.training.trainer import make_train_step

    batch = 4
    cfg, model, state, _, batch_data = _build(batch)
    mesh = cross_process_sp_mesh(jax.devices()[:4])
    rep = mesh_lib.replicated(mesh)
    step = jax.jit(
        make_train_step(model, Criterion(cfg), cfg, model.anchors,
                        mesh=mesh),
        out_shardings=(rep, rep))
    device_batch = mesh_lib.shard_batch(batch_data, mesh)
    new_state, losses = step(state, device_batch, jax.random.key(1))
    total = float(losses["total"])
    checksum = float(sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                         for leaf in jax.tree.leaves(new_state.params)))
    np.testing.assert_allclose(results[0][0], total, rtol=2e-4)
    np.testing.assert_allclose(results[0][1], checksum, rtol=1e-5)


def test_distributed_two_process_full_trainer(tmp_path):
    """END-TO-END 2-process training: the full ``Trainer.run`` loop — 2
    epochs with validation, best + last checkpoint writes onto the SHARED
    filesystem (collective Orbax saves, process-0-only cleanup), then a
    ``--resume``-style restore from model_last for one more epoch — on a
    4-device dp mesh spanning both processes with row-sharded input
    feeding. Final val mAP and the post-train/post-resume parameter
    checksums must agree across processes AND with a single-process run
    of the identical schedule."""
    import os
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    from transoar_tpu.data.synthetic import generate_dataset

    repo = Path(__file__).resolve().parents[1]
    work = tmp_path / "work"
    generate_dataset(work / "dataset", name="synthetic", shape=(32, 32, 16),
                     num_classes=3, num_train=8, num_val=4, num_test=2,
                     seed=0)

    def launch(nproc, workdir):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(nproc):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=" + \
                ("2" if nproc == 2 else "4")
            procs.append(subprocess.Popen(
                [sys.executable,
                 str(repo / "tests" / "distributed_worker.py"),
                 "--process_id", str(pid), "--port", str(port),
                 "--num_processes", str(nproc), "--full_trainer",
                 "--workdir", str(workdir)],
                cwd=str(repo), env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=1200) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        results = {}
        for out, _ in outs:
            m = re.search(
                r"RESULT process=(\d+) map=([\d.e+-]+) "
                r"ck_train=([\d.e+-]+) ck_resume=([\d.e+-]+)", out)
            assert m, out
            results[int(m.group(1))] = tuple(
                float(m.group(k)) for k in (2, 3, 4))
        return results

    two = launch(2, work)
    assert set(two) == {0, 1}
    assert two[0] == two[1], two  # replicated results identical bitwise

    # single-process oracle: same schedule on one process (4 local devices)
    work1 = tmp_path / "work1"
    (work1).mkdir()
    os.symlink(work / "dataset", work1 / "dataset")
    one = launch(1, work1)
    m2, ckt2, ckr2 = two[0]
    m1, ckt1, ckr1 = one[0]
    np.testing.assert_allclose(m2, m1, atol=1e-6)
    np.testing.assert_allclose(ckt2, ckt1, rtol=1e-5)
    np.testing.assert_allclose(ckr2, ckr1, rtol=1e-5)

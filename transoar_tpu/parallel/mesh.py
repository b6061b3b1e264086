"""Device mesh + sharding rules.

The reference is single-process / single-GPU (SURVEY.md §2.3 — no
torch.distributed anywhere); parallelism is a new, first-class subsystem
here, built the TPU way: one ``jax.sharding.Mesh`` with axes

  dp — data parallel: the batch axis of volumes/targets is sharded; XLA
       inserts the gradient ``psum`` over ICI.
  sp — spatial/token parallel: the leading spatial axis of the CT volume is
       sharded; GSPMD partitions the 3D convolutions with halo exchanges and
       the decoder's flattened-token axis inherits the sharding. Use when a
       volume (or its activations) outgrows one chip's HBM.
  tp — tensor parallel: transformer-neck parameters (attention heads, FFN
       hidden dim) are sharded Megatron-style via param NamedShardings —
       see ``transoar_tpu/parallel/tp.py``. Use when the model (or its
       optimizer state) outgrows one chip, or to shrink per-chip matmuls.

Everything goes through ``jax.jit`` with ``NamedSharding`` in/out shardings —
no manual collectives; XLA chooses ``all_gather`` / ``reduce_scatter`` /
``psum`` placements over the ICI mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp=-1, sp=1, tp=1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sp = max(int(sp), 1)
    tp = max(int(tp), 1)
    if dp == -1:
        dp = n // (sp * tp)
    if dp * sp * tp != n:
        raise ValueError(f"mesh {dp}x{sp}x{tp} does not cover {n} devices")
    mesh_devices = mesh_utils.create_device_mesh((dp, sp, tp),
                                                 devices=devices)
    return Mesh(mesh_devices, ("dp", "sp", "tp"))


def mesh_from_config(config, devices=None) -> Mesh:
    par = config.get("parallel", {}) or {}
    return make_mesh(par.get("dp", -1), par.get("sp", 1), par.get("tp", 1),
                     devices=devices)


def auto_mesh(batch_size, devices=None) -> Mesh:
    """Largest dp mesh that evenly divides the batch (unused devices are
    dropped — callers wanting sp sharding should configure the mesh
    explicitly)."""
    import math

    devices = list(devices if devices is not None else jax.devices())
    dp = math.gcd(int(batch_size), len(devices))
    return make_mesh(dp=dp, sp=1, devices=devices[:dp])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Volumes [B, S0, S1, S2, C]: batch over dp, leading spatial over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def target_sharding(mesh: Mesh) -> NamedSharding:
    """Fixed-shape targets [B, ...]: batch over dp only."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_state(tree, shardings):
    """Place a process-local state pytree onto a (possibly multi-process)
    mesh.

    Single-process: plain ``device_put``. Multi-process: ``device_put``
    from a one-device-committed array onto a global sharding would need a
    cross-host transfer (unsupported on CPU and on DCN-less TPU rigs);
    instead each process materializes its OWN addressable shards from its
    local host copy via ``make_array_from_callback`` — valid because every
    process holds identical values (same seeded init, or the same restored
    checkpoint).

    ``shardings``: one NamedSharding for the whole tree, or a matching
    pytree of NamedShardings (the tp/fsdp state-sharding trees).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    one = isinstance(shardings, NamedSharding)

    def place(x, sh):
        xh = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            xh.shape, sh, lambda idx: xh[idx])

    if one:
        return jax.tree.map(lambda x: place(x, shardings), tree)
    return jax.tree.map(place, tree, shardings)


def local_batch_rows(mesh: Mesh, batch_size: int):
    """Global batch rows THIS process must load, or ``None`` single-process.

    Multi-host input sharding (SURVEY.md §5 "host data loading sharded
    per-process"): instead of every host loading/augmenting the full global
    batch and ``device_put`` discarding the non-local rows, each process
    loads only the rows some addressable device consumes. Derived from the
    sharding's own index map, so it is correct for any dp/sp/tp process
    topology (a row whose sp/tp shards span processes appears in every
    owning process's row set).
    """
    if jax.process_count() == 1:
        return None
    sharding = NamedSharding(mesh, P("dp"))
    pid = jax.process_index()
    rows = set()
    for dev, idx in sharding.devices_indices_map((int(batch_size),)).items():
        if dev.process_index == pid:
            rows.update(range(*idx[0].indices(int(batch_size))))
    return np.array(sorted(rows), dtype=np.int64)


def _put_local(value, sharding: NamedSharding, global_batch: int,
               local_rows, batch_axis: int = 0):
    """Assemble a global array from process-local batch rows.

    ``value`` holds only ``local_rows`` (sorted) along ``batch_axis``; each
    addressable device's shard is sliced out per the sharding's index map
    and the global array assembled with
    ``jax.make_array_from_single_device_arrays`` — no collective, no
    assumption about process/mesh alignment.
    """
    value = np.asarray(value)
    global_shape = (value.shape[:batch_axis] + (int(global_batch),)
                    + value.shape[batch_axis + 1:])
    pos = {int(r): i for i, r in enumerate(local_rows)}
    shards = []
    for dev, idx in sharding.addressable_devices_indices_map(
            global_shape).items():
        b = idx[batch_axis].indices(int(global_batch))
        needed = list(range(*b))
        missing = [r for r in needed if r not in pos]
        if missing:
            raise ValueError(
                f"local batch is missing global rows {missing} required by "
                f"device {dev} (have rows {sorted(pos)}; global batch "
                f"{global_batch} over {sharding.spec}) — check that the "
                f"batch size divides the dp axis and that the loader was "
                f"built with parallel.mesh.local_batch_rows(mesh, batch)")
        local_b = np.array([pos[r] for r in needed], dtype=np.int64)
        index = list(idx)
        index[batch_axis] = local_b
        shard = value[tuple(index)]
        shards.append(jax.device_put(shard, dev))
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, shards)


def shard_batch(batch: dict, mesh: Mesh, local_rows=None,
                global_batch=None) -> dict:
    """Place a host batch dict onto the mesh (image gets sp-sharding).

    With ``local_rows`` (multi-process input sharding), ``batch`` holds
    only this process's rows and ``global_batch`` is the global batch size;
    otherwise ``batch`` is the full global batch (plain ``device_put``,
    which in multi-process mode requires identical values on all hosts).
    """
    out = {}
    for key, value in batch.items():
        sharding = (batch_sharding(mesh) if key == "image"
                    else target_sharding(mesh))
        if local_rows is None:
            out[key] = jax.device_put(value, sharding)
        else:
            out[key] = _put_local(value, sharding, global_batch, local_rows)
    return out


def shard_stacked_batch(batch: dict, mesh: Mesh, local_rows=None,
                        global_batch=None) -> dict:
    """Place a K-stacked host batch dict [K, B, ...] onto the mesh: the scan
    axis K is replicated, batch over dp, the image's leading spatial axis
    over sp (the stacked twin of ``shard_batch``)."""
    out = {}
    for key, value in batch.items():
        spec = P(None, "dp", "sp") if key == "image" else P(None, "dp")
        sharding = NamedSharding(mesh, spec)
        if local_rows is None:
            out[key] = jax.device_put(value, sharding)
        else:
            out[key] = _put_local(value, sharding, global_batch, local_rows,
                                  batch_axis=1)
    return out


def pad_batch_to(batch: dict, batch_size: int) -> tuple[dict, np.ndarray]:
    """Pad a possibly short host batch to the static batch size.

    Returns (padded batch, validity mask) — keeps shapes static for jit while
    allowing ragged final batches (the reference instead drops them,
    dataloader.py:22 ``drop_last=True``).
    """
    actual = next(iter(batch.values())).shape[0]
    mask = np.zeros(batch_size, bool)
    mask[:actual] = True
    if actual == batch_size:
        return batch, mask
    out = {}
    for key, value in batch.items():
        pad = [(0, batch_size - actual)] + [(0, 0)] * (value.ndim - 1)
        out[key] = np.pad(value, pad)
    return out, mask

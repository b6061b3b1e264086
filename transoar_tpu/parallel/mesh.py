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


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh (image gets sp-sharding)."""
    out = {}
    for key, value in batch.items():
        spec = batch_sharding(mesh) if key == "image" else target_sharding(mesh)
        out[key] = jax.device_put(value, spec)
    return out


def shard_stacked_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a K-stacked host batch dict [K, B, ...] onto the mesh: the scan
    axis K is replicated, batch over dp, the image's leading spatial axis
    over sp (the stacked twin of ``shard_batch``)."""
    out = {}
    for key, value in batch.items():
        spec = P(None, "dp", "sp") if key == "image" else P(None, "dp")
        out[key] = jax.device_put(value, NamedSharding(mesh, spec))
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

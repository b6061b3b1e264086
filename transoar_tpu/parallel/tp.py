"""Tensor parallelism (the mesh's ``tp`` axis): GSPMD param-sharding rules.

The reference is single-GPU (SURVEY.md §2.3) — tensor parallelism is a new,
TPU-first subsystem. The design is the standard Megatron split expressed the
XLA way: instead of manual collectives, parameters of the transformer neck
get ``NamedSharding`` annotations over the ``tp`` mesh axis and GSPMD
propagates the sharding through the matmuls, inserting the ``psum`` after
each row-parallel projection over ICI:

- attention q/k/v projections (``DenseGeneral`` kernels ``[d, H, hd]``) are
  column-parallel over the HEAD axis — each tp shard computes ``H/tp`` heads;
- the attention output projection and the FFN down-projection are
  row-parallel (contraction axis sharded → partial sums → one all-reduce);
- the FFN up-projection is column-parallel over the hidden dim.

Scope: modules named ``self_attn`` / ``cross_attn`` (q/k/v/out projections)
and ``ffn`` (the two Dense layers) — i.e. the transformer decoder neck where
``d_model``/``dim_feedforward`` live. The convolutional backbone stays
replicated under tp (its parallel axes are dp/sp; at C ≤ 384 channels a
channel split would starve the MXU, PERFORMANCE.md §24-lane cap).

The same rule tree shards the AdamW moments: optax state trees mirror the
param tree, so the trailing path of every moment leaf matches its parameter
and inherits its spec — optimizer memory scales down with tp like the
params do.

Everything is numerically exact (tested vs the unsharded step,
tests/test_sharding.py::test_dp_sp_tp_matches_single_device): sharding only
changes reduction grouping, not semantics.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ATTN = ("self_attn", "cross_attn", "mha")  # "mha": DETR cross-attn wrapper
_COLUMN_PROJ = ("q_proj", "k_proj", "v_proj")
_ROW_PROJ = ("out_proj", "proj")


def param_pspec(path_keys, shape):
    """PartitionSpec over the ``tp`` axis for one parameter (or optimizer
    moment) leaf, keyed on the TRAILING flax module path — the same rule
    therefore applies to ``params`` and to every optax state tree that
    mirrors it (AdamW mu/nu under ``multi_transform``).

    Returns a replicated spec for anything outside the transformer neck
    pattern or whose sharded dim would not divide (callers pass the tp size
    through ``divides``).
    """
    keys = list(path_keys)
    if not keys:
        return P()
    leaf = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    grand = keys[-3] if len(keys) >= 3 else ""

    if grand in _ATTN:
        if parent in _COLUMN_PROJ:
            # DenseGeneral -> kernel [d_model, H, hd], bias [H, hd]:
            # shard the head axis (column parallel)
            if leaf == "kernel" and len(shape) == 3:
                return P(None, "tp", None)
            if leaf == "bias" and len(shape) == 2:
                return P("tp", None)
        elif parent in _ROW_PROJ:
            # output projection kernel [H*hd, d_model]: shard the
            # contraction axis (row parallel); bias stays replicated —
            # it is added once, after the psum
            if leaf == "kernel" and len(shape) == 2:
                return P("tp", None)
    elif grand == "ffn":
        if parent == "Dense_0":  # up-projection [d_model, dim_ff]
            if leaf == "kernel" and len(shape) == 2:
                return P(None, "tp")
            if leaf == "bias" and len(shape) == 1:
                return P("tp")
        elif parent == "Dense_1":  # down-projection [dim_ff, d_model]
            if leaf == "kernel" and len(shape) == 2:
                return P("tp", None)
    return P()


def _path_key_names(path):
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", None)
        if key is None:
            key = getattr(entry, "idx", None)
        names.append(str(key))
    return names


def _divides(spec, shape, tp):
    for axis, name in enumerate(spec):
        if name == "tp" and (axis >= len(shape) or shape[axis] % tp != 0):
            return False
    return True


def _fsdp_spec(spec, shape, dp):
    """Extend ``spec`` with a ``dp`` shard on the largest still-replicated
    axis that divides — ZeRO-3/FSDP-style weight + optimizer sharding.

    GSPMD turns this into all-gather-on-use for the forward/backward and
    reduce-scatter for the gradients; the optimizer update runs on each
    shard. Composes with tp (different axes of the same leaf).
    """
    names = list(spec) + [None] * (len(shape) - len(spec))
    candidates = [(shape[i], i) for i in range(len(shape))
                  if names[i] is None and shape[i] % dp == 0 and shape[i] > 1]
    if not candidates:
        return P(*names) if any(n is not None for n in names) else P()
    _, axis = max(candidates)
    names[axis] = "dp"
    return P(*names)


def state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree for a full TrainState over ``mesh``.

    Leaves matching the neck pattern (params AND mirrored optimizer
    moments) are tp-sharded; with ``fsdp`` every shardable leaf is
    additionally split over the dp axis (ZeRO-style — weights and AdamW
    moments stop being replicated per data-parallel rank). Everything else
    is replicated; with tp == 1 and fsdp off this degenerates to the
    all-replicated tree the dp/sp paths use.
    """
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)

    def shard_one(path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = P()
        if tp > 1:
            cand = param_pspec(_path_key_names(path), shape)
            if _divides(cand, shape, tp):
                spec = cand
        if fsdp and dp > 1 and len(shape) >= 1:
            spec = _fsdp_spec(spec, shape, dp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard_one, state)

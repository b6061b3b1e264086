"""Analytical MXU roofline for any config's full train step (no TPU needed).

Abstract-traces the REAL jitted train step (the same ``make_train_step``
graph ``bench.py`` times, conv decompositions and grads-scan included) with
``jax.make_jaxpr`` — no compute, no device — then walks the jaxpr counting
MXU work: every ``conv_general_dilated`` and ``dot_general``, scan bodies
multiplied by trip count. Two numbers per op:

- raw FLOPs: 2 * output_elements * contraction_size;
- lane-padded FLOPs: the same with every contraction/output channel dim
  rounded up to the MXU tile (128 lanes, 8 sublanes) — what the systolic
  array actually executes when channels are narrow (this is the whole
  story for the C<=48 encoder stages; see PERFORMANCE.md roofline
  accounting, round 3).

The achievable-bound column divides by the v5e bf16 peak (197 TFLOP/s);
an op with f32 operands gets the f32 peak (~99 TFLOP/s). This bounds
step time from below by MXU occupancy alone — HBM traffic, copies and
VPU work can only add; the bench-vs-bound ratio is the honest "how far
from speed-of-light" figure the VERDICT asks for (retina_amos first).

Usage:
    python scripts/roofline.py --config retina_amos --batch_size 2
    python scripts/roofline.py            # flagship foc_dec_amos
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PEAK_BF16 = 197e12  # v5e MXU peak, bf16 * bf16 -> f32
PEAK_F32 = 99e12

LANES = 128   # MXU minor-dim tile
SUBLANES = 8


def _pad(n, tile):
    return -(-n // tile) * tile


def _conv_flops(eqn):
    """conv_general_dilated: 2 * out_spatial * Cout * (k^3 * Cin) * B."""
    out = eqn.outvars[0].aval
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    dnums = eqn.params["dimension_numbers"]
    feature_group_count = eqn.params.get("feature_group_count", 1)
    # rhs shape: spatial taps x Cin x Cout positions per dimension_numbers
    rhs_shape = list(rhs.shape)
    ci = rhs_shape[dnums.rhs_spec[1]]
    co = rhs_shape[dnums.rhs_spec[0]]
    taps = 1
    for d in dnums.rhs_spec[2:]:
        taps *= rhs_shape[d]
    out_elems = 1
    for s in out.shape:
        out_elems *= s
    contraction = taps * ci
    raw = 2 * out_elems * contraction
    # lane padding: Cout (minor, lanes) and the contraction (sublane side
    # streams k*Cin) — pad channels, keep the spatial tap count exact
    out_pad = out_elems // co * _pad(co, LANES)
    contraction_pad = taps * _pad(ci, SUBLANES)
    padded = 2 * out_pad * contraction_pad
    dtype = lhs.dtype
    return raw, padded, str(dtype), feature_group_count


def _dot_flops(eqn):
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    out = eqn.outvars[0].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    contraction = 1
    for d in lc:
        contraction *= lhs.shape[d]
    out_elems = 1
    for s in out.shape:
        out_elems *= s
    raw = 2 * out_elems * contraction
    # minor output dim -> lanes; contraction -> sublanes
    minor = out.shape[-1] if out.shape else 1
    out_pad = (out_elems // max(minor, 1)) * _pad(max(minor, 1), LANES)
    padded = 2 * out_pad * _pad(contraction, SUBLANES)
    return raw, padded, str(lhs.dtype)


def walk(jaxpr, mult, acc):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            raw, padded, dt, _ = _conv_flops(eqn)
            acc[("conv", dt)][0] += raw * mult
            acc[("conv", dt)][1] += padded * mult
        elif prim == "dot_general":
            raw, padded, dt = _dot_flops(eqn)
            acc[("dot", dt)][0] += raw * mult
            acc[("dot", dt)][1] += padded * mult
        elif prim == "scan":
            length = eqn.params["length"]
            walk(eqn.params["jaxpr"].jaxpr, mult * length, acc)
        elif prim == "while":
            # fixed-shape loops (NMS etc.) — bound trip count by cond
            # unknown; count body once (lower bound, negligible MXU work)
            walk(eqn.params["body_jaxpr"].jaxpr, mult, acc)
        elif prim == "cond":
            branches = eqn.params["branches"]
            if branches:
                walk(branches[-1].jaxpr, mult, acc)  # max-work branch
        elif prim in ("pjit", "closed_call", "core_call", "custom_jvp_call",
                      "custom_vjp_call", "custom_vjp_call_jaxpr",
                      "remat", "checkpoint", "custom_lin"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") \
                or eqn.params.get("fun_jaxpr")
            if inner is not None:
                walk(getattr(inner, "jaxpr", inner), mult, acc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--patch", type=int, nargs=3, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # abstract trace only
    import jax.numpy as jnp
    import numpy as np

    from transoar_tpu.models.criterion import build_criterion
    from transoar_tpu.models.transoarnet import build_model
    from transoar_tpu.presets import fill_synthetic_stats, flagship_config
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import make_train_step
    from transoar_tpu.utils.io import get_config

    if args.config:
        config = fill_synthetic_stats(get_config(args.config))
        config["trainer"]["batch_size"] = args.batch_size
        if args.patch:
            config["augmentation"]["patch_size"] = list(args.patch)
    else:
        config = flagship_config(batch_size=args.batch_size,
                                 patch_size=args.patch)
        config["trainer"]["microbatch"] = "grads"
    config["backbone"]["remat"] = False

    batch = config["trainer"]["batch_size"]
    patch = tuple(config["augmentation"]["patch_size"])
    model = build_model(config)
    example = jnp.zeros((1, *patch, 1), jnp.float32)
    state = create_train_state(model, config, example, jax.random.key(0),
                               steps_per_epoch=100)
    step = make_train_step(model, build_criterion(config), config,
                           model.anchors)

    data = {
        "image": jnp.zeros((batch, *patch, 1), jnp.float32),
        "seg": jnp.zeros((batch, *patch), jnp.int32),
    }
    print(f"tracing {args.config or 'foc_dec_amos (flagship)'} "
          f"batch={batch} patch={patch} ...", flush=True)
    jaxpr = jax.make_jaxpr(step)(state, data, jax.random.key(1))

    acc = defaultdict(lambda: [0.0, 0.0])
    walk(jaxpr.jaxpr, 1, acc)

    total_raw = total_padded = bound_s = 0.0
    print(f"\n{'kind':6s} {'dtype':10s} {'raw TFLOP':>10s} "
          f"{'lane-padded':>12s} {'bound ms':>9s}")
    for (kind, dt), (raw, padded) in sorted(acc.items()):
        peak = PEAK_F32 if "32" in dt else PEAK_BF16
        ms = padded / peak * 1e3
        bound_s += padded / peak
        total_raw += raw
        total_padded += padded
        print(f"{kind:6s} {dt:10s} {raw / 1e12:10.3f} "
              f"{padded / 1e12:12.3f} {ms:9.2f}")

    per_vol_ms = bound_s / batch * 1e3
    print(f"\ntotal: raw {total_raw / 1e12:.3f} TFLOP/step, lane-padded "
          f"{total_padded / 1e12:.3f} TFLOP/step (batch {batch})")
    print(f"MXU-only achievable bound: {bound_s * 1e3:.1f} ms/step = "
          f"{per_vol_ms:.1f} ms/volume -> {1e3 / per_vol_ms:.2f} vol/s "
          f"speed-of-light")


if __name__ == "__main__":
    main()

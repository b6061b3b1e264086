"""XLA compiler-option sweep on the full flagship train step (VERDICT r4 #6a).

The flagship has sat at ~15.8 vol/s for three rounds with 7.8 ms/step of
profile-attributed layout copies at conv decomposition boundaries
(PERFORMANCE.md, batch-1 copy attribution). The round-4 verdict asks for an
experimental answer: either a flag setting that recovers part of it, or a
recorded flag -> vol/s matrix proving XLA's defaults are already the best
reachable point.

Mechanism: per-compile ``compiler_options`` on ``jax.jit(...).lower(...)``
— these serialize into the compile request, so they reach the service-side
TPU compiler through the axon remote-compile path (local ``XLA_FLAGS`` only
configures the local client). Unknown options fail that one compile with a
service-side error, which the sweep records as "rejected" and moves on.

Timing uses bench.py's machinery unchanged (donated chained multi-step
dispatches, scalar-fetch sync).

Usage: timeout 7200 python scripts/sweep_xla_flags.py [--batch_size 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Candidate option sets: public TPU XLA knobs plausibly coupled to layout
# assignment / fusion sizing at conv boundaries. Each entry is tried
# independently against the baseline (empty options).
# Ordered most-promising-first so a wall-clock timeout truncates the tail,
# not the head (per-candidate results print as they land).
CANDIDATES = [
    ("baseline", {}),
    # read-write-back fusion (elementwise consumers fused into producers'
    # output loops — exactly the conv->IN/ReLU boundary)
    ("rwb_off", {"xla_tpu_rwb_fusion": "False"}),
    # scoped-vmem budget bounds fusion size; larger budgets let the fusion
    # emitter keep conv prologue/epilogue (pad/slice/convert) in one kernel
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # latency-hiding scheduler reorders to overlap copies with compute
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "True"}),
]

# Lower-priority candidates, run only with --only (each costs a full-size
# service-side compile; the head of the list answers the conv-boundary
# question, these probe secondary knobs):
EXTRA_CANDIDATES = [
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem_16m", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
    # dot strength reduction rewrites thin dots into reductions — off keeps
    # them on the MXU
    ("no_dot_strength_red",
     {"xla_tpu_enable_dot_strength_reduction": "False"}),
    # aggressive loop fusion variants
    ("no_nested_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "False"}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--patch", type=int, nargs=3, default=(256, 256, 128))
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--scan_steps", type=int, default=8)
    p.add_argument("--only", default=None,
                   help="comma-separated candidate names to run")
    args = p.parse_args()

    import jax

    from bench import build_benchmark

    state0, _, batch = build_benchmark(args.batch_size, tuple(args.patch),
                                       scan_steps=args.scan_steps)
    # rebuild the UNJITTED step so each candidate compiles fresh with its
    # own options; build_benchmark returns the jitted one, so re-derive
    from transoar_tpu.models.criterion import build_criterion
    from transoar_tpu.models.transoarnet import build_model
    from transoar_tpu.presets import flagship_config
    from transoar_tpu.training.trainer import make_multi_train_step

    config = flagship_config(batch_size=args.batch_size,
                             patch_size=tuple(args.patch))
    config["backbone"]["remat"] = False
    config["trainer"]["microbatch"] = "grads"
    model = build_model(config)
    raw_step = make_multi_train_step(model, build_criterion(config), config,
                                     model.anchors)

    rng = jax.random.key(0)
    # donation invalidates the state each run — keep a host snapshot and
    # re-place it per candidate
    state_host = jax.device_get(state0)
    del state0
    results = {}
    names = args.only.split(",") if args.only else None
    pool = CANDIDATES + (EXTRA_CANDIDATES if names else [])
    for name, opts in pool:
        if names and name not in names:
            continue
        print(f"--- {name}: {opts}", flush=True)
        # Bool-value casing differs per parser: DebugOptions proto fields
        # want "True"/"False", libtpu env-style overrides want
        # "true"/"false". Try as written, then the flipped casing.
        tries = [opts]
        flipped = {k: ({"True": "true", "False": "false", "true": "True",
                        "false": "False"}.get(v, v)) for k, v in
                   opts.items()}
        if flipped != opts:
            tries.append(flipped)
        compiled = None
        for attempt in tries:
            try:
                t0 = time.time()
                state = jax.device_put(state_host)
                compiled = (jax.jit(raw_step, donate_argnums=(0,))
                            .lower(state, batch, rng)
                            .compile(compiler_options=attempt or None))
                compile_s = time.time() - t0
                opts = attempt
                break
            except Exception as exc:
                print(f"    rejected ({attempt}): {type(exc).__name__}: "
                      f"{str(exc)[:300]}", flush=True)
                results[name] = {"opts": attempt,
                                 "rejected": str(exc)[:300]}
        if compiled is None:
            continue
        for _ in range(args.warmup):
            state, losses = compiled(state, batch, rng)
        float(losses["total"][-1])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, losses = compiled(state, batch, rng)
        float(losses["total"][-1])
        dt = time.perf_counter() - t0
        vols = args.batch_size * args.scan_steps * args.steps / dt
        results[name] = {"opts": opts, "vol_per_s": round(vols, 3),
                         "compile_s": round(compile_s, 1)}
        print(f"    {vols:.2f} vol/s (compile {compile_s:.0f}s)",
              flush=True)
        del state, compiled

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

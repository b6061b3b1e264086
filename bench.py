"""Benchmark: CT volumes/sec/chip on the flagship training step.

Measures the full jitted training step (on-device bbox-target derivation +
forward + matching + loss + backward + AdamW update) of the Focused Decoder
+ AttnFPN flagship on AMOS-shaped volumes (256x256x128), on whatever
accelerator JAX exposes. By default BOTH batch sizes are measured: batch 2
(the reference workload, ``config/attn_fpn_foc_dec_amos.yaml`` batch_size)
is the headline; batch 1 is reported alongside. ``--batch_size N`` restricts
to one size (headline = that size).

Baseline: the reference publishes no throughput numbers (BASELINE.md §1).
``REFERENCE_VOLUMES_PER_SEC`` is a documented estimate of the reference
PyTorch pipeline on its README-era GPU (single V100/RTX-class card, AMP,
batch 2, CPU matcher round-trip each step — conservatively ~1 step/s =
2 volumes/s). ``vs_baseline`` is measured/estimate; the driver's north star
is >= 5x (BASELINE.json).

Sync discipline (PERFORMANCE.md §Measurement traps): through the axon
tunnel ``jax.block_until_ready`` can return before device completion, so
timing boundaries fetch a loss SCALAR (``float(...)``) — the dispatches
chain through the donated train state, so fetching the last step's loss
forces completion of the whole timed region.

Prints exactly one JSON line.

``--mode eval`` measures serving throughput instead (deterministic forward
+ prediction decode, no optimizer): informational, not the official
headline; its ``vs_baseline`` still divides by the train-step estimate.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VOLUMES_PER_SEC = 2.0  # documented estimate, see module docstring


def build_benchmark(batch_size, patch, scan_steps=8, microbatch=None,
                    config_name=None):
    from transoar_tpu.models.criterion import build_criterion
    from transoar_tpu.models.transoarnet import build_model
    from transoar_tpu.presets import fill_synthetic_stats, flagship_config
    from transoar_tpu.training.train_state import create_train_state
    from transoar_tpu.training.trainer import make_multi_train_step
    from transoar_tpu.utils.io import get_config

    if config_name:
        # variant benchmarks (--config detr_amos / def_detr_amos /
        # retina_amos / swin_fpn_visceral / foc_dec_visceral ...): the
        # shipped full-size config with synthetic dataset statistics
        config = fill_synthetic_stats(get_config(config_name))
        config["trainer"]["batch_size"] = batch_size
        config["augmentation"]["patch_size"] = list(patch)
    else:
        config = flagship_config(batch_size=batch_size, patch_size=patch)
    # encoder remat trades ~30% step time for HBM; only needed at batch >= 2
    config["backbone"]["remat"] = False
    # perf experiment hook: depth-packed stage-0 chain (ops/conv3d.py)
    import os
    pack = int(os.environ.get("TRANSOAR_STAGE0_PACK", "0"))
    if pack:
        config["backbone"]["stage0_pack"] = pack
    pack2 = int(os.environ.get("TRANSOAR_STAGE1PLUS_PACK", "0"))
    if pack2:
        config["backbone"]["stage1plus_pack"] = pack2
    if os.environ.get("TRANSOAR_PACK_B1"):
        config["backbone"]["stage0_pack_batch1"] = True
    if os.environ.get("TRANSOAR_ROI_MATMUL"):
        config["neck"]["roi_matmul"] = True
    # "grads" = exact per-sample fwd+bwd accumulation (trainer.py): the
    # scan body is the fast batch-1 graph, so batch-2 matches batch-1
    # per-volume speed (15.8 vs 13.2 vol/s plain-batched; the lax.map
    # forward-only variant measured 11.2). Exactness is test-pinned
    # (tests/test_microbatch.py); auto = grads for the flagship criterion,
    # the config's own setting for variants (grads is only exact for the
    # focused-decoder Criterion without seg proxy — trainer.py gates it).
    if microbatch is not None:
        config["trainer"]["microbatch"] = microbatch
    elif not config_name:
        config["trainer"]["microbatch"] = "grads"
    model = build_model(config)

    example = jnp.zeros((batch_size, *patch, 1))
    state = create_train_state(model, config, example, jax.random.key(0),
                               steps_per_epoch=100)

    # same per-compile XLA overrides the Trainer honors (trainer.xla_options;
    # measured matrix in PERFORMANCE.md §XLA option sweep)
    xla_opts = dict(config["trainer"].get("xla_options") or {}) or None
    train_step = jax.jit(
        make_multi_train_step(model, build_criterion(config), config,
                              model.anchors),
        donate_argnums=(0,), compiler_options=xla_opts)

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.normal(size=(batch_size, *patch, 1)).astype(np.float32))
    seg = np.zeros((batch_size, *patch), np.int32)
    # populate organs roughly where the synthetic priors put them
    for cls, props in config["bbox_properties"].items():
        c = np.asarray(props["median"][:3]) * np.asarray(patch)
        s = np.maximum(np.asarray(props["median"][3:]) * np.asarray(patch), 8)
        lo = np.maximum((c - s / 2).astype(int), 0)
        hi = np.minimum((c + s / 2).astype(int), patch)
        seg[:, lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = int(cls)
    seg = jnp.asarray(seg)

    # stack scan_steps batches for one-dispatch multi-step execution
    batch = {
        "image": jnp.broadcast_to(image[None],
                                  (scan_steps, *image.shape)),
        "seg": jnp.broadcast_to(seg[None], (scan_steps, *seg.shape)),
    }
    return state, train_step, batch


def build_eval_benchmark(batch_size, patch, scan_steps=8):
    """Serving throughput: the deterministic forward + prediction decode.

    The axon runtime memoizes repeated identical dispatches (PERFORMANCE.md
    §Measurement traps), so the image carry is DONATED and each scan
    iteration's input depends on the previous output through a numerically
    negligible coupling (+1e-30·mean(logits) — not constant-foldable), the
    same chaining discipline the train bench gets from its donated state.
    """
    from transoar_tpu.models.transoarnet import build_transoarnet
    from transoar_tpu.presets import flagship_config
    from transoar_tpu.training.inference import decode_predictions
    from transoar_tpu.training.trainer import per_sample_apply

    config = flagship_config(batch_size=batch_size, patch_size=patch)
    config["backbone"]["remat"] = False
    model = build_transoarnet(config)

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.normal(size=(batch_size, *patch, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), image)["params"]

    def eval_chain(image):
        def body(carry, _):
            # per-sample map: batch-N serving at batch-1 per-volume speed
            # (batched forwards re-pay the conv slice penalty; trainer.py
            # per_sample_apply)
            out = per_sample_apply(model, params, carry)
            scores, boxes = decode_predictions(out["pred_logits"],
                                               out["pred_boxes"])
            carry = carry + 1e-30 * out["pred_logits"].mean()
            return carry, scores[0, 0]

        return jax.lax.scan(body, image, None, length=scan_steps)

    step = jax.jit(eval_chain, donate_argnums=(0,))
    return step, image


def measure_eval(batch_size, patch, steps, warmup, scan_steps):
    step, image = build_eval_benchmark(batch_size, patch, scan_steps)

    for _ in range(warmup):
        image, scores = step(image)
    float(scores[-1])  # scalar fetch: real sync through the tunnel

    t0 = time.perf_counter()
    for _ in range(steps):
        image, scores = step(image)
    float(scores[-1])
    elapsed = time.perf_counter() - t0
    return (batch_size * scan_steps * steps) / elapsed


def measure(batch_size, patch, steps, warmup, scan_steps, microbatch,
            config_name=None):
    state, train_step, batch = build_benchmark(
        batch_size, patch, scan_steps=scan_steps, microbatch=microbatch,
        config_name=config_name)
    rng = jax.random.key(0)

    def sync(losses):
        # scalar fetch — block_until_ready can return early on the axon
        # tunnel (PERFORMANCE.md §Measurement traps); dispatches chain
        # through the donated state, so this drains the whole queue
        return float(losses["total"][-1])

    for _ in range(warmup):
        state, losses = train_step(state, batch, rng)
    sync(losses)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = train_step(state, batch, rng)
    sync(losses)
    elapsed = time.perf_counter() - t0
    return (batch_size * scan_steps * steps) / elapsed


def main():
    from transoar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=None,
                        help="measure one batch size only (default: both "
                             "2 — the reference workload, headline — and 1)")
    parser.add_argument("--config", type=str, default=None,
                        help="bench a shipped variant config (detr_amos, "
                             "def_detr_amos, retina_amos, swin_fpn_visceral, "
                             "foc_dec_visceral, ...) instead of the flagship")
    parser.add_argument("--patch", type=int, nargs=3, default=None,
                        help="volume shape (default: the config's own "
                             "patch_size; 256 256 128 for the flagship)")
    parser.add_argument("--steps", type=int, default=10,
                        help="number of multi-step dispatches to time")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--scan_steps", type=int, default=8,
                        help="train steps fused into one dispatch")
    parser.add_argument("--microbatch",
                        choices=["auto", "on", "off", "grads"],
                        default="auto")
    parser.add_argument("--mode", choices=["train", "eval"], default="train",
                        help="train = full training step (the official "
                             "headline); eval = serving forward + decode")
    args = parser.parse_args()

    microbatch = {"auto": None, "on": True, "off": False,
                  "grads": "grads"}[args.microbatch]
    if args.patch is not None:
        patch = tuple(args.patch)
    elif args.config:
        from transoar_tpu.utils.io import get_config

        patch = tuple(get_config(args.config)["augmentation"]["patch_size"])
    else:
        patch = (256, 256, 128)
    sizes = [args.batch_size] if args.batch_size else [2, 1]
    if args.mode == "eval":
        vols = {
            b: measure_eval(b, patch, args.steps, args.warmup,
                            args.scan_steps)
            for b in sizes
        }
    else:
        vols = {
            b: measure(b, patch, args.steps, args.warmup, args.scan_steps,
                       microbatch, config_name=args.config)
            for b in sizes
        }

    headline = sizes[0]
    kind = ("train step" if args.mode == "train"
            else "inference fwd+decode")
    name = args.config if args.config else "Focused Decoder"
    result = {
        "metric": "CT volumes/sec/chip (%s %s, "
                  "%dx%dx%d, batch %d)" % (name, kind, *patch, headline),
        "value": round(vols[headline], 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vols[headline] / REFERENCE_VOLUMES_PER_SEC, 4),
    }
    for b in sizes[1:]:
        result[f"batch{b}_volumes_per_sec"] = round(vols[b], 4)
        result[f"batch{b}_vs_baseline"] = round(
            vols[b] / REFERENCE_VOLUMES_PER_SEC, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

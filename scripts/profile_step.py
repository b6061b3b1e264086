"""Capture a device trace of the flagship train step and print the op-level
time attribution (the round-2/3 optimization workflow, PERFORMANCE.md
§Measurement notes).

Runs the bench workload (donated chained multi-step dispatches so nothing
is memoized) under ``jax.profiler``, then parses the perfetto trace and
aggregates device time by HLO op-name prefix.

Usage: python scripts/profile_step.py [--batch_size 2] [--steps 3]
       [--top 40] [--patch 256 256 128]
"""

import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def capture(batch_size, patch, steps, scan_steps, logdir, config_name=None):
    import jax

    from bench import build_benchmark
    from transoar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    state, train_step, batch = build_benchmark(batch_size, patch,
                                               scan_steps=scan_steps,
                                               config_name=config_name)
    rng = jax.random.key(0)
    # warmup/compile outside the trace
    state, losses = train_step(state, batch, rng)
    float(losses["total"][-1])

    jax.profiler.start_trace(str(logdir))
    for _ in range(steps):
        state, losses = train_step(state, batch, rng)
    float(losses["total"][-1])
    jax.profiler.stop_trace()


def attribute(logdir, top, total_dispatches):
    traces = sorted(glob.glob(
        str(Path(logdir) / "**" / "*.trace.json.gz"), recursive=True))
    assert traces, f"no trace under {logdir}"
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # device lanes: process names containing "TPU" / "/device:"
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()}
    # only the "XLA Ops" lane holds leaf HLOs; module/region lanes
    # ("XLA Modules", "Steps") wrap them and would double-count
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    op_lanes = {k for k, name in tid_names.items()
                if k[0] in dev_pids and "op" in name.lower()}

    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        # strip xla uniquifier suffixes: fusion.123 -> fusion
        base = name.split(".")[0]
        by_op[name] += dur
        by_cat[base] += dur
        total += dur

    n = max(total_dispatches, 1)
    print(f"\ndevice total: {total:.1f} ms over {total_dispatches} steps "
          f"=> {total / n:.2f} ms/step")
    print(f"\nby category ({'ms/step':>9}):")
    for base, ms in by_cat.most_common(25):
        print(f"{ms / n:9.3f}  {100 * ms / total:5.1f}  {base}")
    print(f"\nby op ({'ms/step':>9}):")
    # one representative event's args per op: XPlane carries the HLO
    # long_name / source metadata, which is what attributes a bare
    # `copy.1429` to the producing module/op
    op_args = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "?")
        if name not in op_args and e.get("args"):
            op_args[name] = e["args"]
    for name, ms in by_op.most_common(top):
        print(f"{ms / n:9.3f}  {100 * ms / total:5.1f}  {name[:110]}")
        args = op_args.get(name) or {}
        for key in ("long_name", "source", "tf_op", "hlo_module"):
            if args.get(key):
                print(f"{'':18}{key}: {str(args[key])[:160]}")


def by_source(logdir, total_dispatches, category=None, top=30):
    """Group EVERY leaf op's device time by its source file:line (and for
    copies, by the long_name's layout signature) from an already-captured
    trace — the 'death by a thousand cuts' view the --top listing hides
    when a category's cost is spread over hundreds of small ops."""
    traces = sorted(glob.glob(
        str(Path(logdir) / "**" / "*.trace.json.gz"), recursive=True))
    assert traces, f"no trace under {logdir}"
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    op_lanes = {k for k, name in tid_names.items()
                if k[0] in dev_pids and "op" in name.lower()}

    # one representative args blob per op name (XPlane metadata)
    op_args = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        if e.get("name") not in op_args and e.get("args"):
            op_args[e["name"]] = e["args"]

    by_src = collections.Counter()
    ops_per_src = collections.defaultdict(set)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "?")
        base = name.split(".")[0]
        if base.startswith("while"):
            continue  # wraps its body: would double-count every leaf
        dur = e.get("dur", 0) / 1e3
        total += dur
        if category and category not in base:
            continue
        src = (op_args.get(name) or {}).get("source", "?")
        by_src[(base, src)] += dur
        ops_per_src[(base, src)].add(name)
    n = max(total_dispatches, 1)
    print(f"\nleaf device total (while excluded): {total / n:.1f} ms/step; "
          f"grouped by (category, source){' for ' + category if category else ''}:")
    for (base, src), ms in by_src.most_common(top):
        print(f"{ms / n:9.3f} ms/step  {len(ops_per_src[(base, src)]):4d} ops"
              f"  {base:10s}  {src}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--patch", type=int, nargs=3, default=None,
                        help="volume shape (default: the config's own "
                             "patch_size; 256 256 128 for the flagship)")
    parser.add_argument("--steps", type=int, default=2,
                        help="traced multi-step dispatches")
    parser.add_argument("--scan_steps", type=int, default=4)
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--logdir", default="logs/profile_step")
    parser.add_argument("--config", default=None,
                        help="profile a shipped variant config instead of "
                             "the flagship (bench.py --config)")
    parser.add_argument("--parse_only", action="store_true",
                        help="re-analyze an existing --logdir trace "
                             "without touching the device")
    parser.add_argument("--by_source", default=None, metavar="CATEGORY",
                        help="group leaf device time by (category, source "
                             "line); pass a category substring (e.g. "
                             "'copy') or 'all'")
    args = parser.parse_args()

    if not args.parse_only:
        if args.patch is not None:
            patch = tuple(args.patch)
        elif args.config:
            from transoar_tpu.utils.io import get_config

            patch = tuple(
                get_config(args.config)["augmentation"]["patch_size"])
        else:
            patch = (256, 256, 128)
        capture(args.batch_size, patch, args.steps, args.scan_steps,
                args.logdir, config_name=args.config)
    attribute(args.logdir, args.top, args.steps * args.scan_steps)
    if args.by_source:
        cat = None if args.by_source == "all" else args.by_source
        by_source(args.logdir, args.steps * args.scan_steps, category=cat,
                  top=args.top)


if __name__ == "__main__":
    main()

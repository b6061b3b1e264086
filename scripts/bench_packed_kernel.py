"""Microbench + compiled-correctness check: Pallas packed_conv vs XLA conv
on the stage-0 packed shapes (PERFORMANCE.md §Batch-2 op attribution).

Chained-donated timing per the repo measurement discipline: the loop
carries the activation so no dispatch is memoized; sync via scalar fetch.

Usage: python scripts/bench_packed_kernel.py [--bd 128] [--h 256]
       [--w 128] [--cin 144] [--cout 96] [--steps 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bd", type=int, default=128)
    p.add_argument("--h", type=int, default=256)
    p.add_argument("--w", type=int, default=128)
    p.add_argument("--cin", type=int, default=144)
    p.add_argument("--cout", type=int, default=96)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--fwd_only", action="store_true")
    args = p.parse_args()

    from transoar_tpu.ops.pallas.packed_conv import packed_conv
    from transoar_tpu.utils.cache import enable_compilation_cache

    import os
    if not os.environ.get("TRANSOAR_NO_CACHE"):
        enable_compilation_cache()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.bd, args.h, args.w, args.cin))
                    .astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, args.cin, args.cout))
                    .astype(np.float32) * 0.05).astype(jnp.bfloat16)
    # projection back to Cin so the loop can chain x -> x
    pback = jnp.asarray(rng.normal(size=(args.cout, args.cin))
                        .astype(np.float32) * 0.05).astype(jnp.bfloat16)

    def ref_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)

    # compiled correctness on-device
    y_p = packed_conv(x, w)
    y_r = ref_conv(x, w)
    err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                - y_r.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_r.astype(jnp.float32))))
    print(f"fwd max abs err {err:.4f} (scale {scale:.1f})")

    co = jnp.asarray(rng.normal(size=y_r.shape).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def gcheck(f):
        def loss(x, w):
            return jnp.sum((f(x, w) * co).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))

    if not args.fwd_only:
        gx_p, gw_p = gcheck(packed_conv)(x, w)
        gx_r, gw_r = gcheck(ref_conv)(x, w)
        for name, a, b in (("dx", gx_p, gx_r), ("dw", gw_p, gw_r)):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
            s = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
            print(f"{name} max abs err {d:.4f} (scale {s:.1f})")

    def timed(name, f):
        # everything an explicit argument: a closed-over device array can be
        # inlined as a module constant, and the axon remote-compile service
        # rejects oversized request bodies (HTTP 413)
        def step(x, w, co, pback):
            if args.fwd_only:
                y = f(x, w)
                return jnp.einsum("bhwf,fc->bhwc", y,
                                  pback).astype(jnp.bfloat16)
            _, (dx, dw) = jax.value_and_grad(
                lambda x, w: jnp.sum((f(x, w) * co).astype(jnp.float32)),
                argnums=(0, 1))(x, w)
            return (dx * 0.001 + x).astype(jnp.bfloat16)

        step_d = jax.jit(step, donate_argnums=(0,))
        xx = x + jnp.zeros((), x.dtype)  # private copy; x stays undonated
        xx = step_d(xx, w, co, pback)
        float(xx[0, 0, 0, 0].astype(jnp.float32))  # warm + sync
        t0 = time.perf_counter()
        for _ in range(args.steps):
            xx = step_d(xx, w, co, pback)
        float(xx[0, 0, 0, 0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{name}: {dt:.2f} ms/iter")
        return dt

    timed("pallas", packed_conv)
    timed("xla", ref_conv)

    if os.environ.get("TRANSOAR_PK_TRACE"):
        # trace 3 pallas iterations for op-level attribution
        def step(x, w, co, pback):
            _, (dx, dw) = jax.value_and_grad(
                lambda x, w: jnp.sum((packed_conv(x, w) * co)
                                     .astype(jnp.float32)),
                argnums=(0, 1))(x, w)
            return (dx * 0.001 + x).astype(jnp.bfloat16)

        sd = jax.jit(step, donate_argnums=(0,))
        xx = x + jnp.zeros((), x.dtype)
        xx = sd(xx, w, co, pback)
        float(xx[0, 0, 0, 0].astype(jnp.float32))
        jax.profiler.start_trace("logs/pk_trace")
        for _ in range(3):
            xx = sd(xx, w, co, pback)
        float(xx[0, 0, 0, 0].astype(jnp.float32))
        jax.profiler.stop_trace()


if __name__ == "__main__":
    main()

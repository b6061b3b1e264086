"""Pin scripts/roofline.py's jaxpr FLOP accounting on known-size ops."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from roofline import walk  # noqa: E402


def _count(fn, *args):
    from collections import defaultdict

    jaxpr = jax.make_jaxpr(fn)(*args)
    acc = defaultdict(lambda: [0.0, 0.0])
    walk(jaxpr.jaxpr, 1, acc)
    return acc


def test_dot_flops_exact():
    a = jnp.zeros((64, 256), jnp.bfloat16)
    b = jnp.zeros((256, 512), jnp.bfloat16)
    acc = _count(lambda a, b: a @ b, a, b)
    raw, padded = acc[("dot", "bfloat16")]
    assert raw == 2 * 64 * 512 * 256
    # 512 lanes and 256 contraction already tile-aligned -> padded == raw
    assert padded == raw


def test_dot_lane_padding():
    a = jnp.zeros((64, 20), jnp.bfloat16)
    b = jnp.zeros((20, 24), jnp.bfloat16)
    acc = _count(lambda a, b: a @ b, a, b)
    raw, padded = acc[("dot", "bfloat16")]
    assert raw == 2 * 64 * 24 * 20
    # minor dim 24 -> 128 lanes, contraction 20 -> 24 sublane-padded
    assert padded == 2 * 64 * 128 * 24


def test_conv_flops_exact():
    x = jnp.zeros((2, 16, 16, 8), jnp.bfloat16)  # NHWC
    k = jnp.zeros((3, 3, 8, 128), jnp.bfloat16)  # HWIO

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    acc = _count(f, x, k)
    raw, padded = acc[("conv", "bfloat16")]
    out_elems = 2 * 16 * 16 * 128
    assert raw == 2 * out_elems * 9 * 8
    assert padded == raw  # Cout=128 lane-aligned, Cin=8 sublane-aligned


def test_scan_multiplies_trip_count():
    a = jnp.zeros((32, 32), jnp.float32)

    def f(a):
        def body(c, _):
            return c @ a, ()
        out, _ = jax.lax.scan(body, a, None, length=5)
        return out

    acc = _count(f, a)
    raw, _ = acc[("dot", "float32")]
    assert raw == 5 * 2 * 32 * 32 * 32


def test_grad_graph_counted():
    w = jnp.zeros((128, 128), jnp.float32)
    x = jnp.zeros((8, 128), jnp.float32)

    def loss(w):
        return jnp.sum((x @ w) ** 2)

    acc = _count(jax.grad(loss), w)
    raw, _ = acc[("dot", "float32")]
    # forward x@w + two backward dots (dy@w.T contributes only via grad of
    # w here: x.T@dy) — at least fwd + one bwd matmul must be present
    assert raw >= 2 * (2 * 8 * 128 * 128)

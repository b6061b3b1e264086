"""Pallas packed-conv kernels vs lax.conv_general_dilated (interpret mode
on CPU; the same assertions run compiled on real TPU via
scripts/bench_packed_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from transoar_tpu.ops.pallas.packed_conv import packed_conv


def _ref(xh, wp):
    return jax.lax.conv_general_dilated(
        xh, wp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xh.dtype)


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 8, 16, 6), 6, 8),     # H multiple of TH=8 fallback path
    ((1, 4, 8, 3), 3, 5),      # tiny, TH=4
])
def test_packed_conv_forward_matches_lax(rng, shape, cin, cout):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        ours = packed_conv(x, w)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_ref(x, w)),
                               atol=1e-4, rtol=1e-4)


def test_packed_conv_grads_match_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 8)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(2, 8, 16, 8)).astype(np.float32))

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * co)

    with pltpu.force_tpu_interpret_mode():
        gx, gw = jax.grad(loss(packed_conv), argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss(_ref), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=1e-3, rtol=1e-4)

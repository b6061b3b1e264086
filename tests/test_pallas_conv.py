"""Pallas conv kernel: numerics vs lax (interpret mode on CPU).

Status note: on TPU the kernel is correct but slower than XLA's 2D conv
path for the framework's shapes (9 accumulated small matmuls are MXU-
starved at F=24 output lanes; Mosaic cannot lane-concat an im2col operand).
The production conv path is ``transoar_tpu.ops.conv3d`` (depth-decomposed
XLA conv2d); this kernel is kept as the Pallas reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transoar_tpu.ops.pallas.conv2d import conv2d_3x3_pallas


@pytest.mark.parametrize("shape,F", [
    ((2, 16, 12, 5), 7),
    ((1, 8, 8, 3), 4),
    ((3, 32, 16, 8), 8),
])
def test_pallas_conv_matches_lax(rng, shape, F):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, shape[-1], F)).astype(np.float32))
    ours = conv2d_3x3_pallas(x, w, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)

"""Fast conv3d primitives must match lax.conv_general_dilated exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transoar_tpu.ops.conv3d import (FastConv3D, FastConvTranspose3D, conv3d,
                                     conv3d_split, conv_transpose3d_matmul)


def _ref_conv3d(x, w, strides):
    # torch-style symmetric padding (k - 1) // 2 per side (matches the
    # reference's Conv3d(padding=1); differs from XLA SAME at stride 2)
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, strides, pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("shape,kernel,strides", [
    ((1, 8, 8, 6, 3), (3, 3, 3), (1, 1, 1)),
    ((2, 9, 7, 5, 4), (3, 3, 3), (2, 2, 2)),
    ((1, 8, 8, 8, 2), (3, 3, 3), (1, 2, 1)),
    ((1, 6, 6, 6, 3), (1, 1, 1), (1, 1, 1)),
])
def test_conv3d_matches_lax(rng, shape, kernel, strides):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(
        size=(*kernel, shape[-1], 5)).astype(np.float32))
    ours = conv3d(x, w, strides)
    ref = _ref_conv3d(x, w, strides)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_conv3d_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))

    g_ours = jax.grad(lambda x, w: (conv3d(x, w, (2, 2, 2)) ** 2).sum(),
                      argnums=(0, 1))(x, w)
    g_ref = jax.grad(lambda x, w: (_ref_conv3d(x, w, (2, 2, 2)) ** 2).sum(),
                     argnums=(0, 1))(x, w)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_conv_transpose_matches_definition(rng):
    """torch ConvTranspose3d semantics (kernel == stride): each input voxel
    projects to its own stride^3 output block, out[d*s+kd, ...] += x . w[kd]
    (kernel-flip conventions differ between libraries, but for a learned
    kernel that is a pure reparameterization)."""
    x = np.asarray(rng.normal(size=(2, 4, 5, 3, 6)).astype(np.float32))
    w = np.asarray(rng.normal(size=(2, 2, 2, 6, 4)).astype(np.float32))
    ours = np.asarray(conv_transpose3d_matmul(jnp.asarray(x),
                                              jnp.asarray(w), (2, 2, 2)))
    assert ours.shape == (2, 8, 10, 6, 4)

    ref = np.zeros_like(ours)
    for kd in range(2):
        for kh in range(2):
            for kw in range(2):
                ref[:, kd::2, kh::2, kw::2] = np.einsum(
                    "bdhwc,cf->bdhwf", x, w[kd, kh, kw])
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_fast_modules(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 3)).astype(np.float32))
    conv = FastConv3D(5, (3, 3, 3), (2, 2, 2), dtype=jnp.float32)
    params = conv.init(jax.random.key(0), x)
    out = conv.apply(params, x)
    assert out.shape == (1, 4, 4, 2, 5)

    up = FastConvTranspose3D(3, (2, 2, 2), dtype=jnp.float32)
    params = up.init(jax.random.key(0), out)
    assert up.apply(params, out).shape == (1, 8, 8, 4, 3)


@pytest.mark.parametrize("shape,strides", [
    ((1, 8, 8, 6, 3), (1, 1, 1)),
    ((2, 9, 7, 5, 4), (2, 2, 2)),
    ((1, 8, 8, 8, 2), (1, 2, 1)),
])
def test_conv3d_split_matches_lax(rng, shape, strides):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)).astype(
        np.float32))
    ours = conv3d_split(x, w, strides)
    ref = _ref_conv3d(x, w, strides)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_conv3d_packed_matches_lax(rng):
    from transoar_tpu.ops.conv3d import conv3d_packed

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 5, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))
    ours = conv3d_packed(x, w, pack=4)
    ref = _ref_conv3d(x, w, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)
    # fallback path for non-divisible depth
    x2 = jnp.asarray(rng.normal(size=(1, 6, 6, 5, 3)).astype(np.float32))
    ours2 = conv3d_packed(x2, w, pack=4)
    ref2 = _ref_conv3d(x2, w, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ref2),
                               atol=1e-4)


def test_conv3d_patch_matmul_matches_lax(rng):
    from transoar_tpu.ops.conv3d import conv3d_patch_matmul

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 5)).astype(np.float32))
    ours = conv3d_patch_matmul(x, w, (2, 2, 2))
    ref = _ref_conv3d(x, w, (2, 2, 2))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_fastconv3d_patch_path(rng):
    # kernel == stride routes through the patch matmul
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 3)).astype(np.float32))
    conv = FastConv3D(5, (2, 2, 2), (2, 2, 2), dtype=jnp.float32)
    params = conv.init(jax.random.key(0), x)
    out = conv.apply(params, x)
    kernel = params["params"]["kernel"]
    bias = params["params"]["bias"]
    ref = _ref_conv3d(x, kernel, (2, 2, 2)) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv3d_native_matches_ref(rng):
    from transoar_tpu.ops.conv3d import conv3d_native

    for shape, strides in [((1, 8, 8, 6, 3), (1, 1, 1)),
                           ((2, 9, 7, 5, 4), (2, 2, 2))]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)).astype(
            np.float32))
        np.testing.assert_allclose(
            np.asarray(conv3d_native(x, w, strides)),
            np.asarray(_ref_conv3d(x, w, strides)), atol=1e-4)


def test_fastconv3d_auto_variants_agree(rng):
    # the auto policy (native for strided, stack/split for stride-1) must
    # produce the same numbers as every explicit variant
    import os

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 6, 4)).astype(np.float32))
    outs = {}
    for variant in ("auto", "native", "stack", "split"):
        os.environ["TRANSOAR_CONV3D"] = variant
        try:
            conv = FastConv3D(5, (3, 3, 3), (2, 2, 2), dtype=jnp.float32)
            params = conv.init(jax.random.key(0), x)
            outs[variant] = np.asarray(conv.apply(params, x))
        finally:
            del os.environ["TRANSOAR_CONV3D"]
    for variant, out in outs.items():
        np.testing.assert_allclose(out, outs["auto"], atol=1e-4,
                                   err_msg=variant)


def test_conv3d_parity_matches_ref(rng):
    from transoar_tpu.ops.conv3d import conv3d_parity

    for shape, strides in [((1, 8, 8, 6, 3), (2, 2, 2)),
                           ((2, 10, 7, 5, 4), (2, 2, 2)),
                           ((1, 8, 8, 8, 2), (2, 1, 1))]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], 5)).astype(
            np.float32))
        np.testing.assert_allclose(
            np.asarray(conv3d_parity(x, w, strides)),
            np.asarray(_ref_conv3d(x, w, strides)), atol=1e-4,
            err_msg=f"{shape} {strides}")


def test_conv3d_parity_gradients_match(rng):
    from transoar_tpu.ops.conv3d import conv3d_parity

    x = jnp.asarray(rng.normal(size=(1, 8, 6, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))
    g_ours = jax.grad(lambda x, w: (conv3d_parity(x, w, (2, 2, 2)) ** 2
                                    ).sum(), argnums=(0, 1))(x, w)
    g_ref = jax.grad(lambda x, w: (_ref_conv3d(x, w, (2, 2, 2)) ** 2).sum(),
                     argnums=(0, 1))(x, w)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.parametrize("variant", ["split", "stack"])
def test_conv3d_pair_matches_lax(rng, variant):
    """Paired-depth stride-1 convs (pair in AND out) must equal the plain
    3D conv after unpairing."""
    from transoar_tpu.ops.conv3d import (conv3d_pair_split, conv3d_pair_stack,
                                         pair, unpair)

    fn = conv3d_pair_split if variant == "split" else conv3d_pair_stack
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    xp = pair(x)
    assert np.array_equal(np.asarray(unpair(xp)), np.asarray(x))
    out = unpair(fn(xp, w, (1, 1, 1)))
    ref = _ref_conv3d(x, w, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv3d_parity_pairin_matches_lax(rng):
    """Parity conv on already-paired input must equal the strided 3D conv."""
    from transoar_tpu.ops.conv3d import conv3d_parity_pairin, pair

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    out = conv3d_parity_pairin(pair(x), w, (2, 2, 2))
    ref = _ref_conv3d(x, w, (2, 2, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv3d_pair_gradients_match(rng):
    """Autodiff through the paired path (the production backward)."""
    from transoar_tpu.ops.conv3d import (conv3d_pair_split, pair, unpair)

    x = jnp.asarray(rng.normal(size=(1, 6, 4, 4, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 3)).astype(np.float32))

    def loss_pair(x, w):
        return jnp.sum(jnp.sin(unpair(conv3d_pair_split(pair(x), w))))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_ref_conv3d(x, w, (1, 1, 1))))

    gx, gw = jax.grad(loss_pair, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-4)


def test_conv3d_packed_chain_matches_lax(rng):
    from transoar_tpu.ops.conv3d import (conv3d_packed_chain, pack_depth,
                                         unpack_depth)

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 5, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))
    xp = pack_depth(x, 4)
    np.testing.assert_array_equal(np.asarray(unpack_depth(xp, 4)),
                                  np.asarray(x))
    ours = unpack_depth(conv3d_packed_chain(xp, w, pack=4), 4)
    ref = _ref_conv3d(x, w, (1, 1, 1))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_encoder_block_packed_chain_matches_normal(rng):
    """The depth-packed stage-0 chain (pack -> conv/IN/ReLU x2 -> unpack)
    is numerically the normal EncoderCnnBlock with the same params."""
    import jax

    from transoar_tpu.models.layers import EncoderCnnBlock

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 5, 1)).astype(np.float32))
    norm = EncoderCnnBlock(features=6, strides=(1, 1, 1),
                           dtype=jnp.float32)
    packed = EncoderCnnBlock(features=6, strides=(1, 1, 1),
                             dtype=jnp.float32, packed_chain=4)
    params = norm.init(jax.random.key(0), x)
    ref = norm.apply(params, x)
    ours = packed.apply(params, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_encoder_block_packed_second_matches_normal(rng):
    """A strided stage with its second (stride-1) conv depth-packed equals
    the normal block with the same params."""
    import jax

    from transoar_tpu.models.layers import EncoderCnnBlock

    x = jnp.asarray(rng.normal(size=(2, 8, 6, 6, 3)).astype(np.float32))
    norm = EncoderCnnBlock(features=6, strides=(2, 2, 2), dtype=jnp.float32)
    packed = EncoderCnnBlock(features=6, strides=(2, 2, 2),
                             dtype=jnp.float32, packed_second=2)
    params = norm.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(packed.apply(params, x)),
                               np.asarray(norm.apply(params, x)),
                               atol=2e-5, rtol=2e-5)

"""3D Swin block tests: window partition roundtrip, mask structure, stage
shapes, and the SwinFPN backbone end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from transoar_tpu.models.swin import (EncoderSwinBlock, PatchMerging,
                                      relative_position_index,
                                      shifted_window_mask, window_partition,
                                      window_reverse)
from transoar_tpu.models.transoarnet import build_transoarnet


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 4, 3)).astype(np.float32))
    ws = (2, 3, 2)
    w = window_partition(x, ws)
    assert w.shape == (2 * 2 * 2 * 2, 12, 3)
    back = window_reverse(w, ws, 2, 4, 6, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    ws = (3, 3, 2)
    idx = relative_position_index(ws)
    N = 3 * 3 * 2
    assert idx.shape == (N, N)
    table_size = (2 * 3 - 1) * (2 * 3 - 1) * (2 * 2 - 1)
    assert idx.min() >= 0 and idx.max() < table_size
    # self-relative position identical for all tokens
    assert len(set(np.diag(idx).tolist())) == 1


def test_shifted_window_mask_blocks_cross_region():
    mask = shifted_window_mask((4, 4, 4), (2, 2, 2), (1, 1, 1))
    nW = 8
    assert mask.shape == (nW, 8, 8)
    # interior window (first) has no masking; wrapped ones do
    assert (mask == 0).any() and (mask == -100).any()
    assert np.all(np.diagonal(mask, axis1=1, axis2=2) == 0)


def test_encoder_swin_block_shapes():
    block = EncoderSwinBlock(depth=2, num_heads=2, window_size=(2, 2, 2),
                             dtype=jnp.float32)
    x = jnp.ones((1, 8, 8, 4, 6))
    params = block.init(jax.random.key(0), x)
    out = block.apply(params, x)
    assert out.shape == (1, 4, 4, 2, 12)  # merged: spatial /2, channels x2


def test_patch_merging_odd_sizes():
    pm = PatchMerging(dim=4, dtype=jnp.float32)
    x = jnp.ones((1, 5, 6, 3, 4))
    params = pm.init(jax.random.key(0), x)
    out = pm.apply(params, x)
    assert out.shape == (1, 3, 3, 2, 8)


def test_swin_fpn_backbone_forward():
    cfg = tiny_config(num_organs=2, qpo=1, precision="float32")
    cfg["backbone"]["use_encoder_attn"] = True
    cfg["backbone"]["swin"] = {
        "depths": [1, 1], "num_heads": [2, 2], "window_size": [2, 2, 2],
        "mlp_ratio": 2, "qkv_bias": True, "drop_path_rate": 0.0,
        "conv_merging": False,
    }
    model = build_transoarnet(cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["pred_logits"].shape == (1, 2, 1)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_drop_path_zero_is_identity_nonzero_changes_training(rng):
    """drop_path_rate=0 must not change anything; rate>0 must perturb
    training-mode outputs per sample while leaving eval mode untouched."""
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 4, 6)).astype(np.float32))

    def run(rate, deterministic, seed=0):
        block = EncoderSwinBlock(depth=2, num_heads=2, window_size=(2, 2, 2),
                                 drop_path=(0.0, rate), dtype=jnp.float32)
        params = block.init(jax.random.key(0), x)
        return block.apply(params, x, deterministic=deterministic,
                           rngs={"dropout": jax.random.key(seed)})

    base = run(0.0, True)
    # rate=0: identical in both modes (no dropout rng consumed)
    np.testing.assert_array_equal(np.asarray(run(0.0, False)),
                                  np.asarray(base))
    # rate>0, eval mode: identity
    np.testing.assert_array_equal(np.asarray(run(0.9, True)),
                                  np.asarray(base))
    # rate>0, training: differs, and differently across dropout seeds
    t1, t2 = run(0.9, False, seed=1), run(0.9, False, seed=2)
    assert not np.allclose(np.asarray(t1), np.asarray(base))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_swin_fpn_drop_path_schedule_trains():
    """SwinFPN with drop_path_rate>0 must produce stochastic training
    forwards through the full model (the config key is consumed)."""
    cfg = tiny_config(num_organs=2, qpo=1, precision="float32")
    cfg["backbone"]["use_encoder_attn"] = True
    cfg["backbone"]["swin"] = {
        "depths": [1, 2], "num_heads": [2, 2], "window_size": [2, 2, 2],
        "mlp_ratio": 2, "qkv_bias": True, "drop_path_rate": 0.8,
        "conv_merging": False,
    }
    # anchor_offset_pred zero-inits the heads, making logits input-
    # independent at init — disable it so stochasticity reaches the output
    cfg["neck"]["anchor_offset_pred"] = False
    model = build_transoarnet(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out_eval = model.apply(params, x, deterministic=True)
    o1 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})
    o2 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1["pred_logits"]),
                           np.asarray(o2["pred_logits"]))
    assert np.isfinite(np.asarray(out_eval["pred_logits"])).all()


def test_shifted_block_traces_under_jit():
    """Regression: shifted_window_mask must stay pure numpy. With spatial
    dims larger than the window the shifted branch engages and a jitted
    forward traces it — routing the mask through jnp turned it into a
    tracer (np.asarray raised TracerArrayConversionError; found by
    bench --config swin_fpn_visceral at 64x64x32)."""
    from transoar_tpu.models.swin import SwinBlock

    block = SwinBlock(dim=8, num_heads=2, window_size=(5, 5, 5), shift=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 12, 12, 6, 8)).astype(np.float32))
    params = block.init(jax.random.key(0), x)["params"]
    out = jax.jit(
        lambda p, v: block.apply({"params": p}, v, deterministic=True)
    )(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_fast_layernorm_matches_flax(rng):
    """FastLayerNorm must be a drop-in for nn.LayerNorm: identical params
    (scale/bias) and matching outputs in f32."""
    import flax.linen as nn

    from transoar_tpu.models.layers import FastLayerNorm

    x = jnp.asarray(rng.normal(size=(3, 7, 48)).astype(np.float32) * 3 + 1)
    ref = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    fast = FastLayerNorm(epsilon=1e-5, dtype=jnp.float32)
    p = ref.init(jax.random.key(0), x)
    # non-trivial affine
    p = jax.tree.map(lambda v: v + 0.3, p)
    assert jax.tree_util.tree_structure(p) == \
        jax.tree_util.tree_structure(fast.init(jax.random.key(0), x))
    np.testing.assert_allclose(np.asarray(fast.apply(p, x)),
                               np.asarray(ref.apply(p, x)),
                               rtol=1e-5, atol=1e-5)


def test_blocked_attention_matches_flat():
    """The blocked-layout window attention (default; no window_partition /
    window_reverse materialization) must match the flat-window formulation
    exactly: same params, same contractions — shifted AND unshifted blocks,
    gradients included."""
    from transoar_tpu.models.swin import SwinBlock

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 5, 8)).astype(np.float32))
    for shift in (False, True):
        blk_flat = SwinBlock(dim=8, num_heads=2, window_size=(5, 5, 5),
                             shift=shift, blocked_attn=False,
                             dtype=jnp.float32)
        blk_blocked = SwinBlock(dim=8, num_heads=2, window_size=(5, 5, 5),
                                shift=shift, blocked_attn=True,
                                dtype=jnp.float32)
        params = blk_flat.init(jax.random.key(0), x)
        # identical param tree (same module/param names in both paths)
        chex_tree = jax.tree_util.tree_structure(params)
        assert chex_tree == jax.tree_util.tree_structure(
            blk_blocked.init(jax.random.key(0), x))
        o_flat = blk_flat.apply(params, x)
        o_blk = blk_blocked.apply(params, x)
        np.testing.assert_allclose(np.asarray(o_blk), np.asarray(o_flat),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"shift={shift}")
        g_flat = jax.grad(lambda p: (blk_flat.apply(p, x) ** 2).sum())(
            params)
        g_blk = jax.grad(lambda p: (blk_blocked.apply(p, x) ** 2).sum())(
            params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4), g_flat,
            g_blk)


def test_fused_window_attention_matches_xla():
    """Pallas fused window attention (interpret mode off-TPU) vs the pure
    XLA formulation: forward exact-ish, all four gradients (q, k, v and the
    LEARNED rel-pos bias, which the backward kernel accumulates across the
    window grid) within f32 tolerance."""
    from transoar_tpu.ops.pallas.window_attention import (
        fused_window_attention, reference_window_attention)

    rng = np.random.default_rng(0)
    B, H, N, d, nW = 8, 3, 13, 4, 4
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, d)).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))
    # region labels: the kernel rebuilds the -100 mask in-register
    region = jnp.asarray(
        rng.integers(0, 3, size=(nW, N)).astype(np.float32))

    o_ref = reference_window_attention(q, k, v, bias, region)
    o_fus = fused_window_attention(q, k, v, bias, region)
    np.testing.assert_allclose(np.asarray(o_fus), np.asarray(o_ref),
                               atol=2e-5)

    g_ref = jax.grad(lambda *a: (reference_window_attention(
        *a, region) ** 2).sum(), argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_fus = jax.grad(lambda *a: (fused_window_attention(
        *a, region) ** 2).sum(), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, err_msg=f"d{name}")

    # unshifted path: zero region broadcast over a grouped block
    zreg = jnp.zeros((1, N), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused_window_attention(q, k, v, bias, zreg)),
        np.asarray(reference_window_attention(q, k, v, bias, zreg)),
        atol=2e-5)

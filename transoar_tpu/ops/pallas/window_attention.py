"""Pallas TPU fused window attention for the 3D Swin encoder.

The XLA path materializes the [B*nW, heads, N, N] score tensor in HBM many
times per block (forward: qk, +bias, +mask, softmax chain, cast; backward
again) — at VISCERAL scale the stage-2 blocks hold 6656 windows of N=125
tokens, i.e. ~1.25 GB of f32 scores PER materialization, and the profiled
step spends most of its swin time streaming them
(PERFORMANCE.md §swin profile). A window is tiny (125 x 125 scores,
125 x 16 per-head operands), so the entire attention for a GROUP of
windows fits in VMEM: this kernel fuses qk -> +rel-pos-bias -> +shift-mask
-> softmax -> @v into ONE pass over a group of ``G`` windows per grid step
(G amortizes the Mosaic per-iteration overhead — the one-window variant
measured 41 ms for the stage-2 workload, grid-overhead-bound), with a
custom VJP whose backward recomputes the (cheap, VMEM-resident) scores
instead of saving them.

Layout / numerics:
- q, k, v: [B_, H, N, d] (q pre-scaled by the caller, matching the XLA
  path); computation in f32, output in the input dtype.
- bias: [H, N, N] f32 — the LEARNED relative-position bias; its gradient
  is accumulated across the window grid inside the backward kernel
  (output block indexed by head only; the window axis is the innermost
  sequential grid dimension, so revisiting the block is legal on TPU).
- region: [nW, N] f32 per-token region labels of the cyclic shift
  (models/swin.py shifted_window_regions), constant (no gradient); the
  [N, N] additive -100 mask is computed INSIDE the kernel from them —
  the XLA path materializes the full [nW, N, N] mask in HBM (416 MB at
  VISCERAL stage 2) and saves it for backward; here only the 3 MB label
  array ever exists. Window rows map onto it periodically (b % nW), the
  group size G divides nW. Pass a zero [1, N] region for unshifted
  blocks (all tokens share one region -> no masking).

Mirrors the semantics of models/swin.py::WindowAttention3D (reference
encoder_blocks.py:212-285); equality with the XLA path is test-pinned
(tests/test_swin.py). Runs in interpreter mode off-TPU so the CPU test
suite exercises the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret():
    return jax.default_backend() != "tpu"


def _group(B, nW):
    """Windows per grid step: the largest of (16, 8, 4, 2, 1) dividing B
    and the mask periodicity (a broadcast [1, N, N] mask imposes no
    constraint)."""
    for g in (16, 8, 4, 2, 1):
        if B % g == 0 and (nW == 1 or nW % g == 0):
            return g
    return 1


def _probs(q_ref, k_ref, bias_ref, region_ref):
    """[G, N, N] softmax probabilities for one (head, window-group) block;
    all operands VMEM-resident, f32 accumulation. The shift mask is
    rebuilt in-register from the [*, N] region labels."""
    q = q_ref[:, 0].astype(jnp.float32)          # [G, N, d]
    k = k_ref[:, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [G, N, N]
    r = region_ref[...]                           # [G or 1, N]
    mask = jnp.where(r[:, :, None] != r[:, None, :], -100.0, 0.0)
    s = s + bias_ref[0][None] + mask
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, region_ref, o_ref):
    p = _probs(q_ref, k_ref, bias_ref, region_ref)
    v = v_ref[:, 0].astype(jnp.float32)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, region_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    b = pl.program_id(1)  # grid is (H, nB): window-group axis innermost
    # recompute the (VMEM-resident) probabilities — cheaper than saving
    # the [B_, H, N, N] tensor to HBM
    p = _probs(q_ref, k_ref, bias_ref, region_ref)
    q = q_ref[:, 0].astype(jnp.float32)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0].astype(jnp.float32)
    do = do_ref[:, 0].astype(jnp.float32)

    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [G, N, d]
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [G, N, N]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))       # [G, N, N]
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)

    # learned-bias gradient: accumulate over the window axis into the
    # per-head block (constant index over b -> legal sequential revisits)
    ds_sum = jnp.sum(ds, axis=0)

    @pl.when(b == 0)
    def _init():
        dbias_ref[0] = ds_sum

    @pl.when(b > 0)
    def _acc():
        dbias_ref[0] += ds_sum


def _specs(B, H, N, d, nW, G):
    qkv = pl.BlockSpec((G, 1, N, d), lambda h, b: (b, h, 0, 0))
    bias = pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0))
    if nW == 1:  # unshifted: one zero region broadcast over the group
        region = pl.BlockSpec((1, N), lambda h, b: (0, 0))
    else:
        region = pl.BlockSpec((G, N), lambda h, b: (b % (nW // G), 0))
    return qkv, bias, region


@jax.custom_vjp
def fused_window_attention(q, k, v, bias, region):
    """q, k, v: [B_, H, N, d] (q pre-scaled); bias [H, N, N] f32 (learned);
    region [nW, N] f32 labels with nW dividing B_ (constant).
    -> [B_, H, N, d]."""
    return _forward(q, k, v, bias, region)


def _forward(q, k, v, bias, region):
    B, H, N, d = q.shape
    nW = region.shape[0]
    G = _group(B, nW)
    qkv_spec, bias_spec, region_spec = _specs(B, H, N, d, nW, G)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(H, B // G),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, region_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, d), q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias.astype(jnp.float32), region.astype(jnp.float32))


def _fwd_rule(q, k, v, bias, region):
    return _forward(q, k, v, bias, region), (q, k, v, bias, region)


def _bwd_rule(res, do):
    q, k, v, bias, region = res
    B, H, N, d = q.shape
    nW = region.shape[0]
    G = _group(B, nW)
    qkv_spec, bias_spec, region_spec = _specs(B, H, N, d, nW, G)
    dq, dk, dv, dbias = pl.pallas_call(
        _bwd_kernel,
        grid=(H, B // G),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, region_spec,
                  qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, d), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, d), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, d), v.dtype),
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, bias.astype(jnp.float32), region.astype(jnp.float32), do)
    return dq, dk, dv, dbias.astype(bias.dtype), jnp.zeros_like(region)


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)


def reference_window_attention(q, k, v, bias, region):
    """Pure-XLA twin (the swin.py math) — the correctness oracle."""
    B, H, N, d = q.shape
    nW = region.shape[0]
    mask = jnp.where(region[:, :, None] != region[:, None, :],
                     -100.0, 0.0)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
    s = s + bias[None].astype(jnp.float32)
    s = s.reshape(B // nW, nW, H, N, N) + \
        mask[None, :, None].astype(jnp.float32)
    s = s.reshape(B, H, N, N)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v)

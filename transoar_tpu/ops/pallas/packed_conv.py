"""Pallas TPU kernels for the depth-packed stage-0 convolution.

The depth-packed chain (ops/conv3d.py:pack_depth / conv3d_packed_chain)
turns the reference's C=24 stage-0 convs (encoder_blocks.py:28-45) into
[M, 144] x [144, 96] matmuls — MXU-friendly shapes — but XLA still pays
~12 ms/step of layout flips around the conv ops and runs the dw
correlation through awkward transposes (PERFORMANCE.md §Batch-2 op
attribution). These kernels keep everything in the natural row-major
tiling:

- ``_conv_rows``: fwd/dx workhorse. Grid (B*Dp, H/TH); each program
  convolves a TH-row tile with the 3x3 band kernel: per output row, nine
  [W, Cin] x [Cin, Cout] MXU dots (kh from the row neighborhood, kw via
  sublane shifts of the dot result — shifting the *output* commutes with
  the per-row matmul and avoids any lane-dim concat, which Mosaic cannot
  lower). f32 accumulation, bf16 I/O.
- ``_dw_rows``: weight gradient. Same tiling; accumulates the full
  [3, 3, Cin, Cout] band gradient in a VMEM f32 block revisited by every
  program (TPU Pallas grids execute sequentially on the single
  TensorCore, so output-block accumulation across grid steps is sound).

The H halo comes from three auto-pipelined input refs per program: the
TH-row main block plus two single-row blocks at clamped row offsets
(BlockSpecs with different block shapes index at different granularities)
zeroed at the H boundary in-kernel — no padded HBM copy, no manual DMA.

``packed_conv`` wraps fwd/dx/dw in a ``jax.custom_vjp`` that matches
``jax.lax.conv_general_dilated`` on the same operands (tested in
tests/test_pallas_packed_conv.py; compiled-on-TPU correctness via
scripts/bench_packed_kernel.py).

MEASURED NEGATIVE RESULT (round 3, v5e): kept env-gated OFF
(``TRANSOAR_PALLAS_CONV=1`` selects it inside ``conv3d_packed_chain``).
Microbench fwd+dx+dw at the stage-0 packed shapes: 37.6 ms vs XLA's
17.1; end-to-end batch-2 bench 10.2 vol/s vs 13.2 with XLA convs. XLA's
TPU conv emitter already runs these MXU-shaped convs at ~46% of peak —
within the ~42-50% ceiling set by K=144 (1.125 K-tiles) and N=96 (75%
lanes) — and the kernel's scratch fills, group shift-adds and
custom-call boundary copies cost more than the graph-level layout flips
they were meant to remove. The per-row variant (M=128 dots) was 43 ms —
MXU-latency-bound; the tile-level variant above is the best found.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fill_scratch(scratch, xa_ref, xb_ref, xc_ref, TH):
    """scratch rows j in [0, TH+2) hold global rows h0-1+j: the main tile
    plus clamped single-row halo blocks, zeroed at the H boundary so no
    padded copy of the input is ever materialized in HBM."""
    scratch[1:TH + 1] = xa_ref[0]
    scratch[0] = xb_ref[0, 0]
    scratch[TH + 1] = xc_ref[0, 0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        scratch[0] = jnp.zeros_like(scratch[0])

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        scratch[TH + 1] = jnp.zeros_like(scratch[TH + 1])


def _conv_kernel(xa_ref, xb_ref, xc_ref, w_ref, out_ref, scratch):
    """One (bd, h-tile) program: rows [h0-1, h0+TH] -> out rows [h0, h0+TH).

    scratch rows j in [0, TH+2) hold global rows h0-1+j; output row i
    consumes scratch rows i, i+1, i+2 (kh = 0, 1, 2).
    """
    TH = out_ref.shape[1]
    W = out_ref.shape[2]
    Fp = out_ref.shape[3]
    Cin = scratch.shape[-1]

    _fill_scratch(scratch, xa_ref, xb_ref, xc_ref, TH)

    # nine [TH*W, Cin] x [Cin, Fp] dots — M = TH*W amortizes MXU latency
    # (per-row M=128 dots measured 43 ms/conv, latency-bound). The dots
    # accumulate per kw GROUP with no shift in between (aligned adds fuse
    # into MXU accumulation); the kw shift is applied once per group to
    # the group total (it commutes with the per-row matmuls), never a
    # lane-dim concat.
    groups = []
    for kw in range(3):
        g = None
        for kh in range(3):
            flat = scratch[kh:kh + TH].reshape(TH * W, Cin)
            m = jax.lax.dot_general(
                flat, w_ref[kh, kw],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = m if g is None else g + m
        groups.append(g.reshape(TH, W, Fp))
    # out[w] += x[w + kw - 1] @ w -> shift group output rows by 1 - kw
    acc = (jnp.pad(groups[0][:, :-1], ((0, 0), (1, 0), (0, 0)))
           + groups[1]
           + jnp.pad(groups[2][:, 1:], ((0, 0), (0, 1), (0, 0))))
    out_ref[0] = acc.astype(out_ref.dtype)


def _dw_kernel(xa_ref, xb_ref, xc_ref, dy_ref, dw_ref, scratch):
    """Accumulate dw[kh, kw] += shift_kw(x[h + kh - 1])^T @ dy[h] over the
    whole grid into one revisited f32 VMEM block."""
    TH = dy_ref.shape[1]
    W = dy_ref.shape[2]
    Fp = dy_ref.shape[3]
    Cin = scratch.shape[-1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _fill_scratch(scratch, xa_ref, xb_ref, xc_ref, TH)

    dy_flat = dy_ref[0].reshape(TH * W, Fp)
    for kw in range(3):
        # rs[w] = x[w + kw - 1] (zero past the W edges) — one shifted copy
        # of the whole scratch per kw group, reused by all three kh slices
        full = scratch[0:TH + 2]
        if kw == 0:
            rs = jnp.pad(full[:, :-1], ((0, 0), (1, 0), (0, 0)))
        elif kw == 2:
            rs = jnp.pad(full[:, 1:], ((0, 0), (0, 1), (0, 0)))
        else:
            rs = full
        for kh in range(3):
            dw_ref[kh, kw] += jax.lax.dot_general(
                rs[kh:kh + TH].reshape(TH * W, Cin), dy_flat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _row_specs(TH, H, W, C):
    """Main TH-row block + two single-row halo blocks of the UNPADDED
    [BD, H, W, C] array. Block shapes differ, so the index maps run at
    different granularities: TH-row blocks for the tile, 1-row blocks for
    the halos; the boundary halos are clamped in range and zeroed inside
    the kernel (_fill_scratch), so no padded HBM copy is needed."""
    return [
        pl.BlockSpec((1, TH, W, C), lambda bd, ht: (bd, ht, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C),
                     lambda bd, ht: (bd, jnp.maximum(ht * TH - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C),
                     lambda bd, ht: (bd, jnp.minimum(ht * TH + TH, H - 1),
                                     0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pick_th(H):
    for th in (16, 8, 4, 2):
        if H % th == 0:
            return th
    return 1


def _conv_rows(x, w):
    """x: [BD, H, W, Cin]; w: [3, 3, Cin, Cout]; returns
    [BD, H, W, Cout] (3x3 conv, torch-style symmetric padding)."""
    BD, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TH = _pick_th(H)
    flops = BD * H * W * 9 * Cin * Cout * 2
    return pl.pallas_call(
        _conv_kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(BD, H // TH),
        in_specs=_row_specs(TH, H, W, Cin) + [
            pl.BlockSpec((3, 3, Cin, Cout), lambda bd, ht: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TH, W, Cout),
                               lambda bd, ht: (bd, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BD, H, W, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((TH + 2, W, Cin), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 + BD * H * W * Cout * 2,
            transcendentals=0),
    )(x, x, x, w)


def _dw_rows(x, dy):
    """dw band gradient: x [BD, H, W, Cin], dy [BD, H, W, Cout] ->
    f32 [3, 3, Cin, Cout]."""
    BD, H, W, Cin = x.shape
    Cout = dy.shape[-1]
    TH = _pick_th(H)
    flops = BD * H * W * 9 * Cin * Cout * 2
    return pl.pallas_call(
        _dw_kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(BD, H // TH),
        in_specs=_row_specs(TH, H, W, Cin) + [
            pl.BlockSpec((1, TH, W, Cout), lambda bd, ht: (bd, ht, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, 3, Cin, Cout),
                               lambda bd, ht: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, Cin, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + 2, W, Cin), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 + dy.size * 2,
            transcendentals=0),
    )(x, x, x, dy)


@jax.custom_vjp
def packed_conv(xh, wp):
    """3x3 (H, W) conv with torch-style symmetric padding on flattened
    rows [BD, H, W, Cin] — the packed band conv of conv3d_packed_chain,
    numerically ``lax.conv_general_dilated(xh, wp, (1, 1), ((1,1),(1,1)))``
    in bf16 with f32 accumulation."""
    return _conv_rows(xh, wp)


def _packed_conv_fwd(xh, wp):
    return packed_conv(xh, wp), (xh, wp)


def _packed_conv_bwd(res, dy):
    xh, wp = res
    # dx: correlate dy with the spatially flipped, in/out-transposed band
    wflip = jnp.flip(wp, axis=(0, 1)).swapaxes(2, 3)
    dxh = _conv_rows(dy, wflip)
    dwp = _dw_rows(xh, dy).astype(wp.dtype)
    return dxh, dwp


packed_conv.defvjp(_packed_conv_fwd, _packed_conv_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _reference_conv(xh, wp, interpret=False):  # pragma: no cover - test aid
    return jax.lax.conv_general_dilated(
        xh, wp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xh.dtype)

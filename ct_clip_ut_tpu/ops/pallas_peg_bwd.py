"""Pallas TPU kernel for the PEG depthwise-conv WEIGHT gradient.

Reference semantics: the PEG layer (reference attention.py:55-83) is a
depthwise 3x3x3 Conv3d over the [b, t, h, w, c] token video with causal
frame padding (2, 0) and spatial padding (1, 1), plus bias and residual.

MEASURED NEGATIVE RESULT — opt-in via layers._peg_conv_residual, not the
default: at flagship B=8 this backward is 4.96 ms/layer (bf16, v5e) vs
3.70 ms for XLA autodiff of the same composition. The weight grad is
VPU-COMPUTE-bound (the 27 taps x N x C elementwise multiplies are
intrinsic, ~1.5 G VPU ops at B=8), so the single-HBM-pass argument that
paid off for the attention/FF kernels does not apply here, and XLA's
batch-grouped-conv lowering is already near the VPU floor. Kept (with
parity tests) as the recorded experiment and for the hypothetical chip
where the depthwise backward lowering regresses.

Design (what was tried): all 27 taps reduce to
dw[tap, c] = sum_n x_shifted[n, c] * g[n, c], which this kernel accumulates
VMEM-resident per (batch, frame) grid step:

  * x arrives frame-PADDED (2 leading zero frames causal, else (1, 1)) so
    the 3-frame halo is three stride-1 single-frame BlockSpecs over the
    same array (a block index along a size-1 block dim is an element
    offset — same trick as ops/pallas_peg.py);
  * each of the 27 taps is one elementwise multiply of the spatially
    padded x frame slice against the g frame plus one [1, h*w] @ [h*w, c]
    ones-row MXU contraction (a cross-sublane tree-reduce of [576, 512]
    is VPU-serial; the rank-1 matmul is ~0.6 MFLOP);
  * dw [27, c] and db [1, c] accumulate in fp32 across the whole grid in
    revisited output blocks (initialised at program 0 — the TPU grid is
    sequential).

The input gradient is NOT computed here: the depthwise-conv input-grad is
itself a depthwise conv with flipped taps and flipped padding, which XLA
lowers as well as the forward conv (ops/layers.peg_conv_residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x0_ref, x1_ref, x2_ref, g_ref, dw_ref, db_ref, *, h: int, w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = g_ref.shape[-1]
    f32 = jnp.float32

    gb = g_ref[0, 0].astype(f32)                       # [h, w, c]
    ones = jnp.ones((1, h * w), f32)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    rows = []
    for kd, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        frame = x_ref[0, 0].astype(f32)                # [h, w, c]
        padded = jnp.pad(frame, ((1, 1), (1, 1), (0, 0)))
        for kh in range(3):
            for kw in range(3):
                prod = padded[kh:kh + h, kw:kw + w, :] * gb
                rows.append(jax.lax.dot_general(
                    ones, prod.reshape(h * w, c),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32))       # [1, c]
    # 27 tap rows + 5 zero rows: the output block is (32, c) so the f32
    # (8, 128) sublane tile divides it; the caller slices [:27]
    rows.append(jnp.zeros((5, c), f32))
    dw_ref[:] += jnp.concatenate(rows, axis=0)          # [32, c]
    db_ref[:] += jax.lax.dot_general(ones, gb.reshape(h * w, c),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def peg_weight_grads(x: Array, g: Array, *, causal: bool = True,
                     interpret: bool = False):
    """(dw [3, 3, 3, 1, c] fp32, db [c] fp32) for the depthwise PEG conv.

    Args:
      x: [b, t, h, w, c] conv INPUT video (pre-padding).
      g: [b, t, h, w, c] cotangent of the conv output (+bias) — for the
         peg+residual composition this is exactly the upstream gradient.
    """
    b, t, h, w, c = x.shape
    frame_pad = (2, 0) if causal else (1, 1)
    xp = jnp.pad(x, ((0, 0), frame_pad, (0, 0), (0, 0), (0, 0)))

    frame_spec = lambda k: pl.BlockSpec(
        (1, 1, h, w, c), lambda bi, ti, _k=k: (bi, ti + _k, 0, 0, 0),
        memory_space=pltpu.VMEM)

    dw, db = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(b, t),
        in_specs=[frame_spec(0), frame_spec(1), frame_spec(2),
                  pl.BlockSpec((1, 1, h, w, c),
                               lambda bi, ti: (bi, ti, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((32, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((32, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 28 * b * t * h * w * c,
            bytes_accessed=(x.size * 3 + g.size) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(xp, xp, xp, g)
    return dw[:27].reshape(3, 3, 3, 1, c), db[0]

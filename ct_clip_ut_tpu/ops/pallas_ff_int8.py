"""Fused W8A8 (int8) Pallas TPU kernel for the GEGLU feed-forward block.

Serving-only quantized twin of ops/pallas_ff.geglu_ff_fused (reference
semantics: attention.py:38-51). Motivation: the three FF matmuls are
~47 ms of the ~148 ms flagship zero-shot program at bf16 — already at
~90 % of the v5e bf16 MXU peak — so the MXU's nominal 2x int8 rate
(394 INT8 TOPS vs 197 bf16 TFLOPS on v5e) was the remaining rate lever.

MEASURED (2026-08-19, v5e via relay, tools/bench_int8_ff.py, corrected
tiny-fetch chained harness): compiled-kernel parity vs the XLA int8 twin
0.64 % max rel (green). At flagship token count (N=221184) the int8
kernel times 7.40 ms vs the bf16 kernel's 7.94 ms — a ~7 % isolated win,
NOT the nominal 2x: Mosaic's int8 dot does not reach the double-rate MXU
path here and the per-tile dynamic-quant VPU work (row absmax/round over
[tile, inner] fp32) rides on top. The XLA-lowered int8 reference is
slower than both (11.3 ms — XLA doesn't fuse the dynamic quant). FF is
~47 ms of the ~148 ms zero-shot program, so ~7 % of it is ~2 % whole-
program — within noise, per the repo's whole-program A/B rule. Net: this
path is a WEIGHT-MEMORY lever (4x vs fp32, 2x vs bf16 FF weights) with a
marginal rate win; re-A/B on each toolchain bump.

Scheme (standard dynamic W8A8, no calibration data needed):
  * weights: symmetric per-OUTPUT-column int8, fp32 scale per column
    (`quantize_weight_int8`), quantized once at model load;
  * activations: symmetric per-ROW (per-token) int8, scale computed
    in-kernel from the tile's row absmax — both the LN'd input `xn` and
    the GEGLU product `h` are re-quantized dynamically;
  * matmuls run int8 x int8 -> int32 on the MXU
    (`preferred_element_type=jnp.int32`), dequantized as
    row_scale x int32 x col_scale in fp32;
  * LN, gelu, gating and the residual add stay fp32 — only the MXU
    contractions are quantized.

This is NOT a parity path: per-token dequant error is ~0.3-1 % on the
block output. It is gated behind an explicitly quantized param tree
(ops/quant.py) and never reachable from the default bf16 configs; the
attribution suite and trainer always run the bf16 kernels. Forward-only:
`jnp.round` has a zero cotangent, so differentiating through it would
silently produce garbage — `geglu_ff_int8` raises under AD via a
custom_vjp whose backward errors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ff import _gelu_exact

Array = jax.Array

_EPS = 1e-8


def quantize_weight_int8(w: Array):
    """[in, out] fp weight -> (int8 weight, fp32 per-output-column scale)."""
    w32 = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0) / 127.0, _EPS)
    wq = jnp.round(w32 / s).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


def _row_quant(x32):
    """fp32 [n, d] -> (int8 [n, d], fp32 [n, 1] per-row scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0,
                    _EPS)
    return jnp.round(x32 / s).astype(jnp.int8), s


def _int8_dot(xi, wq):
    return jax.lax.dot_general(xi, wq, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _kernel(x_ref, gamma_ref, beta_ref, wvq_ref, wgq_ref, w2q_ref,
            sv_ref, sg_ref, s2_ref, o_ref, *, residual: bool):
    x = x_ref[:].astype(jnp.float32)                 # [TN, dim]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    xn = (x - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xn = xn * gamma_ref[0] + beta_ref[0]

    xi, rx = _row_quant(xn)
    value = _int8_dot(xi, wvq_ref[:]).astype(jnp.float32) * rx * sv_ref[0]
    gate = _int8_dot(xi, wgq_ref[:]).astype(jnp.float32) * rx * sg_ref[0]
    h = _gelu_exact(gate) * value                    # fp32 [TN, inner]

    hi, rh = _row_quant(h)
    out = _int8_dot(hi, w2q_ref[:]).astype(jnp.float32) * rh * s2_ref[0]
    if residual:
        out = out + x
    o_ref[:] = out.astype(o_ref.dtype)


def xla_int8_reference(x, gamma, beta, wvq, wgq, w2q, sv, sg, s2,
                       residual: bool = False):
    """Same math as the kernel, lowered by XLA — the CPU/odd-shape fallback
    and the parity oracle for the Pallas kernel."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    xn = (x32 - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xn = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)

    xi, rx = _row_quant(xn)
    value = _int8_dot(xi, wvq).astype(jnp.float32) * rx * sv
    gate = _int8_dot(xi, wgq).astype(jnp.float32) * rx * sg
    h = _gelu_exact(gate) * value

    hi, rh = _row_quant(h)
    out = _int8_dot(hi, w2q).astype(jnp.float32) * rh * s2
    if residual:
        out = out + x32
    return out.astype(x.dtype)


def _bwd_raises(interpret, residual, res, g):
    raise NotImplementedError(
        "geglu_ff_int8 is a serving-only quantized kernel: jnp.round has a "
        "zero cotangent, so its gradient would be silently wrong. "
        "Differentiate the bf16 model (the default param tree) instead.")


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def geglu_ff_int8(x: Array, gamma: Array, beta: Array,
                  wvq: Array, wgq: Array, w2q: Array,
                  sv: Array, sg: Array, s2: Array,
                  interpret: bool = False, residual: bool = False) -> Array:
    """x: [N, dim]; wvq/wgq: int8 [dim, inner]; w2q: int8 [inner, dim];
    sv/sg: fp32 [inner]; s2: fp32 [dim]. Forward-only (see module doc)."""
    return _forward_impl(x, gamma, beta, wvq, wgq, w2q, sv, sg, s2,
                         interpret=interpret, residual=residual)


def _fwd(x, gamma, beta, wvq, wgq, w2q, sv, sg, s2, interpret, residual):
    return (_forward_impl(x, gamma, beta, wvq, wgq, w2q, sv, sg, s2,
                          interpret=interpret, residual=residual), None)


geglu_ff_int8.defvjp(_fwd, _bwd_raises)


@functools.partial(jax.jit, static_argnames=("interpret", "residual"))
def _forward_impl(x, gamma, beta, wvq, wgq, w2q, sv, sg, s2, *,
                  interpret=False, residual=False):
    n, dim = x.shape
    inner = wvq.shape[1]

    tn = 384  # same tiling as the bf16 kernel (ops/pallas_ff.py)
    pad = (-n) % tn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    np_ = n + pad

    row = lambda v, d: v.astype(jnp.float32).reshape(1, d)
    const = lambda d0, d1: pl.BlockSpec((d0, d1), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, residual=residual),
        grid=(np_ // tn,),
        in_specs=[
            pl.BlockSpec((tn, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const(1, dim), const(1, dim),
            const(dim, inner), const(dim, inner), const(inner, dim),
            const(1, inner), const(1, inner), const(1, dim),
        ],
        out_specs=pl.BlockSpec((tn, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * dim * inner * 3,
            bytes_accessed=xp.size * 2 * x.dtype.itemsize
            + (2 * dim * inner + inner * dim),
            transcendentals=np_ * inner),
        interpret=interpret,
    )(xp, row(gamma, dim), row(beta, dim), wvq, wgq, w2q,
      row(sv, inner), row(sg, inner), row(s2, dim))
    return out[:n] if pad else out

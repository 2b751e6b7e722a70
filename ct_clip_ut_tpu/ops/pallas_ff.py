"""Fused Pallas TPU kernel for the GEGLU feed-forward block.

LN -> Linear(dim, 2*inner) -> gelu(gate) * value -> Linear(inner, dim)
(reference attention.py:38-51) in one VMEM-resident pass per token tile:
the [N, 2*inner] projection never round-trips to HBM (~150 MB per layer per
volume at flagship shapes). Weights stay resident across grid steps.

The doubled projection is passed as separate value/gate halves so in-kernel
slicing stays lane-aligned (inner = 1365 is not a multiple of 128).
Backward = XLA recompute via custom VJP, like the attention kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic has
    no erf/erfc lowering; this keeps the exact-gelu (erf) semantics well
    inside the bf16 noise floor."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_ref, gamma_ref, beta_ref, wv_ref, wg_ref, w2_ref, o_ref, *,
            residual: bool = False):
    x = x_ref[:].astype(jnp.float32)                 # [TN, dim]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    xn = (x - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xn = xn * gamma_ref[0] + beta_ref[0]
    xn = xn.astype(o_ref.dtype)

    value = jax.lax.dot_general(xn, wv_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    gate = jax.lax.dot_general(xn, wg_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    h = (_gelu_exact(gate) * value).astype(o_ref.dtype)
    out = jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if residual:                                     # x already resident
        out = out + x
    o_ref[:] = out.astype(o_ref.dtype)


def _xla_reference(x, gamma, beta, wv, wg, w2, residual: bool = False):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(x.dtype)
    value = (xn @ wv).astype(jnp.float32)
    gate = (xn @ wg).astype(jnp.float32)
    h = (jax.nn.gelu(gate, approximate=False) * value).astype(x.dtype)
    out = h @ w2
    return out + x if residual else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def geglu_ff_fused(x: Array, gamma: Array, beta: Array,
                   wv: Array, wg: Array, w2: Array,
                   interpret: bool = False, residual: bool = False) -> Array:
    """x: [N, dim]; gamma/beta: [dim]; wv/wg: [dim, inner]; w2: [inner, dim].
    residual=True folds the +x into the kernel's output write."""
    return _forward_impl(x, gamma, beta, wv, wg, w2, interpret=interpret,
                         residual=residual)


def _ff_fwd(x, gamma, beta, wv, wg, w2, interpret, residual):
    return (_forward_impl(x, gamma, beta, wv, wg, w2, interpret=interpret,
                          residual=residual),
            (x, gamma, beta, wv, wg, w2))


def _ff_bwd(interpret, residual, res, g):
    _, vjp = jax.vjp(lambda *a: _xla_reference(*a, residual), *res)
    return vjp(g)


geglu_ff_fused.defvjp(_ff_fwd, _ff_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "residual"))
def _forward_impl(x, gamma, beta, wv, wg, w2, *, interpret=False,
                  residual=False):
    n, dim = x.shape
    inner = wv.shape[1]

    tn = 384  # best of {256, 384, 512, 768} measured at flagship shapes
    pad = (-n) % tn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    np_ = n + pad

    gamma2 = gamma.astype(jnp.float32).reshape(1, dim)
    beta2 = beta.astype(jnp.float32).reshape(1, dim)

    out = pl.pallas_call(
        functools.partial(_kernel, residual=residual),
        grid=(np_ // tn,),
        in_specs=[
            pl.BlockSpec((tn, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * dim * inner * 3,
            bytes_accessed=(xp.size * 2 + wv.size * 2 + w2.size)
            * x.dtype.itemsize,
            transcendentals=np_ * inner),
        interpret=interpret,
    )(xp, gamma2, beta2, wv, wg, w2)
    return out[:n] if pad else out

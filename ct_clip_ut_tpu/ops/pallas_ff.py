"""Fused Pallas TPU kernel for the GEGLU feed-forward block.

LN -> Linear(dim, 2*inner) -> gelu(gate) * value -> Linear(inner, dim)
(reference attention.py:38-51) in one VMEM-resident pass per token tile:
the [N, 2*inner] projection never round-trips to HBM (~150 MB per layer per
volume at flagship shapes). Weights stay resident across grid steps.

The doubled projection is passed as separate value/gate halves so in-kernel
slicing stays lane-aligned (inner = 1365 is not a multiple of 128).

Backward is ALSO a fused kernel (`_bwd_kernel`): the XLA-recompute twin
materializes xn/value/gate/h — four [221184, inner] HBM tensors per layer —
while the kernel recomputes them per tile in VMEM and accumulates the
weight gradients in resident output blocks across grid steps (constant
out-block index => Pallas keeps the block in VMEM; step 0 zero-initializes
under @pl.when). Off-TPU the XLA twin remains the backward.
"""

from __future__ import annotations

import functools

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


def _gelu_grad(x):
    """d gelu(x)/dx = Phi(x) + x * phi(x) (exact-erf gelu)."""
    phi = 0.3989422804014327 * jnp.exp(-0.5 * x * x)
    cdf = 0.5 * (1.0 + _erf(x * 0.7071067811865476))
    return cdf + x * phi


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
    x, gamma, beta, wv, wg, w2 = res
    if jax.default_backend() == "tpu" or interpret:
        dx, dgamma, dbeta, dwv, dwg, dw2 = _backward_impl(
            x, gamma, beta, wv, wg, w2, g, interpret=interpret,
            residual=residual)
        return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
                dwv.astype(wv.dtype), dwg.astype(wg.dtype),
                dw2.astype(w2.dtype))
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


# ---------------------------------------------------------------------------
# fused backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, gamma_ref, beta_ref, wv_ref, wg_ref, w2_ref,
                dx_ref, dgamma_ref, dbeta_ref, dwv_ref, dwg_ref, dw2_ref, *,
                residual: bool):
    """One token tile: recompute the forward in VMEM, then all six grads.
    Weight/norm grads accumulate into constant-index output blocks."""
    f32 = jnp.float32
    i = pl.program_id(0)
    dt = x_ref.dtype

    # ---- recompute forward (same dtype flow as _xla_reference) ----------
    x = x_ref[:].astype(f32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xhat = (x - mean) * rstd
    xn = (xhat * gamma_ref[0] + beta_ref[0]).astype(dt)

    value = jax.lax.dot_general(xn, wv_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
    gate = jax.lax.dot_general(xn, wg_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
    h = (_gelu_exact(gate) * value).astype(dt)

    # ---- backward chain --------------------------------------------------
    g = g_ref[:].astype(dt)
    # dW2 += h^T g   ([inner, D], contraction over rows)
    dw2_p = jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
    # dh = g W2^T    (contract the D axis of both)
    dh = jax.lax.dot_general(g, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dvalue = (dh * _gelu_exact(gate)).astype(dt)
    dgate = (dh * value * _gelu_grad(gate)).astype(dt)

    # dWv += xn^T dvalue ; dWg += xn^T dgate
    dwv_p = jax.lax.dot_general(xn, dvalue, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
    dwg_p = jax.lax.dot_general(xn, dgate, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
    # dxn = dvalue Wv^T + dgate Wg^T
    dxn = (jax.lax.dot_general(dvalue, wv_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dgate, wg_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))

    dgamma_p = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbeta_p = jnp.sum(dxn, axis=0, keepdims=True)

    # LayerNorm backward
    dxhat = dxn * gamma_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd
    if residual:
        dx = dx + g_ref[:].astype(f32)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    dgamma_ref[:] += dgamma_p
    dbeta_ref[:] += dbeta_p
    dwv_ref[:] += dwv_p
    dwg_ref[:] += dwg_p
    dw2_ref[:] += dw2_p


@functools.partial(jax.jit, static_argnames=("interpret", "residual"))
def _backward_impl(x, gamma, beta, wv, wg, w2, g, *, interpret, residual):
    n, dim = x.shape
    inner = wv.shape[1]
    tn = 384
    pad = (-n) % tn
    if pad:
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))   # zero cotangents: no effect
    else:
        xp, gp = x, g
    np_ = n + pad

    gamma2 = gamma.astype(jnp.float32).reshape(1, dim)
    beta2 = beta.astype(jnp.float32).reshape(1, dim)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, residual=residual),
        grid=(np_ // tn,),
        in_specs=[
            pl.BlockSpec((tn, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, dim), x.dtype),
            jax.ShapeDtypeStruct((1, dim), jnp.float32),
            jax.ShapeDtypeStruct((1, dim), jnp.float32),
            jax.ShapeDtypeStruct((dim, inner), jnp.float32),
            jax.ShapeDtypeStruct((dim, inner), jnp.float32),
            jax.ShapeDtypeStruct((inner, dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * dim * inner * 9,
            bytes_accessed=(xp.size * 3 + 3 * wv.size) * x.dtype.itemsize,
            transcendentals=2 * np_ * inner),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xp, gp, gamma2, beta2, wv, wg, w2)

    dx, dgamma, dbeta, dwv, dwg, dw2 = outs
    return (dx[:n], dgamma.reshape(dim), dbeta.reshape(dim), dwv, dwg, dw2)

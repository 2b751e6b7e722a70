"""Fully-fused Pallas kernel for the cosine-attention BLOCK.

One kernel covers everything between the residual taps of a self-attention
layer (reference attention.py:126-182): pre-norm LayerNorm, the q/k/v
projections (k/v from the PRE-norm input, attention.py:138-140), per-head
l2-normalization + learned scales + fixed scale, position bias, fp32
softmax, PV, and the output projection — with all weights VMEM-resident and
no intermediate ever written to HBM.

Grid = (rows, heads): the per-row LayerNorm result and the output
accumulator live in scratch across the head steps (TPU grids iterate the
last dimension fastest). Per-head weight slices avoid non-128-aligned lane
slicing in VMEM.

Backward = XLA recompute via custom VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, gamma_ref, wq_ref, wk_ref, wv_ref, wo_ref,
            qs_ref, ks_ref, bias_ref, o_ref, xn_scr, acc_scr, *,
            scale: float, has_bias: bool, heads: int):
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _():
        x = x_ref[0].astype(jnp.float32)             # [N, D]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        xn = (x - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
        xn_scr[:] = (xn * gamma_ref[0]).astype(xn_scr.dtype)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    xn = xn_scr[:]                                    # [N, D] (normed)
    x_raw = x_ref[0]                                  # [N, D] (pre-norm: k/v)

    q = jax.lax.dot_general(xn, wq_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [N, dh]
    k = jax.lax.dot_general(x_raw, wk_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    v = jax.lax.dot_general(x_raw, wv_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    kn = jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True))
    q = q / jnp.maximum(qn, 1e-12) * (qs_ref[0].astype(jnp.float32) * scale)
    k = k / jnp.maximum(kn, 1e-12) * ks_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [N, N]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o = jax.lax.dot_general(p.astype(v.dtype), v.astype(x_raw.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [N, dh]
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        o.astype(x_raw.dtype), wo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(h == heads - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def _xla_reference_block(x, gamma, wq, wk, wv, wo, qs, ks, bias, scale):
    """Pure-XLA twin (backward + tests). Weight layouts: wq/wk/wv [H, D, dh],
    wo [H, dh, D]."""
    heads = wq.shape[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma).astype(x.dtype)

    q = jnp.einsum("rnd,hde->rhne", xn, wq.astype(x.dtype))
    k = jnp.einsum("rnd,hde->rhne", x, wk.astype(x.dtype))
    v = jnp.einsum("rnd,hde->rhne", x, wv.astype(x.dtype))
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qf = qf * (qs.astype(jnp.float32) * scale)
    kf = kf * ks.astype(jnp.float32)
    s = jnp.einsum("rhne,rhme->rhnm", qf, kf, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("rhnm,rhme->rhne", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("rhne,hed->rnd", o, wo.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def attention_block_fused(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                          scale: float = 8.0, interpret: bool = False):
    """x: [R, N, D]; gamma: [D]; wq/wk/wv: [H, D, dh]; wo: [H, dh, D];
    qs/ks: [dh]; bias: optional [H, N, N]. Returns [R, N, D] pre-residual."""
    return _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                         scale=scale, interpret=interpret)


def _blk_fwd(x, gamma, wq, wk, wv, wo, qs, ks, bias, scale, interpret):
    out = _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks, bias,
                        scale=scale, interpret=interpret)
    return out, (x, gamma, wq, wk, wv, wo, qs, ks, bias)


def _blk_bwd(scale, interpret, res, g):
    x, gamma, wq, wk, wv, wo, qs, ks, bias = res
    diff = (x, gamma, wq, wk, wv, wo, qs, ks) + ((bias,) if bias is not None else ())

    def f(*args):
        if bias is not None:
            *xs, b = args
            return _xla_reference_block(*xs, b, scale)
        return _xla_reference_block(*args, None, scale)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(g)
    if bias is None:
        grads = grads + (None,)
    return grads


attention_block_fused.defvjp(_blk_fwd, _blk_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _forward_impl(x, gamma, wq, wk, wv, wo, qs, ks,
                  bias: Optional[Array] = None, *,
                  scale: float = 8.0, interpret: bool = False):
    r, n, d = x.shape
    heads, _, dh = wq.shape
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, 1, 1), jnp.float32)
    bias_block = (1, n, n) if has_bias else (1, 1, 1)
    bias_index = ((lambda i, h: (h, 0, 0)) if has_bias
                  else (lambda i, h: (0, 0, 0)))

    gamma2 = gamma.astype(jnp.float32).reshape(1, d)
    qs2 = qs.astype(jnp.float32).reshape(1, dh)
    ks2 = ks.astype(jnp.float32).reshape(1, dh)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, has_bias=has_bias,
                          heads=heads),
        grid=(r, heads),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, dh), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, dh), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, dh), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, d), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_block, bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i, h: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, d), x.dtype),        # normed x
            pltpu.VMEM((n, d), jnp.float32),    # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * heads * (3 * n * d * dh + 2 * n * n * dh
                                   + n * dh * d),
            bytes_accessed=x.size * 2 * x.dtype.itemsize,
            transcendentals=r * heads * n * n),
        interpret=interpret,
    )(x, gamma2, wq, wk, wv, wo, qs2, ks2, bias)

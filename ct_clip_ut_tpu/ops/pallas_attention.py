"""Fused Pallas TPU kernel for QK-normalized (cosine-sim) attention.

The inference hot path (reference attention.py:151-178 semantics): per
(batch, head) program, everything stays VMEM-resident —
l2-normalization of q/k, learned per-dim scales, the fixed scalar scale,
additive position bias, fp32 softmax, and the PV matmul — so the [N, N]
attention matrix never round-trips to HBM. For the CT-ViT encoder
(4 spatial layers of [b*24, 8, 576, 576] plus temporal) that removes
~3 GB of HBM traffic per volume forward.

Used automatically by ops/attention.py when no weights/mask/causality are
requested; the XLA path remains the reference semantics (and the
weight-emitting attribution substrate).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, bias_ref, o_ref, *,
            scale: float, has_bias: bool):
    q = q_ref[0].astype(jnp.float32)                     # [N, D]
    k = k_ref[0].astype(jnp.float32)                     # [M, D]
    v = v_ref[0]                                         # [M, D]

    # l2norm rows (torch F.normalize: x / max(||x||, 1e-12))
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    kn = jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True))
    q = q / jnp.maximum(qn, 1e-12)
    k = k / jnp.maximum(kn, 1e-12)

    q = q * (qs_ref[0].astype(jnp.float32) * scale)      # fold fixed scale
    k = k * ks_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [N, M]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret"))
def cosine_attention_fused(q: Array, k: Array, v: Array,
                           q_scale: Array, k_scale: Array,
                           bias: Optional[Array] = None, *,
                           heads: int, scale: float = 8.0,
                           interpret: bool = False) -> Array:
    """Fused cosine attention.

    Args:
      q: [BH, N, D] (batch*heads flattened, head-major within batch).
      k, v: [BH, M, D].
      q_scale, k_scale: [D] learned per-dim scales.
      bias: optional [heads, N, M] additive bias (shared across batch).
    Returns [BH, N, D] in q.dtype.
    """
    bh, n, d = q.shape
    m = k.shape[1]
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, 1, 1), jnp.float32)

    qs = jnp.broadcast_to(q_scale.astype(jnp.float32), (1, d))
    ks = jnp.broadcast_to(k_scale.astype(jnp.float32), (1, d))

    grid = (bh,)
    bias_block = (1, n, m) if has_bias else (1, 1, 1)
    bias_index = ((lambda i: (i % heads, 0, 0)) if has_bias
                  else (lambda i: (0, 0, 0)))

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_block, bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n * m * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * m),
        interpret=interpret,
    )(q, k, v, qs, ks, bias)

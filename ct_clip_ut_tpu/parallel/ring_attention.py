"""Ring attention: sequence-parallel cosine attention over a mesh axis.

The reference has NO sequence parallelism — its long-context strategy is
purely architectural (factorized 576-token spatial x 24-token temporal
attention, ctvit.py:93-101; SURVEY.md section 5 marks distribution over the
token axis as an optional extension). This module adds it the TPU way: the
spatial token axis shards over a mesh axis, each device holds its query
block permanently, and key/value blocks ROTATE around the ring with
`jax.lax.ppermute` (one ICI hop per step) while a numerically-stable online
softmax accumulates the output — Liu et al.'s ring attention specialized to
this codebase's QK-normalized attention (reference semantics
src/utils/attention.py:121-178: pre-norm x, k/v from the PRE-norm input,
l2norm(q)/l2norm(k) with learned per-dim scales, fixed scale 8, additive
[heads, i, j] bias).

Scope: the CT-ViT spatial encoder path — self-attention, non-causal, no
key-padding mask, no null KV, inference or training (differentiable through
ppermute). At the flagship 576-token spatial width a single chip holds the
whole sequence and this is pure overhead; the op exists for longer-than-
flagship volumes (e.g. image_size 960 -> 2304 spatial tokens, where the
[n, n] score matrix and CPB bias table outgrow single-core VMEM/HBM
budgets) and is validated for bit-level agreement with the dense op on the
virtual CPU mesh (tests/test_ring_attention.py).

Layout notes:
  * every device computes its [n_loc, n_loc] score block per step — K steps
    cover the full [n_loc, n] row stripe; peak memory per device is
    O(n_loc * n_loc), not O(n * n);
  * the additive bias stays fully sharded: the caller passes the local
    [heads, n_loc, n] ROW stripe (queries' rows), and each ring step slices
    the [heads, n_loc, n_loc] column block of the kv block currently held —
    a static-size jax.lax.dynamic_slice;
  * the online-softmax state (running max m, denominator l, accumulator o)
    is fp32, like the dense op's fp32 softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import AttentionConfig
from ..ops.layers import l2norm, layernorm, linear

Array = jax.Array


def ring_cosine_attention(params, cfg: AttentionConfig, x: Array,
                          axis_name: str, *,
                          attn_bias: Optional[Array] = None,
                          residual: bool = False) -> Array:
    """Sequence-parallel self-attention block (call INSIDE shard_map).

    Args:
      params: the ops/attention.py parameter dict (norm/to_q/to_kv/to_out/
        q_scale/k_scale).
      x: [b, n_loc, dim] — this device's token block (tokens sharded over
        `axis_name`).
      axis_name: mesh axis the token axis is sharded over.
      attn_bias: optional [heads, n_loc, n_global] local row stripe of the
        additive bias (queries' rows, all key columns).
      residual: return block(x) + x like the dense op's fused paths.

    Returns [b, n_loc, dim] — the same values the dense op produces for
    these rows (up to fp32 summation order).
    """
    assert not cfg.causal and cfg.num_null_kv == 0, \
        "ring path covers the CT-ViT spatial encoder (non-causal, no null kv)"
    assert cfg.dropout == 0.0, \
        "ring path is deterministic: attention dropout is not implemented " \
        "(the dense op would apply cfg.dropout; refusing to drop it silently)"
    b, n_loc, _ = x.shape
    h, dh = cfg.heads, cfg.dim_head
    f32 = jnp.float32

    axis_size = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    # k/v from the PRE-norm x (reference attention.py:138-140)
    xn = layernorm(params["norm"], x)
    q = linear(params["to_q"], xn)
    kv = linear(params["to_kv"], x)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(t):
        return t.reshape(b, n_loc, h, dh).transpose(0, 2, 1, 3)

    q = l2norm(split_heads(q)) * params["q_scale"].astype(x.dtype)
    k = l2norm(split_heads(k)) * params["k_scale"].astype(x.dtype)
    v = split_heads(v)                                   # [b, h, n_loc, dh]

    # right-rotation: after s steps this device holds the kv block that
    # originated on device (my_idx + s) mod K
    perm = [(j, (j - 1) % axis_size) for j in range(axis_size)]

    def step(s, carry):
        k_blk, v_blk, m, l, o = carry
        src = jax.lax.rem(my_idx + s, axis_size)

        scores = jnp.einsum("bhid,bhjd->bhij", q, k_blk,
                            preferred_element_type=f32) * cfg.scale
        if attn_bias is not None:
            blk = jax.lax.dynamic_slice(
                attn_bias, (0, 0, src * n_loc), (h, n_loc, n_loc))
            scores = scores + blk.astype(f32)[None]

        m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        o_new = o * alpha + jnp.einsum(
            "bhij,bhjd->bhid", p, v_blk.astype(f32),
            preferred_element_type=f32)

        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        return k_nxt, v_nxt, m_new, l_new, o_new

    m0 = jnp.full((b, h, n_loc, 1), -jnp.inf, f32)
    l0 = jnp.zeros((b, h, n_loc, 1), f32)
    o0 = jnp.zeros((b, h, n_loc, dh), f32)
    _, _, _, l, o = jax.lax.fori_loop(
        0, axis_size, step, (k, v, m0, l0, o0))

    out = (o / l).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n_loc, cfg.inner_dim)
    out = linear(params["to_out"], out)
    return out + x if residual else out

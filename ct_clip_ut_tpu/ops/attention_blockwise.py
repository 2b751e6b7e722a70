"""Blockwise (online-softmax) cosine attention for long sequences.

Single-chip companion to the mesh-level ring attention
(parallel/ring_attention.py): the same QK-normalized attention semantics
(reference src/utils/attention.py:121-178 — pre-norm x, k/v from the
PRE-norm input, l2norm(q)/l2norm(k) with learned per-dim scales, fixed
scale 8, additive [heads, i, j] bias) computed with a `lax.scan` over key
blocks and a numerically-stable running (max, denominator, accumulator) —
so no [n, n] score matrix or bias slab is ever materialized. Peak score
memory is O(n * block) instead of O(n^2): at image_size 960 the spatial
grid is 2304 tokens, where dense fp32 scores are 21 MB per (volume-frame,
head) and the CPB table alone is 170 MB — past both the fused kernel's
VMEM ceiling (ops/attention.py routes to XLA dense above 4 MB of scores)
and any reasonable HBM budget at batch.

The flagship 576-token grid stays on the fused Pallas block kernel; this
path is for beyond-flagship volumes on one chip, and is exact vs the dense
op (tests/test_blockwise_attention.py, forward + gradients).

Scope: self-attention, non-causal, no key-padding mask, no null KV, no
dropout (asserted — never silently dropped). Attention weights are not
available blockwise; attribution uses the dense path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import AttentionConfig
from .layers import l2norm, layernorm, linear

Array = jax.Array


def blockwise_cosine_attention(params, cfg: AttentionConfig, x: Array, *,
                               block: Optional[int] = None,
                               attn_bias: Optional[Array] = None,
                               bias_fn: Optional[Callable[[Array], Array]]
                               = None,
                               deterministic: bool = True,
                               residual: bool = False) -> Array:
    """Self-attention block with O(n * block) score memory.

    Args:
      x: [b, n, dim]; n must be divisible by `block` (pad upstream).
      attn_bias: optional [heads, n, n] additive bias — accepted for
        API parity but sliced per block; at the sequence lengths this path
        exists for, prefer `bias_fn`.
      bias_fn: optional callback mapping a block-start index (int32 scalar)
        to the [heads, n, block] bias COLUMN stripe for that key block —
        lets the caller build CPB stripes on the fly
        (ops/posbias.continuous_pos_bias_stripe is the row-stripe analogue)
        so the full [heads, n, n] table never exists.
      residual: return block(x) + x.
    """
    assert not cfg.causal and cfg.num_null_kv == 0, \
        "blockwise path covers the CT-ViT spatial encoder shape"
    # dropout is a no-op at inference (deterministic=True, the dense path's
    # behavior); only refuse when it would actually have applied
    assert cfg.dropout == 0.0 or deterministic, \
        "blockwise path does not implement dropout (training mode)"
    assert attn_bias is None or bias_fn is None, \
        "pass either a dense bias or a bias_fn, not both"
    b, n, _ = x.shape
    h, dh = cfg.heads, cfg.dim_head
    if block is None:
        # largest divisor of n <= 512: usable default for any length
        block = max(d for d in range(1, min(n, 512) + 1) if n % d == 0)
    assert n % block == 0, (n, block)
    n_blocks = n // block
    f32 = jnp.float32

    xn = layernorm(params["norm"], x)
    q = linear(params["to_q"], xn)
    kv = linear(params["to_kv"], x)    # k/v from PRE-norm x (reference)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(t):
        return t.reshape(b, t.shape[1], h, dh).transpose(0, 2, 1, 3)

    q = l2norm(split_heads(q)) * params["q_scale"].astype(x.dtype)
    k = l2norm(split_heads(k)) * params["k_scale"].astype(x.dtype)
    v = split_heads(v)

    k_blocks = k.reshape(b, h, n_blocks, block, dh).transpose(2, 0, 1, 3, 4)
    v_blocks = v.reshape(b, h, n_blocks, block, dh).transpose(2, 0, 1, 3, 4)

    def step(carry, inputs):
        m, l, o = carry
        j, k_blk, v_blk = inputs
        scores = jnp.einsum("bhid,bhjd->bhij", q, k_blk,
                            preferred_element_type=f32) * cfg.scale
        if attn_bias is not None:
            blk = jax.lax.dynamic_slice(
                attn_bias, (0, 0, j * block), (h, n, block))
            scores = scores + blk.astype(f32)[None]
        elif bias_fn is not None:
            scores = scores + bias_fn(j * block).astype(f32)[None]

        m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        o_new = o * alpha + jnp.einsum(
            "bhij,bhjd->bhid", p, v_blk.astype(f32),
            preferred_element_type=f32)
        return (m_new, l_new, o_new), None

    m0 = jnp.full((b, h, n, 1), -jnp.inf, f32)
    l0 = jnp.zeros((b, h, n, 1), f32)
    o0 = jnp.zeros((b, h, n, dh), f32)
    (_, l, o), _ = jax.lax.scan(
        step, (m0, l0, o0),
        (jnp.arange(n_blocks, dtype=jnp.int32), k_blocks, v_blocks))

    out = (o / l).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, cfg.inner_dim)
    out = linear(params["to_out"], out)
    return out + x if residual else out


def blockwise_cosine_attention_qrows(params, cfg: AttentionConfig, x: Array,
                                     *, q_block: int,
                                     attn_bias: Optional[Array] = None,
                                     bias_row_fn: Optional[
                                         Callable[[Array], Array]] = None,
                                     deterministic: bool = True,
                                     residual: bool = False) -> Array:
    """QUERY-row-block cosine attention: scan over q stripes with a FULL
    softmax per stripe (every key visible), O(q_block * n) score memory and
    NO running-softmax carries.

    Why this exists next to `blockwise_cosine_attention`: the kv-block
    online-softmax scan carries full-length (max, denom, accumulator)
    state — [b, h, n, dh+2] fp32 copied and rescaled every step. At the
    MaskGit flagship grid (6,464 tokens, batch 4) that carry traffic was
    ~70% of CTGenerate's device time (while + copy + add in the xplane
    trace). Per q stripe here the only intermediate is the [b, h, q_block,
    n] score block, softmaxed once — math identical to the dense op (same
    full-row softmax, no rescaling chain), so parity is exact, not
    tolerance-tested.

    `bias_row_fn` maps a TOKEN row start (int32 scalar, multiple of
    q_block) to the [heads, q_block, n] bias ROW stripe
    (posbias.continuous_pos_bias_row_stripe3 for the MaskGit 3D grid).
    `n` need not divide by q_block: q is zero-padded, padded rows attend
    harmlessly (finite scores/bias, full-row softmax) and their outputs
    are dropped."""
    assert not cfg.causal and cfg.num_null_kv == 0, \
        "qrows path covers the MaskGit self-attention shape"
    assert cfg.dropout == 0.0 or deterministic, \
        "qrows path does not implement dropout (training mode)"
    assert attn_bias is None or bias_row_fn is None, \
        "pass either a dense bias or a bias_row_fn, not both"
    b, n, _ = x.shape
    h, dh = cfg.heads, cfg.dim_head

    # fused Pallas route: scores + bias stripe + softmax never leave VMEM
    # (the XLA scan below round-trips each fp32 score block through HBM —
    # measured 2.5x the matmul+traffic floor at the CTGenerate flagship
    # grid). Covers the dense-bias-table (or no-bias) mode; the streamed
    # bias_row_fn mode keeps the XLA scan.
    import os
    if (jax.default_backend() == "tpu" and bias_row_fn is None
            and os.environ.get("CTCLIP_QROWS", "") != "xla"):
        from .fallbacks import note_fallback
        from .pallas_attn_qrows import (attention_qrows_fused,
                                        qrows_vmem_estimate)
        if n % q_block or q_block % 8:
            note_fallback("attn_qrows", f"n={n} not divisible by "
                          f"q_block={q_block}")
        elif qrows_vmem_estimate(n, x.shape[-1], cfg.inner_dim, h, q_block,
                                 x.dtype.itemsize) > 100 * 2**20:
            note_fallback("attn_qrows", f"vmem estimate over budget at n={n}")
        else:
            wkv = params["to_kv"]["w"]
            dt = x.dtype
            return attention_qrows_fused(
                x, params["norm"]["gamma"],
                params["to_q"]["w"].astype(dt),
                wkv[:, :cfg.inner_dim].astype(dt),
                wkv[:, cfg.inner_dim:].astype(dt),
                params["to_out"]["w"].astype(dt),
                params["q_scale"], params["k_scale"], attn_bias, cfg.scale,
                q_block, False, residual)

    f32 = jnp.float32
    pad = (-n) % q_block
    nb = (n + pad) // q_block

    xn = layernorm(params["norm"], x)
    q = linear(params["to_q"], xn)
    kv = linear(params["to_kv"], x)    # k/v from PRE-norm x (reference)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(t):
        return t.reshape(b, t.shape[1], h, dh).transpose(0, 2, 1, 3)

    q = l2norm(split_heads(q)) * params["q_scale"].astype(x.dtype)
    k = l2norm(split_heads(k)) * params["k_scale"].astype(x.dtype)
    v = split_heads(v)

    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    q_blocks = q.reshape(b, h, nb, q_block, dh).transpose(2, 0, 1, 3, 4)
    if attn_bias is not None and pad:
        attn_bias = jnp.pad(attn_bias, ((0, 0), (0, pad), (0, 0)))

    def step(_, inputs):
        j, q_blk = inputs
        scores = jnp.einsum("bhid,bhjd->bhij", q_blk, k,
                            preferred_element_type=f32) * cfg.scale
        if attn_bias is not None:
            blk = jax.lax.dynamic_slice(
                attn_bias, (0, j * q_block, 0), (h, q_block, n))
            scores = scores + blk.astype(f32)[None]
        elif bias_row_fn is not None:
            scores = scores + bias_row_fn(j * q_block).astype(f32)[None]
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", p, v.astype(f32),
                       preferred_element_type=f32)
        return None, o.astype(x.dtype)

    _, o = jax.lax.scan(
        step, None, (jnp.arange(nb, dtype=jnp.int32), q_blocks))
    # [nb, b, h, q_block, dh] -> [b, n, inner]
    o = o.transpose(1, 2, 0, 3, 4).reshape(b, h, nb * q_block, dh)
    out = o[:, :, :n].transpose(0, 2, 1, 3).reshape(b, n, cfg.inner_dim)
    out = linear(params["to_out"], out)
    return out + x if residual else out

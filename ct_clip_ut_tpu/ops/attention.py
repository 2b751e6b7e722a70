"""QK-normalized (cosine-sim) attention.

Reference: src/utils/attention.py:87-182. Semantics reproduced exactly:
  * pre-norm with bias-frozen LayerNorm (context likewise when cross);
  * q, k, v projections without bias; optional learned null key/values
    prepended along the key axis;
  * q and k are l2-normalized per head-dim, then scaled by learned per-dim
    q_scale / k_scale vectors and a fixed scalar scale (default 8);
  * additive attention bias [heads, i, j] (zero-padded across null kvs),
    boolean key-padding mask [b, j] (True = keep), causal ALiBi + triu mask;
  * attention weights BEFORE dropout are a first-class structured output —
    this is the substrate for the whole attribution suite (the reference
    exposes them via forward hooks, visualizations.py:153-186).

TPU notes: logits/softmax accumulate in fp32; the no-weights inference path
can route through the fused Pallas kernel (ops/pallas_attention.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import AttentionConfig
from .layers import init_layernorm, init_linear, layernorm, linear, l2norm, dropout
from .posbias import alibi_bias, causal_mask

Array = jax.Array

NEG_INF = -3.4028234663852886e38  # -finfo(float32).max, matches masked_fill


def init_attention(key, cfg: AttentionConfig):
    k_q, k_kv, k_out, k_null = jax.random.split(key, 4)
    p = {
        "norm": init_layernorm(cfg.dim, bias=False),
        "to_q": init_linear(k_q, cfg.dim, cfg.inner_dim, bias=False),
        "to_kv": init_linear(k_kv, cfg.context_dim, cfg.inner_dim * 2, bias=False),
        "to_out": init_linear(k_out, cfg.inner_dim, cfg.dim, bias=False),
        "q_scale": jnp.ones((cfg.dim_head,), jnp.float32),
        "k_scale": jnp.ones((cfg.dim_head,), jnp.float32),
        # created even when num_null_kv == 0, like the reference (attention.py:116)
        "null_kv": jax.random.normal(
            k_null, (cfg.heads, 2 * cfg.num_null_kv, cfg.dim_head), jnp.float32),
    }
    if cfg.norm_context:
        p["context_norm"] = init_layernorm(cfg.context_dim, bias=False)
    return p


class AttentionOutput(NamedTuple):
    out: Array        # [b, n, dim]
    weights: Optional[Array]  # [b, heads, i, j] pre-dropout, or None


def _pallas_ok() -> bool:
    import jax as _jax
    return _jax.default_backend() == "tpu"


def attention(params, cfg: AttentionConfig, x: Array, *,
              mask: Optional[Array] = None,
              context: Optional[Array] = None,
              attn_bias: Optional[Array] = None,
              return_weights: bool = True,
              rng: Optional[Array] = None,
              deterministic: bool = True,
              use_pallas: Optional[bool] = None,
              residual: bool = False) -> AttentionOutput:
    """Apply cosine-sim attention.

    Args:
      x: [b, n, dim] queries (also keys/values when context is None).
      mask: optional [b, j] boolean key-padding mask (True = attend).
      context: optional [b, m, dim_context] for cross attention.
      attn_bias: optional [heads, i, j] additive bias (pre-null-kv padding).
      return_weights: emit pre-dropout attention weights (fp32).
      residual: return block(x) + x. On the fused-kernel paths the add rides
        the kernel's output write (x is already VMEM-resident) — a separate
        XLA add is a full extra HBM pass per layer, ~1 ms at flagship shapes.
    """
    b = x.shape[0]
    h = cfg.heads

    # fully-fused block kernel: LN + QKV + cosine attention + out projection
    # in one VMEM-resident pass (self-attention inference hot path)
    if use_pallas is None and context is None and mask is None:
        n_ = x.shape[1]
        fusable = (not return_weights and not cfg.causal
                   and cfg.num_null_kv == 0
                   and (deterministic or cfg.dropout == 0.0) and _pallas_ok())
        # short sequences (the temporal transformer's t=24): head-packed
        # fused block — one [n*h, n*h] masked attention per sequence instead
        # of h tiny [n, n] matmuls (ops/pallas_attn_packed.py). The
        # `x.shape[0] % 2 == 0` gate is a SHAPE RESTRICTION of the packed
        # kernel's sequence blocking (_pick_rows needs r >= 2 to divide the
        # batch); odd-batch callers silently take the slower per-head path
        # below — every production shape here is even (b*h*w or b*t).
        if (fusable and attn_bias is None and n_ < 128 and n_ * h <= 1024
                and x.shape[0] % 2 != 0):
            # make the deopt visible: odd-batch callers take the slower
            # per-head path below (see gate comment); a silent route-off
            # here can hide ~2x in a caller's throughput
            from .fallbacks import note_fallback
            note_fallback("attn_packed", f"odd batch {x.shape[0]}")
        if (fusable and attn_bias is None and n_ < 128
                and n_ * h <= 1024 and x.shape[0] % 2 == 0):
            from .pallas_attn_packed import attention_block_packed
            wkv = params["to_kv"]["w"]
            dt = x.dtype
            out = attention_block_packed(
                x, params["norm"]["gamma"],
                params["to_q"]["w"].astype(dt),
                wkv[:, :cfg.inner_dim].astype(dt),
                wkv[:, cfg.inner_dim:].astype(dt),
                params["to_out"]["w"].astype(dt),
                params["q_scale"], params["k_scale"], cfg.scale, False,
                residual)
            return AttentionOutput(out, None)
        if fusable and n_ >= 128 and n_ * n_ * 4 > 4 * 1024 * 1024:
            from .fallbacks import note_fallback
            note_fallback("attn_block", f"fp32 scores at n={n_} over the "
                          f"4 MB VMEM cap; XLA dense path")
        if (fusable
                and n_ >= 128 and n_ * n_ * 4 <= 4 * 1024 * 1024):
            from .pallas_attn_block import attention_block_fused
            wkv = params["to_kv"]["w"]
            dt = x.dtype
            out = attention_block_fused(
                x, params["norm"]["gamma"],
                params["to_q"]["w"].astype(dt),
                wkv[:, :cfg.inner_dim].astype(dt),
                wkv[:, cfg.inner_dim:].astype(dt),
                params["to_out"]["w"].astype(dt),
                params["q_scale"], params["k_scale"], attn_bias, cfg.scale,
                False, residual)
            return AttentionOutput(out, None)

    if context is not None and cfg.norm_context:
        context = layernorm(params["context_norm"], context)
    # NOTE: for self-attention k/v come from the PRE-norm x — the reference
    # captures kv_input before `x = self.norm(x)` (attention.py:138-140).
    kv_input = context if context is not None else x

    xn = layernorm(params["norm"], x)

    q = linear(params["to_q"], xn)
    kv = linear(params["to_kv"], kv_input)
    k, v = jnp.split(kv, 2, axis=-1)

    def split_heads(t):
        return t.reshape(t.shape[0], t.shape[1], h, cfg.dim_head).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)  # [b, h, n, d]

    # fused Pallas fast path: inference (no weights requested), no padding
    # mask, non-causal, no null kv — i.e. the CT-ViT encoder hot loop
    if use_pallas is None:
        n_, m_ = q.shape[2], k.shape[2]
        use_pallas = (not return_weights and mask is None and not cfg.causal
                      and cfg.num_null_kv == 0
                      and (deterministic or cfg.dropout == 0.0)
                      and n_ >= 128        # short seqs batch better in XLA
                      and n_ * m_ * 4 <= 4 * 1024 * 1024  # scores fit VMEM
                      and _pallas_ok())
    if use_pallas:
        from .pallas_attention import cosine_attention_fused
        n = q.shape[2]
        mkv = k.shape[2]
        out = cosine_attention_fused(
            q.reshape(b * h, n, cfg.dim_head),
            k.reshape(b * h, mkv, cfg.dim_head),
            v.reshape(b * h, mkv, cfg.dim_head),
            params["q_scale"], params["k_scale"],
            attn_bias, h, cfg.scale, False)
        out = out.reshape(b, h, n, cfg.dim_head).transpose(0, 2, 1, 3)
        out = out.reshape(b, n, cfg.inner_dim)
        out = linear(params["to_out"], out)
        return AttentionOutput(out + x if residual else out, None)

    if cfg.num_null_kv > 0:
        # null_kv is [h, 2*n_null, d]; reference repeats r=2 then unbinds,
        # i.e. interleaved (nk_0, nv_0, nk_1, nv_1, ...) pairs (attention.py:146)
        null = params["null_kv"].astype(k.dtype)
        null = null.reshape(h, cfg.num_null_kv, 2, cfg.dim_head)
        nk = jnp.broadcast_to(null[:, :, 0], (b, h, cfg.num_null_kv, cfg.dim_head))
        nv = jnp.broadcast_to(null[:, :, 1], (b, h, cfg.num_null_kv, cfg.dim_head))
        k = jnp.concatenate([nk, k], axis=-2)
        v = jnp.concatenate([nv, v], axis=-2)

    q = l2norm(q) * params["q_scale"].astype(q.dtype)
    k = l2norm(k) * params["k_scale"].astype(k.dtype)

    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * cfg.scale
    i, j = sim.shape[-2:]

    if attn_bias is not None:
        if cfg.num_null_kv > 0:
            attn_bias = jnp.pad(attn_bias, ((0, 0), (0, 0), (cfg.num_null_kv, 0)))
        sim = sim + attn_bias.astype(sim.dtype)

    if mask is not None:
        if cfg.num_null_kv > 0:
            mask = jnp.pad(mask, ((0, 0), (cfg.num_null_kv, 0)),
                           constant_values=True)
        sim = jnp.where(mask[:, None, None, :], sim, NEG_INF)

    if cfg.causal:
        sim = sim + alibi_bias(h, i, j)
        sim = jnp.where(causal_mask(i, j)[None, None], NEG_INF, sim)

    attn = jax.nn.softmax(sim, axis=-1)  # fp32
    weights = attn if return_weights else None

    attn = attn.astype(v.dtype)
    if not deterministic and cfg.dropout > 0.0:
        attn = dropout(rng, attn, cfg.dropout, deterministic=False)

    out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, -1, cfg.inner_dim)
    out = linear(params["to_out"], out)
    return AttentionOutput(out + x if residual else out, weights)

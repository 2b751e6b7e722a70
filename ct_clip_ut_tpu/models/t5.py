"""T5-v1_1 encoder (google/t5-v1_1-base shape) in JAX.

The reference wraps HF T5EncoderModel (reference src/utils/t5.py:28-90):
encode() returns pad-masked last hidden states, and get_token_indices()
matches pathology keywords to token index spans for cross-attention slicing.
We implement the encoder natively (RMSNorm, relative-position-bucket bias in
block 0, gated-GELU FF); weights convert from the HF checkpoint
(train/checkpoint.py:convert_t5). The tokenizer stays a host-side HF object.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5EncoderConfig
from ..ops.layers import init_linear, linear

Array = jax.Array


def _rms_norm(weight: Array, x: Array, eps: float) -> Array:
    """T5LayerNorm: no mean subtraction, no bias."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def _gelu_new(x: Array) -> Array:
    """HF 'gelu_new' (tanh approximation) used by t5-v1_1 gated FF."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> Array:
    """Bidirectional T5 relative-position bucketing (HF semantics)."""
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    rel = mem - ctx                                  # [q, k]

    nb = num_buckets // 2
    buckets = jnp.where(rel > 0, nb, 0)
    rel_abs = jnp.abs(rel)

    max_exact = nb // 2
    is_small = rel_abs < max_exact
    val_large = max_exact + (
        jnp.log(rel_abs.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, nb - 1)
    return buckets + jnp.where(is_small, rel_abs, val_large)


def init_t5_encoder(key, cfg: T5EncoderConfig):
    keys = iter(jax.random.split(key, 3 + 7 * cfg.num_layers))
    inner = cfg.num_heads * cfg.d_kv
    params = {
        "shared": jax.random.normal(next(keys), (cfg.vocab_size, cfg.d_model)),
        "rel_bias": jax.random.normal(
            next(keys), (cfg.relative_attention_num_buckets, cfg.num_heads)) * 0.1,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "q": init_linear(next(keys), cfg.d_model, inner, bias=False),
            "k": init_linear(next(keys), cfg.d_model, inner, bias=False),
            "v": init_linear(next(keys), cfg.d_model, inner, bias=False),
            "o": init_linear(next(keys), inner, cfg.d_model, bias=False),
            "ff_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "wi_0": init_linear(next(keys), cfg.d_model, cfg.d_ff, bias=False),
            "wi_1": init_linear(next(keys), cfg.d_model, cfg.d_ff, bias=False),
            "wo": init_linear(next(keys), cfg.d_ff, cfg.d_model, bias=False),
        })
    return params


def t5_encode(params, cfg: T5EncoderConfig, input_ids: Array,
              attention_mask: Optional[Array] = None) -> Array:
    """last_hidden_state [b, n, d_model], pad positions zeroed
    (reference t5.py:87-89)."""
    b, n = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)

    x = jnp.take(params["shared"], input_ids, axis=0)

    neg = jnp.finfo(jnp.float32).min
    ext_mask = (1.0 - attention_mask.astype(jnp.float32)) * neg
    ext_mask = ext_mask[:, None, None, :]

    buckets = relative_position_buckets(
        n, n, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    pos_bias = jnp.take(params["rel_bias"], buckets, axis=0)   # [q, k, heads]
    pos_bias = pos_bias.transpose(2, 0, 1)[None]               # [1, h, q, k]

    h_ = cfg.num_heads

    for blk in params["blocks"]:
        y = _rms_norm(blk["attn_norm"], x, cfg.layer_norm_eps)

        def split(t):
            return t.reshape(b, n, h_, cfg.d_kv).transpose(0, 2, 1, 3)

        q = split(linear(blk["q"], y))   # T5: NO 1/sqrt(d) scaling
        k = split(linear(blk["k"], y))
        v = split(linear(blk["v"], y))
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim + pos_bias + ext_mask
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, h_ * cfg.d_kv)
        x = x + linear(blk["o"], ctx)

        y = _rms_norm(blk["ff_norm"], x, cfg.layer_norm_eps)
        gated = _gelu_new(linear(blk["wi_0"], y)) * linear(blk["wi_1"], y)
        x = x + linear(blk["wo"], gated)

    x = _rms_norm(params["final_norm"], x, cfg.layer_norm_eps)
    return jnp.where(attention_mask[..., None].astype(bool), x, 0.0)


class T5TextConditioner:
    """Host-side wrapper pairing the JAX encoder with an HF tokenizer
    (reference t5.py:28-90, incl. the keyword->token-index matcher)."""

    def __init__(self, params, cfg: T5EncoderConfig, tokenizer):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.tokens: List[str] = []
        self._encode = jax.jit(
            lambda p, ids, mask: t5_encode(p, cfg, ids, mask))

    def encode(self, texts, max_length: Optional[int] = None):
        enc = self.tokenizer(
            list(texts) if not isinstance(texts, str) else [texts],
            return_tensors="np", padding="longest", truncation=True,
            max_length=max_length or self.cfg.max_length)
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        # per-row token lists so batched encodes can resolve keyword spans
        # per sample (get_token_indices(..., index=i))
        self.batch_tokens = [
            self.tokenizer.convert_ids_to_tokens(row)
            for row in np.asarray(ids).tolist()]
        self.tokens = self.batch_tokens[0]
        return self._encode(self.params, ids, mask), mask.astype(bool)

    def get_token_indices(self, keywords, index: int = 0):
        """First-match token index span per keyword over the last encoded
        text (reference t5.py:41-68); `index` picks the row of a batched
        encode."""
        def norm(tokens):
            return [t.lstrip("▁").lower() for t in tokens]

        out = {}
        toks = norm(self.batch_tokens[index]
                    if hasattr(self, "batch_tokens") else self.tokens)
        for kw in keywords:
            kw_ids = self.tokenizer(kw, add_special_tokens=False)["input_ids"]
            kw_toks = norm(self.tokenizer.convert_ids_to_tokens(kw_ids))
            for i in range(len(toks) - len(kw_toks) + 1):
                if toks[i:i + len(kw_toks)] == kw_toks:
                    out[kw] = list(range(i, i + len(kw_toks)))
                    break
        return out

"""BERT-style text encoder (CXR-BERT-specialized compatible).

The reference consumes HF `BertModel` as a black box and takes the CLS hidden
state (reference src/models/ctclip.py:107, src/train_ctclip.py:17). We
implement the encoder natively in JAX so the text tower jits/shards with the
rest of the model; weights convert from the HF checkpoint
(train/checkpoint.py). Matches HF BertModel semantics: learned word/position/
token-type embeddings -> post-LN transformer stack -> last_hidden_state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import BertConfig
from ..ops.layers import dropout, init_linear, layernorm, linear

Array = jax.Array


def _init_ln(dim):
    return {"gamma": jnp.ones((dim,), jnp.float32),
            "beta": jnp.zeros((dim,), jnp.float32)}


def init_bert(key, cfg: BertConfig):
    keys = iter(jax.random.split(key, 6 + 6 * cfg.num_layers))
    h = cfg.hidden_size
    emb_scale = 0.02

    def emb(k, n, d):
        return jax.random.normal(k, (n, d), jnp.float32) * emb_scale

    params = {
        "embeddings": {
            "word": emb(next(keys), cfg.vocab_size, h),
            "position": emb(next(keys), cfg.max_position_embeddings, h),
            "token_type": emb(next(keys), cfg.type_vocab_size, h),
            "ln": _init_ln(h),
        },
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "q": init_linear(next(keys), h, h, bias=True),
            "k": init_linear(next(keys), h, h, bias=True),
            "v": init_linear(next(keys), h, h, bias=True),
            "attn_out": init_linear(next(keys), h, h, bias=True),
            "attn_ln": _init_ln(h),
            "ffn_in": init_linear(next(keys), h, cfg.intermediate_size, bias=True),
            "ffn_out": init_linear(next(keys), cfg.intermediate_size, h, bias=True),
            "ffn_ln": _init_ln(h),
        })
    return params


def bert_apply(params, cfg: BertConfig, input_ids: Array,
               attention_mask: Optional[Array] = None,
               token_type_ids: Optional[Array] = None,
               *, rng: Optional[Array] = None,
               deterministic: bool = True,
               compute_dtype=jnp.float32) -> Array:
    """Returns last_hidden_state [b, n, hidden]."""
    b, n = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)

    e = params["embeddings"]
    x = (jnp.take(e["word"], input_ids, axis=0)
         + e["position"][None, :n]
         + jnp.take(e["token_type"], token_type_ids, axis=0))
    x = layernorm(e["ln"], x, eps=cfg.layer_norm_eps).astype(compute_dtype)
    if not deterministic:
        rng, r = jax.random.split(rng)
        x = dropout(r, x, cfg.hidden_dropout, deterministic=False)

    # HF-style additive mask: 0 where attended, dtype-min where padded
    neg = jnp.finfo(jnp.float32).min
    mask_row = (1.0 - attention_mask.astype(jnp.float32)) * neg  # [b, n]
    ext_mask = mask_row[:, None, None, :]

    head_dim = cfg.hidden_size // cfg.num_heads
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))

    # fused Pallas layer: the whole encoder layer (QKV + masked softmax
    # attention + out-proj + post-LN + exact-GELU FF + post-LN, dropout via
    # the TPU PRNG) runs as ONE kernel per layer — the unfused stack was
    # ~50 ms of the flagship train step at a ~15 ms MXU floor
    # (ops/pallas_bert_layer.py). Dropout masks come from the hardware PRNG
    # instead of threefry (statistically equivalent; deterministic mode is
    # parity-tested against this XLA path).
    if (jax.default_backend() == "tpu"
            and cfg.hidden_size % 128 == 0 and n % 8 == 0 and n >= 128
            and head_dim % 8 == 0
            and cfg.num_heads * head_dim == cfg.hidden_size):
        from ..ops.pallas_bert_layer import bert_layer_fused
        train = not deterministic
        for layer in params["layers"]:
            if train and rng is not None:
                rng, r = jax.random.split(rng)
                seeds = jax.random.randint(r, (3,), 0, 2**31 - 1,
                                           dtype=jnp.int32)
            else:
                train = False
                seeds = jnp.zeros((3,), jnp.int32)
            wqkv = jnp.concatenate(
                [layer["q"]["w"], layer["k"]["w"], layer["v"]["w"]], axis=1)
            bqkv = jnp.concatenate(
                [layer["q"]["b"], layer["k"]["b"], layer["v"]["b"]])
            x = bert_layer_fused(
                x, mask_row, seeds, wqkv, bqkv,
                layer["attn_out"]["w"], layer["attn_out"]["b"],
                layer["attn_ln"]["gamma"], layer["attn_ln"]["beta"],
                layer["ffn_in"]["w"], layer["ffn_in"]["b"],
                layer["ffn_out"]["w"], layer["ffn_out"]["b"],
                layer["ffn_ln"]["gamma"], layer["ffn_ln"]["beta"],
                cfg.num_heads, cfg.layer_norm_eps,
                cfg.attention_dropout if train else 0.0,
                cfg.hidden_dropout if train else 0.0, train)
        return x

    for layer in params["layers"]:
        if not deterministic:
            rng, r_attn, r1, r2 = jax.random.split(rng, 4)
        else:
            r_attn = r1 = r2 = None

        # fused QKV: one [h, 3h] matmul instead of three [h, h] dots. Each
        # output column reads only its own weight column block and the
        # contraction axis is unchanged, so results match the separate dots;
        # measured ~2x on the projection share of the text tower (the three
        # small dots ran far off MXU peak). Params stay three leaves — HF
        # converter / sharding rules untouched; the concat is 7 MB, fused
        # away by XLA.
        qkv_w = jnp.concatenate(
            [layer["q"]["w"], layer["k"]["w"], layer["v"]["w"]],
            axis=1).astype(x.dtype)
        qkv_b = jnp.concatenate(
            [layer["q"]["b"], layer["k"]["b"], layer["v"]["b"]])
        qkv = (x @ qkv_w) + qkv_b.astype(x.dtype)  # linear() cast semantics
        q, k, v = [t.reshape(b, n, cfg.num_heads, head_dim)
                   .transpose(0, 2, 1, 3)
                   for t in jnp.split(qkv, 3, axis=-1)]

        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * scale
        sim = sim + ext_mask
        attn = jax.nn.softmax(sim, axis=-1).astype(compute_dtype)
        if not deterministic:
            attn = dropout(r_attn, attn, cfg.attention_dropout, deterministic=False)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(compute_dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)

        h = linear(layer["attn_out"], ctx)
        if not deterministic:
            h = dropout(r1, h, cfg.hidden_dropout, deterministic=False)
        x = layernorm(layer["attn_ln"], h + x, eps=cfg.layer_norm_eps).astype(compute_dtype)

        h = linear(layer["ffn_in"], x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(compute_dtype)
        h = linear(layer["ffn_out"], h)
        if not deterministic:
            h = dropout(r2, h, cfg.hidden_dropout, deterministic=False)
        x = layernorm(layer["ffn_ln"], h + x, eps=cfg.layer_norm_eps).astype(compute_dtype)

    return x


def bert_cls(params, cfg: BertConfig, input_ids, attention_mask=None,
             token_type_ids=None, **kw) -> Array:
    """CLS-token hidden state [b, hidden] (reference ctclip.py:107)."""
    return bert_apply(params, cfg, input_ids, attention_mask,
                      token_type_ids, **kw)[:, 0, :]

"""MaskGit transformer over CT-ViT codebook ids with T5 cross-attention.

Reference: src/utils/maskgit.py:5-83. Token + position embeddings, the
gradient-shrink trick (alpha 0.1), a 3D continuous position bias over the
token grid, a depth-6 Transformer with cross-attention (2 null KV) to T5
report embeddings, and a logits head.

API fix by design (SURVEY.md 2.5 #2): the reference unpacks
`x, _, cross_attn_weights` from a Transformer that returns one value — dead
code in the snapshot. Here the Transformer genuinely returns per-layer
self/cross attention weights and MaskGit surfaces them.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MaskGitConfig
from ..ops.layers import init_linear, linear
from ..ops.posbias import continuous_pos_bias, init_continuous_pos_bias
from ..ops.transformer import init_transformer, transformer

Array = jax.Array


def init_maskgit(key, cfg: MaskGitConfig):
    k_tok, k_pos, k_cpb, k_tr, k_out = jax.random.split(key, 5)
    return {
        "token_emb": jax.random.normal(
            k_tok, (cfg.num_tokens + 1, cfg.dim)) * 0.02,
        "pos_emb": jax.random.normal(
            k_pos, (cfg.max_seq_len, cfg.dim)) * 0.02,
        "continuous_pos_bias": init_continuous_pos_bias(
            k_cpb, dim=cfg.dim_head, heads=cfg.heads, num_dims=3),
        "transformer": init_transformer(k_tr, cfg.transformer()),
        "to_logits": init_linear(k_out, cfg.dim, cfg.num_tokens, bias=True),
    }


class MaskGitOutput(NamedTuple):
    output: Array                       # logits [b, n, num_tokens] or embeds
    self_attn: Tuple[Array, ...]        # per-layer [b, heads, n, n]
    cross_attn: Tuple[Array, ...]       # per-layer [b, heads, n, 2 + text_len]


def maskgit_apply(params, cfg: MaskGitConfig, ct_codebook_ids: Array,
                  context: Array, video_patch_shape: Tuple[int, int, int], *,
                  text_mask: Optional[Array] = None,
                  video_mask: Optional[Array] = None,
                  return_embeds: bool = False,
                  weights: str = "all",
                  rng=None, deterministic: bool = True) -> MaskGitOutput:
    """Args mirror reference maskgit.py:40-56: flattened ids [b, n], T5
    context [b, text_len, dim_context], and the (t, h, w) token grid shape.

    weights: "all" returns every layer's self+cross attention; "last_cross"
    captures only the final layer's cross-attention (what CTGenerate's
    keyword heatmaps consume) — at the 101x8x8-token flagship grid, all-layer
    fp32 weights are ~8 GB, so selective capture matters."""
    b, n = ct_codebook_ids.shape

    x = jnp.take(params["token_emb"], ct_codebook_ids, axis=0)
    x = x + params["pos_emb"][:n][None]

    # gradient-shrink (reference maskgit.py:64): value unchanged, gradient
    # scaled by alpha
    a = cfg.gradient_shrink_alpha
    x = x * a + jax.lax.stop_gradient(x) * (1.0 - a)

    attn_bias = continuous_pos_bias(
        params["continuous_pos_bias"], *video_patch_shape)  # [heads, n, n]

    if weights == "last_cross":
        from ..ops.taps import Taps
        taps = Taps(capture={f"{cfg.depth - 1}.cross_attn_weights"})
        out, _ = transformer(
            params["transformer"], cfg.transformer(), x,
            video_shape=(b, *video_patch_shape),
            attn_bias=attn_bias, context=context,
            self_attn_mask=video_mask, cross_attn_context_mask=text_mask,
            return_weights=False, taps=taps, rng=rng,
            deterministic=deterministic)
        cross = (taps.collected[f"{cfg.depth - 1}.cross_attn_weights"],)
        self_attn = ()
    else:
        out, aux = transformer(
            params["transformer"], cfg.transformer(), x,
            video_shape=(b, *video_patch_shape),
            attn_bias=attn_bias, context=context,
            self_attn_mask=video_mask, cross_attn_context_mask=text_mask,
            return_weights=True, rng=rng, deterministic=deterministic)
        cross = aux.cross_attn
        self_attn = aux.self_attn

    if not return_embeds:
        out = linear(params["to_logits"], out)
    return MaskGitOutput(output=out, self_attn=self_attn, cross_attn=cross)

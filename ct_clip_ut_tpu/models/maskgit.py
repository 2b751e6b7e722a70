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

# blockwise mode builds the layer-shared CPB bias table once per forward
# when it fits under this cap (1.3 GB at the flagship 101x8x8 grid) —
# per-scan-step stripe rebuilds measured 2/3 of the attention cost. Past
# the cap, stripes keep bias memory O(q_block * n).
_BIAS_TABLE_MAX_BYTES = 2 * 1024**3

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


def _self_attn_bias(params, cfg: MaskGitConfig, video_patch_shape, n: int,
                    self_attn_block, *, weights: str, video_mask):
    """(attn_bias, bias_fn) for the self-attention CPB.

    Dense mode: the [heads, n, n] table. Blockwise (long-context) mode:
    q-row-block scans over the scores (never a [b, heads, n, n] score
    tensor — 5.3 GB fp32 at the 101x8x8 grid, batch 4) with the bias read
    per stripe; outputs equal the dense path exactly (full-row softmax).
    The CPB table is LAYER-SHARED and batch-independent ([heads, n, n]
    fp32 = 1.3 GB at the flagship grid), so up to _BIAS_TABLE_MAX_BYTES it
    is built ONCE and row-sliced inside each layer's scan — rebuilding
    stripes per scan step measured 66 of 99 ms per layer-apply (2/3 of the
    attention cost). Past the cap, the per-step stripe builder keeps bias
    memory O(q_block * n). Factored out so maskgit_generate can hoist the
    build OUT of its decode loop (`precomputed_bias`) — while-loop
    invariant code motion does not reliably hoist a 1.3 GB-producing
    subgraph."""
    if self_attn_block is None:
        return continuous_pos_bias(
            params["continuous_pos_bias"], *video_patch_shape), None

    d1, d2, d3 = video_patch_shape
    assert video_mask is None, "blockwise MaskGit has no video mask"
    assert weights in ("last_cross", "none"), \
        "self-attention weights are not observable blockwise"
    assert self_attn_block % (d2 * d3) == 0, (self_attn_block, d2, d3)
    if cfg.heads * n * n * 4 <= _BIAS_TABLE_MAX_BYTES:
        from ..ops.posbias import continuous_pos_bias_grouped3
        return continuous_pos_bias_grouped3(
            params["continuous_pos_bias"], d1, d2, d3), None   # [h, n, n]

    from ..ops.posbias import (continuous_pos_bias_row_stripe3,
                               cpb_offset_table)
    # MLP over the distinct offsets once; each query block pays only the
    # one-hot selection inside the scan
    cpb_table = cpb_offset_table(params["continuous_pos_bias"], (d1, d2, d3))

    def bias_fn(row0):
        return continuous_pos_bias_row_stripe3(
            None, d1, d2, d3, row0 // (d2 * d3),
            self_attn_block // (d2 * d3), table=cpb_table)

    return None, bias_fn


def maskgit_apply(params, cfg: MaskGitConfig, ct_codebook_ids: Array,
                  context: Array, video_patch_shape: Tuple[int, int, int], *,
                  text_mask: Optional[Array] = None,
                  video_mask: Optional[Array] = None,
                  return_embeds: bool = False,
                  weights: str = "all",
                  self_attn_block: Optional[int] = None,
                  rng=None, deterministic: bool = True,
                  precomputed_bias=None,
                  compute_dtype: Optional[str] = None) -> MaskGitOutput:
    """Args mirror reference maskgit.py:40-56: flattened ids [b, n], T5
    context [b, text_len, dim_context], and the (t, h, w) token grid shape.

    weights: "all" returns every layer's self+cross attention; "last_cross"
    captures only the final layer's cross-attention (what CTGenerate's
    keyword heatmaps consume) — at the 101x8x8-token flagship grid, all-layer
    fp32 weights are ~8 GB, so selective capture matters; "none" captures
    nothing (the iterative-decode loop)."""
    b, n = ct_codebook_ids.shape

    x = jnp.take(params["token_emb"], ct_codebook_ids, axis=0)
    x = x + params["pos_emb"][:n][None]

    # gradient-shrink (reference maskgit.py:64): value unchanged, gradient
    # scaled by alpha
    a = cfg.gradient_shrink_alpha
    x = x * a + jax.lax.stop_gradient(x) * (1.0 - a)

    # serving dtype: embeddings/pos math stay fp32, the transformer stack
    # (and its fused kernels) runs in compute_dtype; softmax/LN internals
    # are fp32 either way. None keeps the params' dtype (the parity path).
    if compute_dtype is not None:
        x = x.astype(jnp.dtype(compute_dtype))
        context = context.astype(jnp.dtype(compute_dtype))

    if precomputed_bias is not None:
        attn_bias, bias_fn = precomputed_bias
    else:
        attn_bias, bias_fn = _self_attn_bias(
            params, cfg, video_patch_shape, n, self_attn_block,
            weights=weights, video_mask=video_mask)

    if weights in ("last_cross", "none"):
        from ..ops.taps import Taps
        taps = Taps(capture=(set() if weights == "none" else
                             {f"{cfg.depth - 1}.cross_attn_weights"}))
        out, _ = transformer(
            params["transformer"], cfg.transformer(), x,
            video_shape=(b, *video_patch_shape),
            attn_bias=attn_bias, context=context,
            self_attn_mask=video_mask, cross_attn_context_mask=text_mask,
            return_weights=False, taps=taps, rng=rng,
            deterministic=deterministic,
            self_attn_block=self_attn_block, self_attn_bias_fn=bias_fn)
        cross = (() if weights == "none" else
                 (taps.collected[f"{cfg.depth - 1}.cross_attn_weights"],))
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


def _cosine_mask_counts(n: int, steps: int):
    """MaskGIT cosine schedule: number of positions still masked after each
    decode step (strictly decreasing to 0 at the last step)."""
    import math
    counts = [int(math.floor(math.cos(math.pi / 2 * (s + 1) / steps) * n))
              for s in range(steps)]
    counts[-1] = 0
    return counts


def maskgit_generate(params, cfg: MaskGitConfig, context: Array,
                     video_patch_shape: Tuple[int, int, int], *,
                     text_mask: Optional[Array] = None,
                     steps: int = 18, temperature: float = 1.0,
                     rng: Array) -> Array:
    """Iterative parallel decode of a CT token grid conditioned on a T5
    report embedding — the GenerateCT capability the reference carries the
    architecture for but never runs (its MaskGit is only ever used for one
    attribution forward, CTGenerateInference.py:125; the snapshot strips the
    CT-ViT decoder weights, notebooks/generate_notebook). Standard MaskGIT
    confidence schedule:

      all positions start at the learned MASK embedding (the num_tokens+1-th
      token_emb row); each of `steps` scan iterations predicts logits for
      every position, samples the masked ones (temperature annealed to 0),
      and keeps the most confident samples so that the cosine schedule's
      mask count survives to the next iteration.

    Static trip count + static per-step mask counts -> one compiled program
    (jax.lax.scan), no host round-trips. Returns int32 ids [b, n] with every
    id < cfg.num_tokens.
    """
    b = context.shape[0]
    t, h, w = video_patch_shape
    n = t * h * w
    mask_id = cfg.num_tokens                      # the extra token_emb row

    mask_counts = jnp.asarray(_cosine_mask_counts(n, steps), jnp.int32)
    anneal = jnp.linspace(1.0, 0.0, steps + 1)[1:]  # -> 0 at the last step

    # long grids decode through the q-row-block route like
    # ctgenerate_apply: dense [b, heads, n, n] scores at the flagship
    # 101x8x8 grid are the HBM wall, and weights="none" satisfies the
    # blockwise observability constraint by construction. The CPB bias is
    # built ONCE here, outside the decode scan — inside step_fn it would
    # be rebuilt (1.3 GB grouped build) every one of the `steps` iterations
    bias = _self_attn_bias(params, cfg, video_patch_shape, n,
                           h * w if n >= 4096 else None,
                           weights="none", video_mask=None)
    blk = h * w if n >= 4096 else None

    def step_fn(carry, xs):
        ids, is_masked, rng = carry
        n_keep_masked, temp_scale = xs
        rng, r_sample = jax.random.split(rng)

        logits = maskgit_apply(
            params, cfg, ids, context, video_patch_shape,
            text_mask=text_mask, weights="none",
            self_attn_block=blk, precomputed_bias=bias).output  # [b, n, V]
        logits = logits.astype(jnp.float32)

        temp = jnp.maximum(temperature * temp_scale, 1e-6)
        sampled = jax.random.categorical(r_sample, logits / temp, axis=-1)
        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None],
                                   axis=-1)[..., 0]            # [b, n]

        # already-fixed positions keep their ids with infinite confidence
        sampled = jnp.where(is_masked, sampled, ids)
        conf = jnp.where(is_masked, conf, jnp.inf)

        # re-mask EXACTLY the n_keep_masked least-confident positions:
        # rank each position by (conf, index) — a stable argsort-of-argsort —
        # so confidence ties at the cut cannot drift off the cosine schedule
        order = jnp.argsort(conf, axis=-1, stable=True)        # ascending
        rank = jnp.argsort(order, axis=-1)                     # [b, n]
        remask = rank < n_keep_masked
        ids = jnp.where(remask, mask_id, sampled).astype(jnp.int32)
        return (ids, remask, rng), None

    ids0 = jnp.full((b, n), mask_id, jnp.int32)
    masked0 = jnp.ones((b, n), bool)
    (ids, _, _), _ = jax.lax.scan(step_fn, (ids0, masked0, rng),
                                  (mask_counts, anneal))
    return ids

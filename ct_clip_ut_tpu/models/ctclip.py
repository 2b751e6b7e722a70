"""CTCLIP: dual-tower contrastive model over chest CT volumes and reports.

Reference: src/models/ctclip.py:44-129. Text tower takes the BERT CLS hidden
state; image tower mean-pools CT-ViT tokens over the temporal axis, flattens
the 24x24x512 grid to a 294,912-d vector and projects to the 512-d latent;
both latents are l2-normalized and contrasted with a learnable scalar
temperature.

Distributed contrastive batch: the reference implements a custom
`GatherWithGrad` autograd.Function over NCCL all_gather whose backward
returns only the local rank's grad slice (reference ctclip.py:10-41), relying
on DDP's grad averaging to recombine. Here `gather_axis` simply names a mesh
axis: `jax.lax.all_gather` is natively differentiable (its transpose is
psum_scatter), and together with the pmean over the data axis in the training
step it reproduces the same math with no custom backward.

API fix over the reference (SURVEY.md section 2.5 #1): attention weights and
tap captures are part of the structured output instead of hook side-channels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from ..ops.layers import init_linear, l2norm, linear
from ..ops.taps import NULL_TAPS, Taps
from ..ops.vq import VQState
from .bert import bert_cls, init_bert
from .ctvit import _ctvit_encode_tokens, ctvit_apply, init_ctvit

Array = jax.Array


def init_ctclip(key, cfg: CTCLIPConfig):
    k_text, k_vis, k_tl, k_vl = jax.random.split(key, 4)
    return {
        "text_transformer": init_bert(k_text, cfg.bert),
        "visual_transformer": init_ctvit(k_vis, cfg.ctvit),
        "to_text_latent": init_linear(k_tl, cfg.dim_text, cfg.dim_latent, bias=False),
        "to_visual_latent": init_linear(k_vl, cfg.dim_image, cfg.dim_latent, bias=False),
        "temperature": jnp.asarray(cfg.temperature_init, jnp.float32),
    }


class CTCLIPOutput(NamedTuple):
    sim_matrix: Array            # [B_img(global), B_txt(global)]
    image_latents: Array         # [B(global), dim_latent], l2-normalized
    text_latents: Array
    temperature: Array           # exp(temperature) scalar
    image_tokens: Array          # [b, t, h, w, d] quantized CT-ViT tokens
    spatial_attn: Optional[tuple]
    temporal_attn: Optional[tuple]
    vq_state: VQState
    # CT-ViT MoE load-balance aux loss (None for the dense parity model);
    # the train step adds TrainConfig.moe_aux_weight * moe_aux to the loss
    moe_aux: Optional[Array] = None


def encode_image_latents(params, cfg: CTCLIPConfig, image: Array, *,
                         freeze_vq: bool = True, return_weights: bool = False,
                         taps: Taps = NULL_TAPS, rng=None,
                         deterministic: bool = True,
                         prepatchified: bool = False):
    """Image half: CT-ViT -> temporal mean -> flatten -> project -> l2norm
    (reference ctclip.py:110-120). Returns (latents, CTViTOutput).
    With prepatchified=True, `image` is a [b, t, h, w, patch_dim] patch
    tensor (see ctvit.patchify) — the gradient-attribution entry point."""
    vit_out = ctvit_apply(
        params["visual_transformer"], cfg.ctvit, image,
        freeze_vq=freeze_vq, return_weights=return_weights, taps=taps,
        rng=rng, deterministic=deterministic, prepatchified=prepatchified)
    tokens = vit_out.tokens                                # [b, t, h, w, d]
    # fp32-accumulated temporal mean, cast back: keeps the bf16 path free of
    # a materialized fp32 copy of the grid (profiled round 3) and is a
    # no-op for fp32 inputs
    pooled = tokens.mean(axis=1, dtype=jnp.float32).astype(tokens.dtype)
    flat = pooled.reshape(pooled.shape[0], -1)             # [b, h*w*d]
    latents = linear(params["to_visual_latent"], flat)
    return l2norm(latents), vit_out


def encode_image_latents_from_tokens(params, cfg: CTCLIPConfig,
                                     token_grid: Array, *,
                                     freeze_vq: bool = True):
    """Image half starting from an EMBEDDED [b, t, h, w, d] token grid (the
    output of the patch embed): transformer encode -> VQ -> temporal mean ->
    flatten -> project -> l2norm. Lets callers that mutate few patches
    (occlusion's token-level masking shortcut, attribution/occlusion.py)
    skip the full-volume patch embed. Returns (latents, CTViTOutput)."""
    vit_out = _ctvit_encode_tokens(
        params["visual_transformer"], cfg.ctvit, token_grid,
        freeze_vq=freeze_vq, return_weights=False,
        taps=NULL_TAPS, rng=None, deterministic=True)
    pooled = vit_out.tokens.mean(axis=1, dtype=jnp.float32)
    pooled = pooled.astype(vit_out.tokens.dtype)
    flat = pooled.reshape(pooled.shape[0], -1)
    latents = linear(params["to_visual_latent"], flat)
    return l2norm(latents), vit_out


def encode_image_latents_from_spatial_out(params, cfg: CTCLIPConfig,
                                          spatial_out: Array, *,
                                          freeze_vq: bool = True):
    """Image half starting from the SPATIAL-stack output grid [b, t, h, w, d]
    (post final LN of the spatial transformer): temporal transformer -> VQ ->
    temporal mean -> flatten -> project -> l2norm. Entry point for occlusion's
    frame-sparse recompute (attribution/occlusion.py), which caches the clean
    spatial stack and re-runs it only on the frames a window can influence.
    Returns [b, dim_latent] latents."""
    from ..ops.vq import vq_apply
    from .ctvit import ctvit_temporal_encode
    vt = params["visual_transformer"]
    x, _ = ctvit_temporal_encode(vt, cfg.ctvit, spatial_out)
    b, t, h, w, d = x.shape
    quant, _, _ = vq_apply(vt["vq"], x.reshape(b, t * h * w, d),
                           freeze=freeze_vq, decay=cfg.ctvit.vq_decay,
                           eps=cfg.ctvit.vq_eps)
    pooled = quant.reshape(b, t, h, w, d).mean(axis=1, dtype=jnp.float32)
    pooled = pooled.astype(quant.dtype)
    latents = linear(params["to_visual_latent"],
                     pooled.reshape(b, -1))
    return l2norm(latents)


def encode_text_latents(params, cfg: CTCLIPConfig, text_tokens, *,
                        rng=None, deterministic: bool = True,
                        compute_dtype=jnp.float32):
    """Text half: BERT CLS -> project -> l2norm (reference ctclip.py:107,115,119).
    `text_tokens` is a dict with input_ids / attention_mask / token_type_ids."""
    cls = bert_cls(
        params["text_transformer"], cfg.bert,
        text_tokens["input_ids"],
        text_tokens.get("attention_mask"),
        text_tokens.get("token_type_ids"),
        rng=rng, deterministic=deterministic, compute_dtype=compute_dtype)
    latents = linear(params["to_text_latent"], cls)
    return l2norm(latents)


def ctclip_apply(params, cfg: CTCLIPConfig, text_tokens, image: Array, *,
                 text_embeds: Optional[Array] = None,
                 gather_axis: Optional[str] = None,
                 freeze_vq: bool = True,
                 return_weights: bool = False,
                 taps: Taps = NULL_TAPS,
                 rng=None, deterministic: bool = True,
                 prepatchified: bool = False) -> CTCLIPOutput:
    """Full forward (reference ctclip.py:99-129).

    Args:
      text_tokens: tokenized text dict, or None when `text_embeds` is given
        (the precomputed-embedding bypass used by occlusion's pathology
        diff-embeddings, reference ctclip.py:107, visualizations.py:1030-1043).
      text_embeds: optional [b, dim_text] CLS-level embeddings.
      gather_axis: mesh axis name to all_gather latents over (inside
        shard_map); None for single-shard.
    """
    if rng is not None:
        rng, r_text, r_img = jax.random.split(rng, 3)
    else:
        r_text = r_img = None

    if text_tokens is not None:
        text_latents = encode_text_latents(
            params, cfg, text_tokens, rng=r_text, deterministic=deterministic,
            compute_dtype=image.dtype)
    else:
        text_latents = l2norm(linear(params["to_text_latent"], text_embeds))

    image_latents, vit_out = encode_image_latents(
        params, cfg, image, freeze_vq=freeze_vq,
        return_weights=return_weights, taps=taps, rng=r_img,
        deterministic=deterministic, prepatchified=prepatchified)

    if gather_axis is not None:
        # differentiable global contrastive batch (reference ctclip.py:123-124)
        text_latents = jax.lax.all_gather(text_latents, gather_axis, tiled=True)
        image_latents = jax.lax.all_gather(image_latents, gather_axis, tiled=True)

    temp = jnp.exp(params["temperature"])
    sim = (image_latents.astype(jnp.float32)
           @ text_latents.astype(jnp.float32).T) * temp

    return CTCLIPOutput(
        sim_matrix=sim,
        image_latents=image_latents,
        text_latents=text_latents,
        temperature=temp,
        image_tokens=vit_out.tokens,
        spatial_attn=vit_out.spatial_attn,
        temporal_attn=vit_out.temporal_attn,
        vq_state=vit_out.vq_state,
        moe_aux=vit_out.moe_aux)


def contrastive_loss(sim_matrix: Array, targets: Optional[Array] = None) -> Array:
    """Symmetric InfoNCE: mean of CE over rows and columns with arange
    targets (reference CTClipTrainer.py:164-175)."""
    n = sim_matrix.shape[0]
    if targets is None:
        targets = jnp.arange(n)
    logp_i2t = jax.nn.log_softmax(sim_matrix, axis=-1)
    logp_t2i = jax.nn.log_softmax(sim_matrix.T, axis=-1)
    loss_i2t = -jnp.take_along_axis(logp_i2t, targets[:, None], axis=-1).mean()
    loss_t2i = -jnp.take_along_axis(logp_t2i, targets[:, None], axis=-1).mean()
    return (loss_i2t + loss_t2i) / 2.0

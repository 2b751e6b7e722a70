"""CT-ViT: 3D video tokenizer with factorized spatial/temporal attention
and a cosine-VQ bottleneck.

Reference: src/utils/ctvit.py:9-125. Pipeline for a [b, 1, 240, 480, 480]
volume (ctclip config): 3D patch embed (20x20 spatial, 10 temporal) ->
[b, 24, 24, 24, 512] token grid -> spatial transformer over (b t) x 576
tokens with a 2D continuous-position bias -> temporal transformer over
(b h w) x 24 tokens -> VQ (8192-codebook, cosine) -> [b, 24, 24, 24, 512].

The factorized attention is the architectural long-context device of the
whole model: it bounds attention to 576^2 instead of 13,824^2 (SURVEY.md
section 5). On TPU the (b*t) and (b*h*w) leading axes are large clean batch
dims that vmap straight onto the MXU and shard over the mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CTViTConfig
from ..ops.layers import init_layernorm, init_linear, layernorm, linear
from ..ops.posbias import continuous_pos_bias, init_continuous_pos_bias
from ..ops.taps import NULL_TAPS, Taps
from ..ops.transformer import init_transformer, transformer
from ..ops.vq import VQState, init_vq, vq_apply

Array = jax.Array


def init_ctvit(key, cfg: CTViTConfig):
    k_bias, k_pe, k_pe1, k_sp, k_tmp, k_vq = jax.random.split(key, 6)
    params = {
        "spatial_rel_pos_bias": init_continuous_pos_bias(
            k_bias, dim=cfg.dim, heads=cfg.heads, num_dims=2),
        "to_patch_emb": {
            "norm_in": init_layernorm(cfg.patch_dim, bias=True),
            "proj": init_linear(k_pe, cfg.patch_dim, cfg.dim, bias=True),
            "norm_out": init_layernorm(cfg.dim, bias=True),
        },
        "spatial": init_transformer(k_sp, cfg.spatial_transformer()),
        "temporal": init_transformer(k_tmp, cfg.temporal_transformer()),
        "vq": init_vq(k_vq, cfg.codebook_size, cfg.dim),
    }
    if cfg.model_type == "ctgenerate":
        params["to_patch_emb_first_frame"] = {
            "norm_in": init_layernorm(cfg.first_frame_patch_dim, bias=True),
            "proj": init_linear(k_pe1, cfg.first_frame_patch_dim, cfg.dim, bias=True),
            "norm_out": init_layernorm(cfg.dim, bias=True),
        }
    return params


def _patch_embed(p, x: Array) -> Array:
    """LN -> Linear -> LN over raw patch pixels (reference ctvit.py:44-52)."""
    h = layernorm(p["norm_in"], x)
    h = linear(p["proj"], h)
    return layernorm(p["norm_out"], h)


def _patch_embed_conv(p, image: Array, patch: int, t_patch: int,
                      eps: float = 1e-5) -> Array:
    """Fused patch embedding as a strided conv3d with the first LayerNorm
    folded in algebraically — equivalent to patchify + LN + Linear:

        LN(x) @ W = [ (x * gamma) @ W - mean(x) * sum_i(gamma_i W_i) ]
                    / sqrt(var(x) + eps)  +  beta @ W

    so the projection becomes conv3d(x, gamma-scaled kernel) and the
    per-patch mean/var come from two cheap reduce_windows. Avoids the 8-d
    patchify transpose and the materialized [.., patch_dim] normalized
    tensor (the dominant cost of the XLA patch-embed lowering on TPU).
    """
    b, c, T, H, W = image.shape
    dim = p["proj"]["w"].shape[1]
    patch_dim = c * t_patch * patch * patch

    gamma = p["norm_in"]["gamma"].astype(jnp.float32)        # [patch_dim]
    beta = p["norm_in"]["beta"].astype(jnp.float32)
    w = p["proj"]["w"].astype(jnp.float32)                   # [patch_dim, dim]

    wg = (w * gamma[:, None]).reshape(c, t_patch, patch, patch, dim)
    s1 = (w * gamma[:, None]).sum(axis=0)                    # [dim]
    bias = beta @ w + p["proj"].get("b", jnp.zeros((dim,))).astype(jnp.float32)

    # fully-fused Pallas path: rearrange + per-wv MXU matmuls + both LNs in
    # one HBM pass (ops/pallas_patch_embed.py) — the XLA lowering below
    # spends ~17 ms/batch in three full-volume layout copies at flagship
    # shapes. Falls back off-TPU / for multi-channel inputs.
    if (jax.default_backend() == "tpu" and c == 1
            and T % t_patch == 0 and H % patch == 0 and W % patch == 0):
        from ..ops.pallas_patch_embed import patch_embed_fused
        k1d_f = wg.reshape(c * t_patch * patch, patch, dim).transpose(1, 0, 2)
        out = patch_embed_fused(image, k1d_f, s1,
                                bias, p["norm_out"]["gamma"],
                                p["norm_out"]["beta"], patch, t_patch)
        return out

    # Temporal patches don't overlap, so the 3D conv factorizes into a 1D
    # conv over W with (c * t_patch * p1) = 200 input channels after folding
    # the H-within-patch rows into channels. Layout rules this respects
    # (violations are 6.4x tile-padding blowups at flagship shapes, see
    # tools/bench_patch_embed.py):
    #   * no singleton-channel arrays (lane-pad 1 -> 128);
    #   * no array may have a minor dim of `patch`=20 (T(8,128) tiling pads
    #     20 -> 128) — so never patchify/transpose into [.., 20] shapes;
    #   * the only transpose keeps W=480 minor ([.., 10, 24, 20, 480] ->
    #     [.., 24, 200, 480]).
    t = T // t_patch
    hp, wp = H // patch, W // patch
    cin = c * t_patch * patch
    x1d = image.reshape(b, c, t, t_patch, hp, patch, W)
    x1d = x1d.transpose(0, 2, 4, 1, 3, 5, 6).reshape(b * t * hp, cin, W)

    # kernel rows ordered (c, pt, p1, p2) -> [width p2, in (c, pt, p1), dim]
    k1d = wg.reshape(cin, patch, dim).transpose(1, 0, 2)

    # no preferred_element_type: mixed fwd/bwd dtypes break the conv
    # transpose rule; TPU convs accumulate fp32 internally regardless
    conv = jax.lax.conv_general_dilated(
        x1d[:, :, None, :], k1d[None].astype(image.dtype),
        window_strides=(1, patch), padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NHWC"),
        ).astype(jnp.float32)                          # [b*t*h, 1, w, dim]
    conv = conv.reshape(b * t, hp, wp, dim)

    # per-patch moments via a window->patch incidence matmul over W plus a
    # plain reduction over the folded (c, pt, p1) channel axis — 7x faster
    # than the former reduce_window pair (tools/bench_moments.py). HIGHEST
    # keeps the f32 contraction off the bf16x3 MXU decomposition.
    inc = jnp.kron(jnp.eye(wp, dtype=jnp.float32),
                   jnp.ones((patch, 1), jnp.float32))  # [W, w]
    x32 = x1d.astype(jnp.float32)
    sum1 = jax.lax.dot_general(
        x32.sum(axis=1), inc, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)           # [b*t*h, w]
    sum2 = jax.lax.dot_general(
        (x32 * x32).sum(axis=1), inc, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    sum1 = sum1.reshape(b * t, hp, wp)
    sum2 = sum2.reshape(b * t, hp, wp)
    mean = (sum1 / patch_dim)[..., None]
    var = jnp.maximum((sum2 / patch_dim)[..., None] - mean * mean, 0.0)

    h = (conv - mean * s1) * jax.lax.rsqrt(var + eps) + bias
    h = h.reshape(b, t, H // patch, W // patch, dim)
    return layernorm(p["norm_out"], h.astype(image.dtype))


def patchify(image: Array, patch: int, t_patch: int) -> Array:
    """[b, c, T, H, W] -> [b, t, h, w, c * t_patch * patch^2], matching
    einops 'b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)'
    (reference ctvit.py:46-48)."""
    b, c, T, H, W = image.shape
    t, h, w = T // t_patch, H // patch, W // patch
    x = image.reshape(b, c, t, t_patch, h, patch, w, patch)
    # -> b t h w (c pt p1 p2)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, t, h, w, c * t_patch * patch * patch)


def unpatchify_np(patches, patch: int, t_patch: int, channels: int = 1):
    """Host-side (numpy) inverse of `patchify`: [t, h, w, patch_dim] ->
    [c * t_patch * t, h * patch, w * patch] (leading channel axis squeezed
    for c == 1). Cheap on host; on TPU the inverse permutation is a heavily
    tile-padded transpose — this is why attribution maps are computed in
    patch space and un-permuted here exactly once."""
    import numpy as np
    p = np.asarray(patches)
    t, h, w, pd = p.shape
    c = channels
    x = p.reshape(t, h, w, c, t_patch, patch, patch)
    x = x.transpose(3, 0, 4, 1, 5, 2, 6)  # c t pt h p1 w p2
    x = x.reshape(c, t * t_patch, h * patch, w * patch)
    return x[0] if c == 1 else x


class CTViTOutput(NamedTuple):
    tokens: Optional[Array]       # [b, t, h, w, d] quantized tokens
    codebook_ids: Array           # [b, t, h, w]
    spatial_attn: Optional[tuple]
    temporal_attn: Optional[tuple]
    vq_state: VQState             # updated when training (EMA), else input
    # summed MoE load-balance aux loss over both encoder stacks (None when
    # cfg.moe_experts == 0, i.e. the dense reference-parity model)
    moe_aux: Optional[Array] = None


def ctvit_temporal_encode(params, cfg: CTViTConfig, x: Array, *,
                          return_weights: bool = False, taps: Taps = NULL_TAPS,
                          rng=None, deterministic: bool = True):
    """Temporal half of the factorized encode: [b, t, h, w, d] spatial-stack
    output -> temporal transformer over (b h w) t d -> [b, t, h, w, d]
    (reference ctvit.py:99-101). Split out so callers that cache the spatial
    stack (occlusion's frame-sparse recompute) can enter here directly."""
    b, t, h, w, d = x.shape
    x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
    x, tm_aux = transformer(
        params["temporal"], cfg.temporal_transformer(), x,
        video_shape=(b, t, h, w), return_weights=return_weights,
        taps=taps, scope="temporal.", rng=rng, deterministic=deterministic)
    x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
    return x, tm_aux


def ctvit_encode(params, cfg: CTViTConfig, tokens: Array, *,
                 return_weights: bool = False, taps: Taps = NULL_TAPS,
                 rng=None, deterministic: bool = True):
    """Factorized spatial+temporal encoding of a [b, t, h, w, d] token grid
    (reference ctvit.py:88-103)."""
    b, t, h, w, d = tokens.shape
    video_shape = (b, t, h, w)

    attn_bias = continuous_pos_bias(
        params["spatial_rel_pos_bias"], cfg.patch_height, cfg.patch_width)

    # spatial: (b t) (h w) d
    x = tokens.reshape(b * t, h * w, d)
    x, sp_aux = transformer(
        params["spatial"], cfg.spatial_transformer(), x,
        video_shape=video_shape, attn_bias=attn_bias,
        return_weights=return_weights, taps=taps, scope="spatial.",
        rng=rng, deterministic=deterministic)
    x = x.reshape(b, t, h, w, d)

    x, tm_aux = ctvit_temporal_encode(
        params, cfg, x, return_weights=return_weights, taps=taps,
        rng=rng, deterministic=deterministic)

    return x, sp_aux, tm_aux


def token_grid_shape(cfg: CTViTConfig, image_shape) -> tuple:
    """(t, h, w) codebook-id grid for a [b, c, T, H, W] input — the shape
    `ctvit_apply(...).codebook_ids[0]` will have, computable without running
    the encoder (serving drivers pre-build MaskGit's CPB table from it).
    ctgenerate embeds the first frame separately (reference ctvit.py:106-110),
    so t = 1 + (T-1)/tps there."""
    T, H, W = (int(s) for s in image_shape[-3:])
    if cfg.model_type == "ctgenerate":
        t = 1 + (T - 1) // cfg.temporal_patch_size
    else:
        t = T // cfg.temporal_patch_size
    return (t, H // cfg.patch_size, W // cfg.patch_size)


def ctvit_apply(params, cfg: CTViTConfig, image: Array, *,
                freeze_vq: bool = True,
                return_weights: bool = False,
                taps: Taps = NULL_TAPS,
                rng=None, deterministic: bool = True,
                prepatchified: bool = False) -> CTViTOutput:
    """Full CT-ViT forward (reference ctvit.py:105-125).

    Args:
      image: [b, c, T, H, W] preprocessed volume, or — with
        prepatchified=True — an already-patchified [b, t, h, w, patch_dim]
        tensor (see `patchify`). The prepatchified entry exists so gradient
        methods (IG) can differentiate w.r.t. the patch tensor directly: the
        patchify transpose is a pixel permutation whose VJP is a heavily
        tile-padded transpose on TPU (~400 ms per step at flagship shapes),
        and since elementwise math and global statistics commute with a
        permutation, attribution maps can be computed entirely in patch
        space and un-permuted once on the host.
      freeze_vq: skip the EMA codebook update (eval / frozen-codebook mode,
        mirroring `freeze_codebook=not self.training`, reference ctvit.py:118).
    """
    if prepatchified:
        assert cfg.model_type != "ctgenerate", (
            "prepatchified input is only supported for the ctclip embed")
        tokens = _patch_embed(params["to_patch_emb"], image)
        return _ctvit_encode_tokens(params, cfg, tokens, freeze_vq=freeze_vq,
                                    return_weights=return_weights, taps=taps,
                                    rng=rng, deterministic=deterministic)
    if cfg.patch_embed_conv:
        def embed(p, img, t_patch):
            return _patch_embed_conv(p, img, cfg.patch_size, t_patch)
    else:
        def embed(p, img, t_patch):
            return _patch_embed(p, patchify(img, cfg.patch_size, t_patch))

    if cfg.model_type == "ctgenerate":
        # first frame embedded separately (reference ctvit.py:106-110)
        first, rest = image[:, :, :1], image[:, :, 1:]
        first_tokens = embed(params["to_patch_emb_first_frame"], first, 1)
        rest_tokens = embed(params["to_patch_emb"], rest,
                            cfg.temporal_patch_size)
        tokens = jnp.concatenate([first_tokens, rest_tokens], axis=1)
    else:
        tokens = embed(params["to_patch_emb"], image, cfg.temporal_patch_size)

    return _ctvit_encode_tokens(params, cfg, tokens, freeze_vq=freeze_vq,
                                return_weights=return_weights, taps=taps,
                                rng=rng, deterministic=deterministic)


def _ctvit_encode_tokens(params, cfg: CTViTConfig, tokens: Array, *,
                         freeze_vq: bool, return_weights: bool, taps: Taps,
                         rng, deterministic: bool) -> CTViTOutput:
    """Transformer encode + VQ of an embedded [b, t, h, w, d] token grid."""
    tokens, sp_aux, tm_aux = ctvit_encode(
        params, cfg, tokens, return_weights=return_weights, taps=taps,
        rng=rng, deterministic=deterministic)

    b, t, h, w, d = tokens.shape
    flat = taps.tap("vq.input", tokens.reshape(b, t * h * w, d))
    quant, idx, vq_state = vq_apply(
        params["vq"], flat, freeze=freeze_vq,
        decay=cfg.vq_decay, eps=cfg.vq_eps)
    quant = taps.tap("vq.features", quant)

    auxes = [a.moe_aux for a in (sp_aux, tm_aux) if a.moe_aux is not None]
    return CTViTOutput(
        tokens=quant.reshape(b, t, h, w, d),
        codebook_ids=idx.reshape(b, t, h, w),
        spatial_attn=sp_aux.self_attn,
        temporal_attn=tm_aux.self_attn,
        vq_state=vq_state,
        moe_aux=sum(auxes) if auxes else None)

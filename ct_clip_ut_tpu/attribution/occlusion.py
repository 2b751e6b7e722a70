"""Occlusion sensitivity: batched masked-forward sweep.

Reference: src/utils/visualizations.py:335-424, 1029-1082. A 3D window
(patch 20x40x40, stride 10x20x20 over a 240x480x480 volume = 23^3 = 12,167
windows) is filled with -1; the drop in the per-sample similarity score is
the window's importance; importances accumulate into a count-normalized,
min-max-scaled, thresholded heatmap. The reference runs every masked forward
serially (one full model forward each — the dominant cost of the whole
codebase) and shards the window list across GPU ranks with a SUM reduce.

TPU re-design (identical outputs):
  * the text latent and the baseline score are computed ONCE; each masked
    forward only needs the image tower (the reference recomputes the text
    tower every patch, ctclip.py:107 — same numbers);
  * masked forwards are vmapped in chunks and scanned via lax.map — one
    compiled program, MXU-saturating batches, no host round-trips;
  * heatmap/count accumulation is exact but closed-form: scores live on the
    23^3 window grid, and summing window contributions over voxels is a
    transposed convolution with a ones kernel at the stride — two
    conv_transposes replace 12,167 scatter-adds;
  * multi-device: shard the window axis over the mesh ("data") — under jit
    the psum of partial heatmaps is inserted automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig, OcclusionConfig
from ..models.ctclip import encode_image_latents, encode_text_latents
from ..ops.layers import l2norm, linear

Array = jax.Array


# ---------------------------------------------------------------------------
# token-level masking shortcut
# ---------------------------------------------------------------------------
#
# The occlusion window only changes the voxels inside it, and the patch embed
# is strictly per-patch (LN over patch_dim -> Linear -> LN over dim,
# ctvit._patch_embed) — so a masked forward differs from the clean forward
# only in the <= (kd, kh, kw) block of ViT patches the window intersects
# (2x2x2 at the flagship geometry: window 20x40x40 at stride 10x20x20 over
# 10x20x20-voxel patches). Embedding the full 24^3 x 4000 patch tensor per
# window is therefore redundant: embed the clean volume ONCE, and per window
# re-embed only the intersected block and splice it into the cached clean
# token grid. Bit-compatible with the full forward because the matmul embed
# is per-patch and the untouched tokens are byte-identical cached values.
# This also removes the 221 MB-per-lane patch normalization that forced
# parity-mode chunks down to 2 (see occlusion_scores).


def _patch_block_geometry(vol_shape, patch_q, occ_patch, stride=None):
    """Static geometry: per-axis ViT-patch block size k (max patches a window
    can intersect) and the token-grid shape. When the window stride is a
    multiple of the ViT patch size, every window origin is patch-aligned and
    the block tightens to ceil(p/q) (2x2x2 at the flagship geometry: window
    20x40x40, stride 10x20x20, patches 10x20x20); unaligned origins can
    straddle one extra patch per axis."""
    grid = tuple(v // q for v, q in zip(vol_shape, patch_q))
    k = []
    for ax, (p, q, g) in enumerate(zip(occ_patch, patch_q, grid)):
        aligned = stride is not None and stride[ax] % q == 0
        ka = (p - 1) // q + (1 if aligned else 2)
        k.append(min(ka, g))
    return grid, tuple(k)


def _occluded_token_block(embed_params, image, origin, patch_q, k, grid,
                          occ_patch, fill, is_baseline, patch_embed_fn):
    """Re-embed the ViT-patch block intersected by the window at `origin`.

    Returns (block_tokens [1, kd, kh, kw, dim], block_grid_origin [3])."""
    # block origin in patch coordinates, clamped so the static-size block
    # stays inside the grid
    g0 = [jnp.clip(origin[ax] // patch_q[ax], 0, grid[ax] - k[ax])
          for ax in range(3)]
    v0 = [g0[ax] * patch_q[ax] for ax in range(3)]
    vol_block_shape = tuple(k[ax] * patch_q[ax] for ax in range(3))

    block = jax.lax.dynamic_slice(
        image, (0, 0, v0[0], v0[1], v0[2]), (1, 1) + vol_block_shape)

    # occlude inside the block: window offset relative to the block. The
    # window always lies inside the block by construction of g0/k.
    off = [origin[ax] - v0[ax] for ax in range(3)]
    fill_blk = jnp.full((1, 1) + tuple(occ_patch), fill, image.dtype)
    own = jax.lax.dynamic_slice(block, (0, 0, off[0], off[1], off[2]),
                                (1, 1) + tuple(occ_patch))
    fill_blk = jnp.where(is_baseline, own, fill_blk)
    block = jax.lax.dynamic_update_slice(block, fill_blk,
                                         (0, 0, off[0], off[1], off[2]))

    tokens = patch_embed_fn(embed_params, block)   # [1, kd, kh, kw, dim]
    return tokens, jnp.stack([g0[0], g0[1], g0[2]])


# ---------------------------------------------------------------------------
# frame-sparse spatial recompute
# ---------------------------------------------------------------------------
#
# The spatial transformer is strictly per-frame EXCEPT for PEG's depthwise
# conv3d, whose causal frame pad (2, 0) makes output frame tau depend on
# input frames tau-2..tau (reference attention.py:55-83). A window touching
# wf temporal token-frames therefore dirties at most wf + 2*l contiguous
# frames after l spatial layers (2 -> 10 of 24 at flagship depth 4) — so
# instead of re-running the spatial stack on all 24 frames per window, we
# cache the clean per-layer inputs ONCE and per window recompute each layer
# only on its (static-size, dynamic-offset) dirty frame slice, feeding the
# 2-frame PEG halo from the clean cache. Recomputing a clean frame from
# clean inputs reproduces the clean value, so the slice may conservatively
# include clean frames (needed for static shapes near the volume edges).
# The temporal stack + VQ + projection then run on the full spliced grid
# (they are the cheap tail at flagship shapes).


def _spatial_block_full(layer, tcfg, x, video_shape, attn_bias):
    """One spatial transformer block (PEG -> self-attn -> FF, all residual)
    exactly as ops/transformer.py's plain layer applies it."""
    from ..ops.attention import attention
    from ..ops.layers import feedforward, peg_residual
    x = peg_residual(layer["peg"], x, video_shape, causal=tcfg.peg_causal)
    x, _ = attention(layer["self_attn"], tcfg.self_attn(), x,
                     attn_bias=attn_bias, residual=True)
    return feedforward(layer["ff"], x, residual=True)


def _spatial_clean_stack(vt_params, tcfg, tokens, attn_bias):
    """Clean spatial stack, keeping per-layer inputs.

    Returns (layer_inputs, spatial_out): layer_inputs[l] is the video-form
    [1, t, h, w, d] INPUT to spatial layer l; spatial_out is the post-norm
    output grid."""
    from ..ops.layers import layernorm
    b, t, h, w, d = tokens.shape
    layer_inputs = []
    x = tokens.reshape(b * t, h * w, d)
    for layer in vt_params["spatial"]["layers"]:
        layer_inputs.append(x.reshape(b, t, h, w, d))
        x = _spatial_block_full(layer, tcfg, x, (b, t, h, w), attn_bias)
    out = layernorm(vt_params["spatial"]["norm_out"], x)
    return layer_inputs, out.reshape(b, t, h, w, d)


def _spatial_block_slice(layer, tcfg, xh, attn_bias):
    """The same block on a frame slice: `xh` [1, m+2, h, w, d] holds the m
    output frames' inputs plus the 2 leading causal-PEG halo frames; returns
    the [1, m, h, w, d] block output for those m frames. The PEG conv runs
    VALID over frames (the halo replaces the causal pad); attention and FF
    are frame-local."""
    import jax
    from ..ops.attention import attention
    from ..ops.layers import feedforward
    b, mp2, h, w, d = xh.shape
    m = mp2 - 2
    out = jax.lax.conv_general_dilated(
        xh, layer["peg"]["w"].astype(xh.dtype), (1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=d)
    out = (out.astype(jnp.float32) + layer["peg"]["b"]
           + xh[:, 2:].astype(jnp.float32))
    x = out.astype(xh.dtype).reshape(b * m, h * w, d)
    x, _ = attention(layer["self_attn"], tcfg.self_attn(), x,
                     attn_bias=attn_bias, residual=True)
    x = feedforward(layer["ff"], x, residual=True)
    return x.reshape(b, m, h, w, d)


def window_grid(shape_dhw: Tuple[int, int, int], patch, stride) -> Array:
    """[N, 3] window origins, ordered d-major like the reference's nested
    comprehension (visualizations.py:340-349)."""
    D, H, W = shape_dhw
    ds = jnp.arange(0, D - patch[0] + 1, stride[0])
    hs = jnp.arange(0, H - patch[1] + 1, stride[1])
    ws = jnp.arange(0, W - patch[2] + 1, stride[2])
    grid = jnp.stack(jnp.meshgrid(ds, hs, ws, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(jnp.int32)


def _occlude(image: Array, origin: Array, patch, fill: float,
             is_baseline=None) -> Array:
    """Fill a [pd, ph, pw] window at `origin` with `fill` ([1,1,D,H,W] image).
    With is_baseline=True the window is re-filled with the image's OWN
    content (a no-op), so the baseline score runs through the exact same
    compiled program as every masked forward."""
    block = jnp.full((1, 1) + tuple(patch), fill, image.dtype)
    if is_baseline is not None:
        own = jax.lax.dynamic_slice(
            image, (0, 0, origin[0], origin[1], origin[2]),
            (1, 1) + tuple(patch))
        block = jnp.where(is_baseline, own, block)
    return jax.lax.dynamic_update_slice(
        image, block, (0, 0, origin[0], origin[1], origin[2]))


def _sweep_scores(params, cfg: CTCLIPConfig, image: Array, txt: Array,
                  coords: Array, occ: OcclusionConfig, chunk: int,
                  token_shortcut: bool, frame_sparse: bool = False) -> Array:
    """Core masked-forward sweep. `txt` is [K, dim_latent]; returns
    [N + 1, K] scores with the baseline (no-op window) at row 0, computed
    through the SAME chunked program as every masked forward so importances
    are internally consistent regardless of lowering."""
    from ..models.ctclip import (encode_image_latents_from_spatial_out,
                                 encode_image_latents_from_tokens)
    from ..models.ctvit import _patch_embed, patchify

    temp = jnp.exp(params["temperature"])
    txt = txt.astype(jnp.float32)                          # [K, L]
    embed_params = params["visual_transformer"]["to_patch_emb"]
    patch_q = (cfg.ctvit.temporal_patch_size,
               cfg.ctvit.patch_size, cfg.ctvit.patch_size)
    vol_shape = image.shape[-3:]
    grid, kblk = _patch_block_geometry(vol_shape, patch_q, occ.patch_size,
                                       occ.stride)

    def embed_fn(p, vol):
        return _patch_embed(p, patchify(vol, cfg.ctvit.patch_size,
                                        cfg.ctvit.temporal_patch_size))

    if token_shortcut and frame_sparse:
        # clean token grid + clean per-layer spatial inputs cached ONCE;
        # per window only the dirty frame slices re-run (see module notes)
        from ..ops.layers import layernorm
        from ..ops.posbias import continuous_pos_bias
        vt = params["visual_transformer"]
        tcfg = cfg.ctvit.spatial_transformer()
        assert tcfg.peg_causal, "frame-sparse assumes the causal PEG pad"
        clean_tokens = embed_fn(embed_params, image)       # [1, t, h, w, d]
        attn_bias = continuous_pos_bias(
            vt["spatial_rel_pos_bias"], cfg.ctvit.patch_height,
            cfg.ctvit.patch_width)
        layer_inputs, clean_sp_out = _spatial_clean_stack(
            vt, tcfg, clean_tokens, attn_bias)
        _, t, h, w, d = clean_tokens.shape
        # 2 leading zero frames stand in for the causal PEG pad, so slice
        # starts never go negative
        zeros2 = jnp.zeros((1, 2, h, w, d), clean_tokens.dtype)
        padded_inputs = [jnp.concatenate([zeros2, xi], axis=1)
                         for xi in layer_inputs]
        layers = vt["spatial"]["layers"]
        wf = kblk[0]                       # window frames at layer-0 input

        def latent_of(origin, flag):
            blk, g0 = _occluded_token_block(
                embed_params, image, origin, patch_q, kblk, grid,
                occ.patch_size, occ.fill_value, flag, embed_fn)
            f0 = g0[0]
            # layer-0 dirty slice: clean frames with the patch block spliced
            dirty = jax.lax.dynamic_update_slice(
                jax.lax.dynamic_slice(layer_inputs[0], (0, f0, 0, 0, 0),
                                      (1, wf, h, w, d)),
                blk, (0, 0, g0[1], g0[2], 0))
            o_d, m_d = f0, wf
            for l, layer in enumerate(layers):
                m = min(wf + 2 * (l + 1), t)
                o = jnp.clip(f0, 0, t - m)
                # input slice [o-2, o+m) = padded [o, o+m+2), dirty spliced
                xh = jax.lax.dynamic_slice(
                    padded_inputs[l], (0, o, 0, 0, 0), (1, m + 2, h, w, d))
                xh = jax.lax.dynamic_update_slice(
                    xh, dirty, (0, o_d - o + 2, 0, 0, 0))
                dirty = _spatial_block_slice(layer, tcfg, xh, attn_bias)
                o_d, m_d = o, m
            dirty = layernorm(vt["spatial"]["norm_out"], dirty)
            out_grid = jax.lax.dynamic_update_slice(
                clean_sp_out, dirty, (0, o_d, 0, 0, 0))
            lat = encode_image_latents_from_spatial_out(
                params, cfg, out_grid, freeze_vq=True)
            return lat[0].astype(jnp.float32)
    elif token_shortcut:
        # clean token grid embedded ONCE with the bit-stable matmul embed
        clean_tokens = embed_fn(embed_params, image)       # [1, t, h, w, d]

        def latent_of(origin, flag):
            blk, g0 = _occluded_token_block(
                embed_params, image, origin, patch_q, kblk, grid,
                occ.patch_size, occ.fill_value, flag, embed_fn)
            tok = jax.lax.dynamic_update_slice(
                clean_tokens, blk, (0, g0[0], g0[1], g0[2], 0))
            lat, _ = encode_image_latents_from_tokens(params, cfg, tok,
                                                      freeze_vq=True)
            return lat[0].astype(jnp.float32)
    else:
        def latent_of(origin, flag):
            img = _occlude(image, origin, occ.patch_size, occ.fill_value,
                           is_baseline=flag)
            lat, _ = encode_image_latents(params, cfg, img, freeze_vq=True)
            return lat[0].astype(jnp.float32)

    n = coords.shape[0]
    # entry 0 is the baseline (no-op occlusion at the first window origin)
    coords_all = jnp.concatenate([coords[:1], coords], axis=0)
    is_base = jnp.zeros((n + 1,), bool).at[0].set(True)

    pad = (-(n + 1)) % chunk
    coords_p = jnp.pad(coords_all, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    base_p = jnp.pad(is_base, (0, pad)).reshape(-1, chunk)

    def chunk_scores(args):
        origins, base_flags = args
        def one(origin, flag):
            return (latent_of(origin, flag) @ txt.T) * temp   # [K]
        return jax.vmap(one)(origins, base_flags)

    scores = jax.lax.map(chunk_scores, (coords_p, base_p))
    return scores.reshape(-1, txt.shape[0])[:n + 1]


@partial(jax.jit, static_argnames=("cfg", "occ", "chunk",
                                   "token_shortcut", "frame_sparse"))
def occlusion_scores(params, cfg: CTCLIPConfig, image: Array,
                     text_latent: Array, coords: Array, *,
                     occ: OcclusionConfig = OcclusionConfig(),
                     chunk: int = 8,
                     token_shortcut: bool = True,
                     frame_sparse: bool = True) -> Tuple[Array, Array]:
    """(original_score, per-window occluded scores [N]).

    `text_latent` is the fixed [dim_latent] prompt/report/diff-embedding
    latent; score = <image_latent, text_latent> * exp(temperature), the
    sim[0, 0] the reference reads per forward (visualizations.py:375,388).

    token_shortcut=True (default) runs the token-level masking shortcut
    (see module notes): clean volume embedded once, per window only the
    intersected ViT-patch block is re-embedded and spliced in.
    token_shortcut=False runs full masked forwards through the bit-stable
    parity config (the serial-oracle path used by the parity tests)."""
    if not token_shortcut:
        from .capture import parity_cfg
        cfg = parity_cfg(cfg)
        # the bit-stable matmul embed normalizes [n, patch_dim] in fp32
        # (221 MB per lane at flagship shapes) — cap the vmap width
        chunk = min(chunk, 2)
    scores = _sweep_scores(params, cfg, image, text_latent[None], coords,
                           occ, chunk, token_shortcut, frame_sparse)[:, 0]
    return scores[0], scores[1:]


def _expand_axis(out, ax, n, p, s):
    """Window->voxel sum along one axis: out has windows on axis `ax`;
    returns the array with that axis expanded to `n` voxels, each voxel
    holding the sum over the windows covering it. Voxel i is covered by
    windows g with g*s <= i < g*s + p, i.e. g in (floor((i-p)/s),
    floor(i/s)]; with the cumulative sum S along the window axis that whole
    range collapses to S[hi] - S[lo] — two takes and a subtract per axis,
    independent of the window overlap factor."""
    import numpy as np
    g = out.shape[ax]
    i = np.arange(n)
    hi = np.clip(i // s, -1, g - 1)                  # last covering window
    lo = np.clip((i - p) // s, -1, g - 1)            # last NON-covering one
    s_cum = np.cumsum(out, axis=ax, dtype=out.dtype)
    pad_shape = list(out.shape)
    pad_shape[ax] = 1
    s_pad = np.concatenate(
        [np.zeros(pad_shape, out.dtype), s_cum], axis=ax)  # S[-1] = 0
    return (np.take(s_pad, hi + 1, axis=ax)
            - np.take(s_pad, lo + 1, axis=ax))


def _axis_cover_counts(n, g, p, s):
    """[n] float32 — how many windows cover each voxel along one axis, with
    the reference's count==0 -> 1 guard folded in (visualizations.py:411):
    uncovered voxels hold 0 importance, so dividing by 1 reproduces the
    reference exactly. The 3D count map is the outer product of the per-axis
    counts — it is never materialized (a broadcast divide per axis replaces
    the reference's full-volume count tensor)."""
    import numpy as np
    c = _expand_axis(np.ones((g,), np.float32), 0, n, p, s)
    c[c == 0] = 1.0
    return c


def _window_sum_to_voxels(values, grid_shape, vol_shape, patch, stride):
    """Host-side scatter-add of per-window values into voxel space (the
    reference accumulation, visualizations.py:391-392). Separable: the
    window sum factorizes per axis (three cumsum-difference expansions,
    `_expand_axis`), fp32 throughout. Kept on host — on TPU a [D, H, W, 1]-
    channel layout pads the singleton to 128 lanes (a 28 GB buffer for the
    flagship volume)."""
    import numpy as np
    out = np.asarray(values, np.float32).reshape(grid_shape)
    for ax in range(3):
        out = _expand_axis(out, ax, vol_shape[ax], patch[ax], stride[ax])
    return out


def _divide_axis_counts(heat, grid_shape, vol_shape, patch, stride):
    """In-place heat /= count using the separable per-axis coverage counts
    (see _axis_cover_counts) — replaces the reference's materialized
    [D, H, W] count tensor with three broadcast divides."""
    for ax in range(3):
        c = _axis_cover_counts(vol_shape[ax], grid_shape[ax],
                               patch[ax], stride[ax])
        shape = [1, 1, 1]
        shape[ax] = vol_shape[ax]
        heat /= c.reshape(shape)


def occlusion_scores_slabbed(params, cfg: CTCLIPConfig, image: Array,
                             text_latents: Array, coords: Array, *,
                             occ: OcclusionConfig = OcclusionConfig(),
                             chunk: int = 8, slab: int = 2048):
    """occlusion_scores_multi in host-level slabs of `slab` windows.

    A full flagship sweep (12,167 windows at ~8 ms/window) is a ~100 s
    SINGLE device execution when dispatched as one call — long enough to
    trip execution watchdogs on relay-attached TPUs (observed as a worker
    crash mid-sweep). Slabs keep each dispatch ~15-20 s with identical
    numbers: the slab tail is padded with no-op (0,0,0) windows (every
    window runs the same chunked program, so padding changes nothing), and
    each slab re-derives the clean-cache prefix (~one dense forward,
    amortized to noise over 2048 windows). Returns (originals [K],
    scores [N, K]) like occlusion_scores_multi."""
    import numpy as np
    n = coords.shape[0]
    if n <= slab:
        return occlusion_scores_multi(params, cfg, image, text_latents,
                                      coords, occ=occ, chunk=chunk)
    # dispatch every slab before fetching any (JAX dispatch is async; the
    # device queue serializes the sweeps) so each slab's device->host score
    # fetch overlaps the next slab's compute instead of stalling it
    pending = []
    for lo in range(0, n, slab):
        part = coords[lo:lo + slab]
        pad = slab - part.shape[0]
        if pad:
            part = jnp.concatenate(
                [part, jnp.zeros((pad, 3), part.dtype)], axis=0)
        o, s = occlusion_scores_multi(params, cfg, image, text_latents,
                                      part, occ=occ, chunk=chunk)
        pending.append((o, s, pad))
    originals = np.asarray(pending[0][0], np.float64)
    parts = [np.asarray(s, np.float64)[:slab - pad] for _, s, pad in pending]
    return originals, np.concatenate(parts, axis=0)


def occlusion_heatmap(params, cfg: CTCLIPConfig, image: Array,
                      text_latent: Array, *,
                      occ: OcclusionConfig = OcclusionConfig(),
                      chunk: int = 8, mesh=None):
    """[D, H, W] numpy heatmap (pre-rot90): importance = relu(orig - occluded)
    accumulated over windows, count-normalized, min-max scaled, thresholded
    (reference visualizations.py:379-424). Scores run on device; assembly is
    a cheap host op. With `mesh` (data axis > 1, possibly process-spanning),
    the window sweep shards over the mesh — the reference's per-rank
    chunking + SUM reduce (visualizations.py:351-361, 407-409)."""
    import numpy as np
    D, H, W = image.shape[-3:]
    coords = window_grid((D, H, W), occ.patch_size, occ.stride)
    grid_shape = tuple(
        (dim - p) // s + 1
        for dim, p, s in zip((D, H, W), occ.patch_size, occ.stride))

    if mesh is not None and mesh.shape.get("data", 1) > 1:
        originals, scores = occlusion_scores_multi_sharded(
            params, cfg, image, text_latent[None], coords, mesh, occ=occ,
            chunk=chunk)
    else:
        originals, scores = occlusion_scores_slabbed(
            params, cfg, image, text_latent[None], coords, occ=occ,
            chunk=chunk)
    importance = np.maximum(float(np.asarray(originals).ravel()[0])
                            - np.asarray(scores, np.float64)[:, 0], 0.0)

    heat = _window_sum_to_voxels(importance, grid_shape, (D, H, W),
                                 occ.patch_size, occ.stride)
    _divide_axis_counts(heat, grid_shape, (D, H, W), occ.patch_size,
                        occ.stride)
    heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-8)
    # the reference then trilinear-resizes to the SAME shape — identity up to
    # interpolation (visualizations.py:416-420); skipped as a no-op
    heat[heat < occ.threshold] = 0.0
    return heat.astype(np.float32)


@partial(jax.jit, static_argnames=("cfg", "occ", "chunk",
                                   "token_shortcut", "frame_sparse"))
def occlusion_scores_multi(params, cfg: CTCLIPConfig, image: Array,
                           text_latents: Array, coords: Array, *,
                           occ: OcclusionConfig = OcclusionConfig(),
                           chunk: int = 8,
                           token_shortcut: bool = True,
                           frame_sparse: bool = True
                           ) -> Tuple[Array, Array]:
    """Multi-pathology sweep: (original_scores [K], scores [N, K]).

    The per-window image latent does not depend on the text, so ONE masked
    forward scores every pathology at once. The reference's text-embeds mode
    re-runs the full 12,167-forward sweep per positive pathology
    (visualizations.py:1037-1044) — this is K x cheaper with identical
    numbers. token_shortcut: see occlusion_scores."""
    if not token_shortcut:
        from .capture import parity_cfg
        cfg = parity_cfg(cfg)
        chunk = min(chunk, 2)
    scores = _sweep_scores(params, cfg, image, text_latents, coords,
                           occ, chunk, token_shortcut, frame_sparse)
    return scores[0], scores[1:]


def occlusion_heatmaps_multi(params, cfg: CTCLIPConfig, image: Array,
                             text_latents: Array, *,
                             occ: OcclusionConfig = OcclusionConfig(),
                             chunk: int = 8, mesh=None):
    """K [D, H, W] numpy heatmaps from ONE window sweep (see
    occlusion_scores_multi). `mesh` shards the sweep's window axis (see
    occlusion_heatmap)."""
    import numpy as np
    D, H, W = image.shape[-3:]
    coords = window_grid((D, H, W), occ.patch_size, occ.stride)
    grid_shape = tuple((dim - p) // s + 1
                       for dim, p, s in zip((D, H, W), occ.patch_size,
                                            occ.stride))
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        originals, scores = occlusion_scores_multi_sharded(
            params, cfg, image, text_latents, coords, mesh, occ=occ,
            chunk=chunk)
    else:
        originals, scores = occlusion_scores_slabbed(
            params, cfg, image, text_latents, coords, occ=occ, chunk=chunk)
    originals = np.asarray(originals, np.float64)        # [K]
    scores = np.asarray(scores, np.float64)              # [N, K]

    heatmaps = []
    for k in range(scores.shape[1]):
        importance = np.maximum(originals[k] - scores[:, k], 0.0)
        heat = _window_sum_to_voxels(importance, grid_shape, (D, H, W),
                                     occ.patch_size, occ.stride)
        _divide_axis_counts(heat, grid_shape, (D, H, W), occ.patch_size,
                            occ.stride)
        heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-8)
        heat[heat < occ.threshold] = 0.0
        heatmaps.append(heat.astype(np.float32))
    return heatmaps


def occlusion_scores_sharded(params, cfg: CTCLIPConfig, image: Array,
                             text_latent: Array, coords: Array, mesh, *,
                             occ: OcclusionConfig = OcclusionConfig(),
                             chunk: int = 8):
    """Multi-chip occlusion: shard the window axis over the mesh "data" axis
    (the reference's contiguous per-rank chunking + SUM reduce,
    visualizations.py:351-361,407-409) and run per-device chunked masked
    forwards under shard_map; results all-gather back.

    Returns (original_score, scores [N]) like occlusion_scores. `coords`
    must have length divisible by the data-axis size (pad with window (0,0,0)
    duplicates and slice, like the reference trims extras)."""
    originals, scores = occlusion_scores_multi_sharded(
        params, cfg, image, text_latent[None], coords, mesh,
        occ=occ, chunk=chunk)
    return originals.ravel()[0], scores[:, 0]


def occlusion_scores_multi_sharded(params, cfg: CTCLIPConfig, image: Array,
                                   text_latents: Array, coords: Array,
                                   mesh, *,
                                   occ: OcclusionConfig = OcclusionConfig(),
                                   chunk: int = 8, slab: int = 2048):
    """Window-sharded multi-pathology sweep: the mesh "data" axis splits the
    window list AND one sweep scores every pathology (occlusion_scores_multi)
    — the two orthogonal speedups over the reference composed. Returns
    (original_scores [K], scores [N, K]).

    Dispatched in host-level slabs of `slab` windows PER DEVICE (the same
    watchdog bound as occlusion_scores_slabbed: a full flagship sweep as
    one device execution runs long enough to trip relay execution
    watchdogs); slabs are dispatched back-to-back before any fetch, so the
    device queue stays full."""
    import numpy as np

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]
    n = coords.shape[0]
    per_dispatch = slab * n_data

    def per_device(image, text_latents, my_coords):
        originals, scores = occlusion_scores_multi(
            params, cfg, image, text_latents, my_coords, occ=occ, chunk=chunk)
        return originals, jax.lax.all_gather(scores, "data", axis=0,
                                             tiled=True)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(), P(), P("data")),
                   out_specs=(P(), P()),
                   check_vma=False)

    pending = []
    for lo in range(0, n, per_dispatch):
        part = coords[lo:lo + per_dispatch]
        # tail slab pads only to the next n_data multiple (one extra compile
        # for the tail shape) — padding to a full per_dispatch would score up
        # to slab*n_data-1 dummy (0,0,0) windows when the tail is small
        pad = (-part.shape[0]) % n_data
        if pad:
            part = jnp.concatenate(
                [part, jnp.zeros((pad, 3), part.dtype)], axis=0)
        originals, scores = fn(image, text_latents, part)
        pending.append((originals, scores, pad))
    if len(pending) == 1:
        originals, scores, pad = pending[0]
        return originals, scores[:n]
    originals = pending[0][0]
    parts = [np.asarray(s, np.float64)[:s.shape[0] - pad] if pad else
             np.asarray(s, np.float64) for _, s, pad in pending]
    return originals, np.concatenate(parts, axis=0)[:n]


def report_text_latent(params, cfg: CTCLIPConfig, text_tokens) -> Array:
    """[dim_latent] latent of a tokenized report/prompt."""
    return encode_text_latents(params, cfg, text_tokens)[0]


def diff_embedding_latent(params, cfg: CTCLIPConfig, diff_embed: Array) -> Array:
    """[dim_latent] latent from a precomputed 768-d pathology diff embedding
    (the text_embeds bypass, reference ctclip.py:107, visualizations.py:1030-1043)."""
    return l2norm(linear(params["to_text_latent"], diff_embed[None]))[0]

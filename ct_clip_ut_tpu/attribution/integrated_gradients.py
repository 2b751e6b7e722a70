"""Integrated Gradients over the CT volume.

Reference: src/utils/visualizations.py:851-910. Baseline = all-ones volume,
50 interpolation steps from baseline to input, gradient of the per-sample
similarity score at each step, IG = relu(diff * avg_grads), shift-max
normalize, keep the top decile, contrast-amplify with **0.05, renormalize.

TPU re-design: the reference loops 50 sequential full backward passes with
empty_cache between them (visualizations.py:861-876); here the alpha axis is
data — `lax.map` over chunked vmapped VJPs, one compiled program, no host
round-trips. fp32 throughout.

The whole computation runs in PATCH SPACE: `patchify` is a bijective pixel
permutation, so grad-w.r.t.-patches is exactly the permutation of
grad-w.r.t.-image, elementwise ops (diff * grads, relu, **0.05, threshold)
commute with it, and the global statistics (min, max, quantile) are
permutation-invariant. Differentiating w.r.t. the patch tensor keeps the
patchify VJP — a ~400 ms/step tile-padded 9-d transpose at flagship shapes —
out of the loop entirely; the single inverse permutation happens once on the
host (ctvit.unpatchify_np) on the finished [D, H, W] map.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from ..models.ctvit import patchify, unpatchify_np
from .capture import similarity_score

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg", "steps", "chunk", "k"))
def _ig_patch_space(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                    text_embeds: Optional[Array], baseline_value: float,
                    steps: int, chunk: int, quantile: float,
                    contrast: float, k: int):
    """IG saliency in patch space, returned SPARSE as (values f16 [k],
    flat indices int32 [k]) of the k largest entries. The q90 threshold
    zeroes >=90% of the map by construction (reference
    visualizations.py:882-886), so shipping only the surviving top decile
    (+2% tie slack) cuts the device->host fetch from the dense ~110 MB f16
    map to ~34 MB — the fetch, not the compute, dominated IG wall time on
    relay-attached chips. Densification happens on host in
    `integrated_gradients`."""
    image = image.astype(jnp.float32)
    patches = patchify(image, cfg.ctvit.patch_size,
                       cfg.ctvit.temporal_patch_size)
    # patchify(const) == const, so the all-ones baseline is exact in patch space
    baseline = jnp.full_like(patches, baseline_value)
    diff = patches - baseline
    alphas = jnp.linspace(0.0, 1.0, steps)

    def score(p):
        s, _ = similarity_score(params, cfg, text_tokens, p,
                                text_embeds=text_embeds, prepatchified=True)
        return s

    grad_fn = jax.grad(score)

    # running-sum accumulation: stacking all `steps` full-volume gradients
    # would be steps * 221 MB fp32 (11 GB at flagship scale)
    pad = (-steps) % chunk
    alphas_p = jnp.pad(alphas, (0, pad)).reshape(-1, chunk)
    weights_p = jnp.pad(jnp.ones((steps,)), (0, pad)).reshape(-1, chunk)

    def step(acc, xs):
        alpha_chunk, w_chunk = xs
        g = jax.vmap(lambda a: grad_fn(baseline + a * diff))(alpha_chunk)
        return acc + jnp.tensordot(w_chunk, g, axes=1), None

    sum_grads, _ = jax.lax.scan(step, jnp.zeros_like(patches),
                                (alphas_p, weights_p))
    avg_grads = sum_grads / steps

    ig = jax.nn.relu((diff * avg_grads)[0])        # [t, h, w, patch_dim]

    # normalization exactly as written in the reference (shift by min,
    # divide by the PRE-shift max, visualizations.py:882)
    ig = (ig - ig.min()) / (ig.max() + 1e-8)

    q = jnp.quantile(ig, quantile)
    ig = jnp.where(ig >= q, ig, 0.0)
    ig = ig ** contrast                            # 0**0.05 == 0
    ig = ig / (ig.max() + 1e-8)
    # transport: top-k sparse, f16 values (the finished map is normalized to
    # [0, 1], where f16 rounds at <= 2^-11 (~4.9e-4) — inside the <=1e-3
    # saliency parity budget). All MATH above stays fp32.
    vals, idx = jax.lax.top_k(ig.ravel(), k)
    return vals.astype(jnp.float16), idx.astype(jnp.int32)


def integrated_gradients(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                         *, text_embeds: Optional[Array] = None,
                         baseline_value: float = 1.0, steps: int = 50,
                         chunk: int = 5,
                         quantile: float = 0.90,
                         contrast: float = 0.05):
    """[D, H, W] numpy IG saliency (pre-rot90), batch-1 image [1, 1, D, H, W]."""
    import numpy as np
    _, _, D, H, W = image.shape
    t = D // cfg.ctvit.temporal_patch_size
    h = H // cfg.ctvit.patch_size
    w = W // cfg.ctvit.patch_size
    patch_dim = (cfg.ctvit.temporal_patch_size * cfg.ctvit.patch_size
                 * cfg.ctvit.patch_size)
    n = t * h * w * patch_dim
    # top decile survives the threshold; +2% slack absorbs quantile ties
    k = min(n, int(n * (1.0 - quantile) * 1.02) + 16)
    vals, idx = _ig_patch_space(params, cfg, text_tokens, image,
                                text_embeds, baseline_value, steps,
                                chunk, quantile, contrast, k)
    dense = np.zeros((n,), np.float32)
    dense[np.asarray(idx)] = np.asarray(vals, np.float32)
    return unpatchify_np(dense.reshape(t, h, w, patch_dim),
                         cfg.ctvit.patch_size, cfg.ctvit.temporal_patch_size)

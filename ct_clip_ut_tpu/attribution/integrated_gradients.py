"""Integrated Gradients over the CT volume.

Reference: src/utils/visualizations.py:851-910. Baseline = all-ones volume,
50 interpolation steps from baseline to input, gradient of the per-sample
similarity score at each step, IG = relu(diff * avg_grads), shift-max
normalize, keep the top decile, contrast-amplify with **0.05, renormalize.

TPU re-design: the reference loops 50 sequential full backward passes with
empty_cache between them (visualizations.py:861-876); here the alpha axis is
data — `lax.map` over chunked vmapped VJPs, one compiled program, no host
round-trips. fp32 throughout.

chunk=1 default at flagship scale: the bit-stable patch-embed's backward
materializes a tile-padded 9-d patchify cotangent (~1.6 GB per lane on a
240x480x480 volume), so wider chunks trade HBM for little gain.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CTCLIPConfig
from .capture import similarity_score

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg", "steps", "chunk"))
def integrated_gradients(params, cfg: CTCLIPConfig, text_tokens, image: Array,
                         *, text_embeds: Optional[Array] = None,
                         baseline_value: float = 1.0, steps: int = 50,
                         chunk: int = 1,
                         quantile: float = 0.90,
                         contrast: float = 0.05) -> Array:
    """[D, H, W] IG saliency (pre-rot90), batch-1 image [1, 1, D, H, W]."""
    image = image.astype(jnp.float32)
    baseline = jnp.full_like(image, baseline_value)
    diff = image - baseline
    alphas = jnp.linspace(0.0, 1.0, steps)

    def score(img):
        s, _ = similarity_score(params, cfg, text_tokens, img,
                                text_embeds=text_embeds)
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

    sum_grads, _ = jax.lax.scan(step, jnp.zeros_like(image),
                                (alphas_p, weights_p))
    avg_grads = sum_grads / steps

    ig = jax.nn.relu((diff * avg_grads)[0, 0])    # [D, H, W]

    # normalization exactly as written in the reference (shift by min,
    # divide by the PRE-shift max, visualizations.py:882)
    ig = (ig - ig.min()) / (ig.max() + 1e-8)

    q = jnp.quantile(ig, quantile)
    ig = jnp.where(ig >= q, ig, 0.0)
    ig = ig ** contrast                            # 0**0.05 == 0
    ig = ig / (ig.max() + 1e-8)
    return ig

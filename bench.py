"""Headline benchmark: zero-shot CT classification throughput per chip.

Prints ONE JSON line:
  {"metric": "zeroshot_volumes_per_sec_per_chip", "value": N,
   "unit": "volumes/s", "vs_baseline": R}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
measured, not quoted: R = (our batched zero-shot path) / (the reference's
*algorithm* run on the same chip). The reference algorithm re-encodes the
full visual tower once per pathology at batch 1 (18 visual forwards + 18
prompt-pair text forwards per scan, reference CTClipInference.py:153-178);
ours hoists the image latent out of the pathology loop, precomputes all 36
prompt latents once per checkpoint, and batches scans. Both paths produce
identical scores (tests/test_train_infer.py::test_zeroshot_hoisting_is_scoring_exact).

Flagship model config: reference train_ctclip.py:19-37 (CT-ViT dim 512,
4+4 layers, 13,824 tokens per 480x480x240 volume; CXR-BERT text tower).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from ct_clip_ut_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_ut_tpu.infer.zeroshot import zeroshot_probs
from ct_clip_ut_tpu.models.ctclip import (ctclip_apply, encode_text_latents,
                                          init_ctclip)

import os

N_PATHOLOGIES = 18
BATCH = int(os.environ.get("CTCLIP_BENCH_BATCH", "16"))
STEPS = int(os.environ.get("CTCLIP_BENCH_STEPS", "3"))
REF_SCANS = 1  # scans to time for the (slow) reference algorithm


def flagship_cfg() -> CTCLIPConfig:
    return CTCLIPConfig(
        dim_text=768, dim_image=294912, dim_latent=512,
        ctvit=CTViTConfig(dim=512, codebook_size=8192, image_size=480,
                          patch_size=20, temporal_patch_size=10,
                          spatial_depth=4, temporal_depth=4,
                          dim_head=32, heads=8),
        bert=BertConfig())


def main() -> None:
    cfg = flagship_cfg()
    key = jax.random.PRNGKey(0)
    params = init_ctclip(key, cfg)
    params = jax.device_put(params)

    image = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 1, 240, 480, 480), jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(2),
                             (2 * N_PATHOLOGIES, 24), 0, cfg.bert.vocab_size)
    prompt_tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    # ---- ours: batched, hoisted, prompts precomputed --------------------
    prompt_latents = jax.jit(
        lambda p, t: encode_text_latents(p, cfg, t))(params, prompt_tokens)
    jax.block_until_ready(prompt_latents)

    import numpy as np
    # NOTE: on the axon relay platform block_until_ready returns early, so
    # every timed call forces a device->host fetch of the (tiny) result.
    run = lambda: np.asarray(zeroshot_probs(params, cfg, image, prompt_latents))
    run()  # compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        run()
    ours_vps = BATCH * STEPS / (time.perf_counter() - t0)

    # ---- reference algorithm on the same chip ----------------------------
    one_image = image[:1]

    @jax.jit
    def ref_one_pathology(params, pair_tokens, image):
        out = ctclip_apply(params, cfg, pair_tokens, image)
        sim = (out.image_latents.astype(jnp.float32)
               @ out.text_latents.astype(jnp.float32).T) * out.temperature
        pair = jnp.stack([sim[0, 0], sim[0, 1]])
        return jax.nn.softmax(pair)[0]

    pair0 = {k: v[:2] for k, v in prompt_tokens.items()}
    np.asarray(ref_one_pathology(params, pair0, one_image))  # compile
    t0 = time.perf_counter()
    for _ in range(REF_SCANS):
        for j in range(N_PATHOLOGIES):
            pair = {k: v[2 * j:2 * j + 2] for k, v in prompt_tokens.items()}
            np.asarray(ref_one_pathology(params, pair, one_image))
    ref_vps = REF_SCANS / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "zeroshot_volumes_per_sec_per_chip",
        "value": round(ours_vps, 3),
        "unit": "volumes/s",
        "vs_baseline": round(ours_vps / ref_vps, 2),
    }))


if __name__ == "__main__":
    main()

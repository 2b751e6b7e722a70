"""Headline benchmark: zero-shot CT classification throughput per chip,
plus attribution-map throughput (rollout / IG / occlusion — the second half
of BASELINE.json's primary metric).

Prints ONE JSON line:
  {"metric": "zeroshot_volumes_per_sec_per_chip", "value": N,
   "unit": "volumes/s", "vs_baseline": R, "extra": {...attribution numbers}}

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
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: flagship programs take minutes through the
# remote-compile relay; cache them across bench invocations
try:
    cache_dir = os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from ct_clip_ut_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_ut_tpu.infer.zeroshot import zeroshot_probs
from ct_clip_ut_tpu.models.ctclip import (ctclip_apply, encode_text_latents,
                                          init_ctclip)

N_PATHOLOGIES = 18
BATCH = int(os.environ.get("CTCLIP_BENCH_BATCH", "16"))
STEPS = int(os.environ.get("CTCLIP_BENCH_STEPS", "10"))
REF_SCANS = int(os.environ.get("CTCLIP_BENCH_REF_SCANS", "3"))
WITH_ATTRIBUTION = os.environ.get("CTCLIP_BENCH_ATTRIBUTION", "1") != "0"
IG_STEPS = int(os.environ.get("CTCLIP_BENCH_IG_STEPS", "50"))
OCC_WINDOWS = int(os.environ.get("CTCLIP_BENCH_OCC_WINDOWS", "256"))


def flagship_cfg() -> CTCLIPConfig:
    return CTCLIPConfig(
        dim_text=768, dim_image=294912, dim_latent=512,
        ctvit=CTViTConfig(dim=512, codebook_size=8192, image_size=480,
                          patch_size=20, temporal_patch_size=10,
                          spatial_depth=4, temporal_depth=4,
                          dim_head=32, heads=8),
        bert=BertConfig())


def bench_attribution(params, cfg, image16, prompt_tokens) -> dict:
    """Attribution throughput at flagship shapes (batch-1 scans, like the
    reference suite drives them, visualizations.py:1111-1184)."""
    import numpy as np

    from ct_clip_ut_tpu.attribution import occlusion as occ_mod
    from ct_clip_ut_tpu.attribution import rollout as ro
    from ct_clip_ut_tpu.attribution.integrated_gradients import \
        integrated_gradients
    from ct_clip_ut_tpu.config import OcclusionConfig

    image = image16[:1].astype(jnp.float32)
    tokens = {k: v[:2] for k, v in prompt_tokens.items()}
    one_tok = {k: v[:1] for k, v in tokens.items()}
    out = {}

    # rollout (one spatial + one temporal map per scan)
    def run_rollout():
        sp, tm = ro.rollout_maps(params, cfg, one_tok, image)
        return float(np.asarray(sp).ravel()[0]) + float(np.asarray(tm).ravel()[0])

    run_rollout()  # compile
    times = [0.0] * 3
    for i in range(3):
        t0 = time.perf_counter()
        run_rollout()
        times[i] = time.perf_counter() - t0
    out["rollout_maps_per_sec"] = round(1.0 / min(times), 3)

    # integrated gradients (50 steps, reference visualizations.py:851-910).
    # min-of-2: the first post-compile call can overlap persistent-cache
    # serialization / relay warm-up and read several x slow
    integrated_gradients(params, cfg, one_tok, image, steps=IG_STEPS)  # compile
    ig_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        integrated_gradients(params, cfg, one_tok, image, steps=IG_STEPS)
        ig_s = min(ig_s, time.perf_counter() - t0)
    out[f"ig{IG_STEPS}_seconds_per_map"] = round(ig_s, 2)

    # occlusion: time OCC_WINDOWS windows of the 23^3 flagship sweep with the
    # token-level masking shortcut, extrapolate to the full map
    occ = OcclusionConfig()
    coords_full = occ_mod.window_grid(image.shape[-3:], occ.patch_size,
                                      occ.stride)
    n_full = coords_full.shape[0]
    chunk = 16
    coords = coords_full[:OCC_WINDOWS]
    txt = jnp.zeros((cfg.dim_latent,), jnp.float32).at[0].set(1.0)

    occ_mod.occlusion_scores(params, cfg, image, txt, coords, occ=occ,
                             chunk=chunk)  # compile
    occ_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, scores = occ_mod.occlusion_scores(params, cfg, image, txt, coords,
                                             occ=occ, chunk=chunk)
        np.asarray(scores)
        occ_s = min(occ_s, time.perf_counter() - t0)
    wps = OCC_WINDOWS / occ_s
    out["occlusion_windows_per_sec"] = round(wps, 1)
    out["occlusion_seconds_per_map"] = round(n_full / wps, 1)
    return out


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
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    # min-of-N: the relay adds several-ms jitter per call
    ours_vps = BATCH / min(times)

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
    ref_times = []
    for _ in range(REF_SCANS):
        t0 = time.perf_counter()
        for j in range(N_PATHOLOGIES):
            pair = {k: v[2 * j:2 * j + 2] for k, v in prompt_tokens.items()}
            np.asarray(ref_one_pathology(params, pair, one_image))
        ref_times.append(time.perf_counter() - t0)
    ref_vps = 1.0 / min(ref_times)

    extra = {"ref_algorithm_vps": round(ref_vps, 3),
             "zeroshot_batch": BATCH, "timed_steps": STEPS}

    # MFU from XLA's own flop count of the compiled zero-shot program
    # (v5e bf16 matmul peak: 197 TFLOP/s)
    try:
        lowered = zeroshot_probs.lower(params, cfg, image, prompt_latents)
        flops = lowered.compile().cost_analysis()["flops"]
        extra["fwd_tflop_per_volume"] = round(flops / BATCH / 1e12, 3)
        extra["mfu_pct"] = round(100 * flops / BATCH * ours_vps / 197e12, 1)
    except Exception:
        pass
    if WITH_ATTRIBUTION:
        extra.update(bench_attribution(params, cfg, image, prompt_tokens))

    print(json.dumps({
        "metric": "zeroshot_volumes_per_sec_per_chip",
        "value": round(ours_vps, 3),
        "unit": "volumes/s",
        "vs_baseline": round(ours_vps / ref_vps, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()

"""Component-level timing of the flagship zero-shot forward on the real chip.

Times each stage of the CT-ViT/CTCLIP forward at flagship shapes
(B=16, 480x480x240 volumes) with the relay-safe scalar-fetch pattern
(see .claude/skills/verify/SKILL.md: block_until_ready returns early
through the axon relay, so every timed call fetches a reduced scalar).

Usage: python tools/profile_fwd.py  [component names...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flagship_cfg  # noqa: E402
from ct_clip_ut_tpu.models.ctclip import init_ctclip, encode_text_latents  # noqa: E402
from ct_clip_ut_tpu.models import ctvit as ctvit_mod  # noqa: E402
from ct_clip_ut_tpu.ops import transformer as tr_mod  # noqa: E402
from ct_clip_ut_tpu.ops.layers import feedforward, peg  # noqa: E402
from ct_clip_ut_tpu.ops.attention import attention  # noqa: E402
from ct_clip_ut_tpu.ops.vq import vq_apply  # noqa: E402
from ct_clip_ut_tpu.infer.zeroshot import zeroshot_probs  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "16"))
STEPS = int(os.environ.get("PROF_STEPS", "5"))


def timeit(name, fn, *args, flops=None):
    """fn must return a scalar-reducible array; we fetch float(sum)."""
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(np.asarray(jfn(*args)))  # compile + run
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)))
        times.append(time.perf_counter() - t0)
    dt = min(times)  # relay adds several-ms jitter; min is the clean signal
    eff = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:34s} {dt * 1e3:9.2f} ms{eff}   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    only = set(sys.argv[1:])

    def want(n):
        return not only or n in only

    cfg = flagship_cfg()
    vcfg = cfg.ctvit
    params = jax.device_put(init_ctclip(jax.random.PRNGKey(0), cfg))
    vparams = params["visual_transformer"]

    key = jax.random.PRNGKey(1)
    image = jax.random.normal(key, (B, 1, 240, 480, 480), jnp.bfloat16)
    # spatial stream: (b*t, h*w, d); temporal stream: (b*h*w, t, d)
    xs = jax.random.normal(key, (B * 24, 576, 512), jnp.bfloat16)
    xt = jax.random.normal(key, (B * 576, 24, 512), jnp.bfloat16)
    tokens = jax.random.normal(key, (B, 24, 24, 24, 512), jnp.bfloat16)
    video_shape = (B, 24, 24, 24)

    ids = jax.random.randint(jax.random.PRNGKey(2), (36, 24), 0,
                             cfg.bert.vocab_size)
    prompts = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    scfg = vcfg.spatial_transformer()
    sp_layer0 = vparams["spatial"]["layers"][0]

    # FLOP counts (MACs*2) at flagship
    n_tok = 576
    d, inner, ffi = 512, 256, 2048
    attn_flops = B * 24 * 2 * (3 * n_tok * d * inner // 8 * 8  # qkv (inner total)
                               + 2 * n_tok * n_tok * inner
                               + n_tok * inner * d)
    attn_flops = B * 24 * 2 * (n_tok * d * inner * 3
                               + 2 * n_tok * n_tok * inner + n_tok * inner * d)
    ff_flops = B * 24 * 2 * (n_tok * d * ffi * 2 + n_tok * ffi * d)
    patch_flops = B * 2 * (24 * 24 * 24) * (20 * 20 * 10) * 512
    vq_flops = B * 2 * 13824 * 512 * 8192
    proj_flops = B * 2 * 294912 * 512

    if want("zeroshot"):
        pl = jax.jit(lambda p, t: encode_text_latents(p, cfg, t))(params, prompts)
        jax.block_until_ready(pl)
        timeit("FULL zeroshot_probs", lambda p, im: zeroshot_probs(p, cfg, im, pl),
               params, image,
               flops=patch_flops + 4 * (attn_flops + ff_flops)
               + 4 * (attn_flops + ff_flops) * 24 // 576 + vq_flops + proj_flops)
    if want("patch_embed"):
        timeit("patch_embed_conv", lambda p, im: ctvit_mod._patch_embed_conv(
            p, im, vcfg.patch_size, vcfg.temporal_patch_size),
            vparams["to_patch_emb"], image, flops=patch_flops)
    if want("spatial4"):
        from ct_clip_ut_tpu.ops.posbias import continuous_pos_bias
        bias = continuous_pos_bias(vparams["spatial_rel_pos_bias"], 24, 24)
        timeit("spatial transformer (4 layers)",
               lambda p, x: tr_mod.transformer(
                   p, scfg, x, video_shape=video_shape, attn_bias=bias,
                   return_weights=False)[0],
               vparams["spatial"], xs, flops=4 * (attn_flops + ff_flops))
    if want("attn1"):
        from ct_clip_ut_tpu.ops.posbias import continuous_pos_bias
        bias = continuous_pos_bias(vparams["spatial_rel_pos_bias"], 24, 24)
        timeit("1 spatial attention (pallas blk)",
               lambda p, x: attention(p, scfg.self_attn(), x, attn_bias=bias,
                                      return_weights=False)[0],
               sp_layer0["self_attn"], xs, flops=attn_flops)
        timeit("1 spatial attention (XLA)",
               lambda p, x: attention(p, scfg.self_attn(), x, attn_bias=bias,
                                      return_weights=False, use_pallas=False)[0],
               sp_layer0["self_attn"], xs, flops=attn_flops)
    if want("ff1"):
        timeit("1 spatial FF (pallas)",
               lambda p, x: feedforward(p, x), sp_layer0["ff"], xs,
               flops=ff_flops)
        timeit("1 spatial FF (XLA)",
               lambda p, x: feedforward(p, x, use_pallas=False),
               sp_layer0["ff"], xs, flops=ff_flops)
    if want("peg1"):
        timeit("1 spatial PEG",
               lambda p, x: peg(p, x, video_shape, causal=False),
               sp_layer0["peg"], xs)
    if want("temporal4"):
        tcfg = vcfg.temporal_transformer()
        timeit("temporal transformer (4 layers)",
               lambda p, x: tr_mod.transformer(
                   p, tcfg, x, video_shape=video_shape,
                   return_weights=False)[0],
               vparams["temporal"], xt,
               flops=4 * (attn_flops + ff_flops) * 24 // 576)
    if want("vq"):
        timeit("VQ (argmax over 8192)",
               lambda p, t: vq_apply(p, t.reshape(B, 13824, 512))[0],
               vparams["vq"], tokens, flops=vq_flops)
    if want("visproj"):
        timeit("visual projection",
               lambda p, t: (t.mean(axis=1).reshape(B, -1)
                             @ p["to_visual_latent"]["w"].astype(t.dtype)),
               params, tokens, flops=proj_flops)
    if want("bert"):
        timeit("BERT 36 prompts",
               lambda p, t: encode_text_latents(p, cfg, t), params, prompts)


if __name__ == "__main__":
    main()

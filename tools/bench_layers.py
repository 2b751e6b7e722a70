"""Accurate per-component costs via k-fold chained application.

The axon relay adds ~10-30 ms of per-call latency, so single-call timings
(tools/profile_fwd.py) over-report small components. Here each component is
applied k times in a dependency chain inside ONE jit; cost = (t_k2 - t_k1)
/ (k2 - k1), which cancels both dispatch overhead and input staging.

Usage: python tools/bench_layers.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache — flagship chains take minutes through the relay
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import flagship_cfg  # noqa: E402
from ct_clip_ut_tpu.models.ctclip import init_ctclip  # noqa: E402
from ct_clip_ut_tpu.ops.attention import attention  # noqa: E402
from ct_clip_ut_tpu.ops.layers import feedforward, peg  # noqa: E402
from ct_clip_ut_tpu.ops.vq import vq_lookup  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "16"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def timed(jfn, *args):
    float(np.asarray(jfn(*args)))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def kfold(name, fn, x, *rest, flops=None, k1=1, k2=5):
    """fn(x, *rest) -> same-shape-as-x; chain k applications."""

    def chain(k):
        def run(x, *rest):
            for _ in range(k):
                x = fn(x, *rest)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(run)

    t1 = timed(chain(k1), x, *rest)
    t2 = timed(chain(k2), x, *rest)
    dt = (t2 - t1) / (k2 - k1)
    eff = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:40s} {dt * 1e3:8.2f} ms{eff}", flush=True)
    return dt


def main():
    only = set(sys.argv[1:])

    def want(n):
        return not only or any(o in n for o in only)

    cfg = flagship_cfg()
    vcfg = cfg.ctvit
    params = init_ctclip(jax.random.PRNGKey(0), cfg)
    vt = params["visual_transformer"]
    layer_sp = vt["spatial"]["layers"][0]
    layer_tm = vt["temporal"]["layers"][0]

    t, hp, wp, d = 24, 24, 24, vcfg.dim
    video_shape = (B, t, hp, wp)
    rows = B * t * hp * wp

    xs = jax.random.normal(jax.random.PRNGKey(1), (B * t, hp * wp, d),
                           jnp.bfloat16)
    xt = jax.random.normal(jax.random.PRNGKey(2), (B * hp * wp, t, d),
                           jnp.bfloat16)

    scfg = vcfg.spatial_transformer()
    tcfg = vcfg.temporal_transformer()

    if want("peg_spatial"):
        kfold("PEG spatial (b t) 576", lambda x: peg(
            layer_sp["peg"], x, video_shape, causal=scfg.peg_causal) + x, xs,
            flops=rows * d * 27 * 2)
    if want("peg_temporal"):
        kfold("PEG temporal (b h w) 24", lambda x: peg(
            layer_tm["peg"], x, video_shape, causal=tcfg.peg_causal) + x, xt,
            flops=rows * d * 27 * 2)

    from ct_clip_ut_tpu.ops.posbias import continuous_pos_bias
    bias = continuous_pos_bias(vt["spatial_rel_pos_bias"], hp, wp)

    hd = vcfg.heads * vcfg.dim_head
    attn_flops = rows * d * hd * 2 * 4  # qkv + out (hd==256: out is hd*d)

    if want("attn_spatial"):
        kfold("attn spatial 576 (pallas blk)", lambda x: attention(
            layer_sp["self_attn"], scfg.self_attn(), x,
            attn_bias=bias, return_weights=False)[0] + x, xs,
            flops=attn_flops + B * t * vcfg.heads * 576 * 576 * vcfg.dim_head * 2 * 2)
    if want("attn_temporal"):
        kfold("attn temporal 24 (packed)", lambda x: attention(
            layer_tm["self_attn"], tcfg.self_attn(), x,
            return_weights=False)[0] + x, xt,
            flops=attn_flops + rows * 24 * vcfg.dim_head * 2 * 2)

    ff_flops = rows * (d * scfg.ff_inner_dim * 2 + scfg.ff_inner_dim * d) * 2
    if want("ff_spatial"):
        kfold("FF GEGLU (pallas) on 576 layout", lambda x: feedforward(
            layer_sp["ff"], x) + x, xs, flops=ff_flops)
    if want("ff_temporal"):
        kfold("FF GEGLU (pallas) on 24 layout", lambda x: feedforward(
            layer_tm["ff"], x) + x, xt, flops=ff_flops)

    if want("vq"):
        flat = jax.random.normal(jax.random.PRNGKey(3), (B, t * hp * wp, d),
                                 jnp.bfloat16)
        kfold("VQ lookup 13824 tok x 8192", lambda x: x + vq_lookup(
            vt["vq"], x)[0], flat,
            flops=B * t * hp * wp * d * vcfg.codebook_size * 2)

    if want("proj"):
        w = params["to_visual_latent"]["w"]
        img = jax.random.normal(jax.random.PRNGKey(4), (B, 294912), jnp.bfloat16)

        def vproj(x):
            y = x @ w.astype(x.dtype)
            return x + jnp.pad(y, ((0, 0), (0, 294912 - 512)))
        kfold("visual projection 294912->512 (bf16 w)", vproj, img,
              flops=B * 294912 * 512 * 2)

        def vproj32(x):
            y = x.astype(jnp.float32) @ w
            return x + jnp.pad(y, ((0, 0), (0, 294912 - 512))).astype(x.dtype)
        kfold("visual projection 294912->512 (f32 w)", vproj32, img,
              flops=B * 294912 * 512 * 2)


if __name__ == "__main__":
    main()

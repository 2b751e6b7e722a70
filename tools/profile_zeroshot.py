"""Op-level profile of the flagship zero-shot program via jax.profiler +
tensorboard_plugin_profile xplane parsing. One already-cached compile, one
traced run — no k-fold chains (the compile relay serializes big compiles).

Usage: python tools/profile_zeroshot.py [trace_dir]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import flagship_cfg  # noqa: E402
from ct_clip_ut_tpu.infer.zeroshot import zeroshot_probs  # noqa: E402
from ct_clip_ut_tpu.models.ctclip import (encode_text_latents,  # noqa: E402
                                          init_ctclip)

B = int(os.environ.get("PROF_BATCH", "16"))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ctclip_trace"
    cfg = flagship_cfg()
    params = jax.device_put(init_ctclip(jax.random.PRNGKey(0), cfg))
    image = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 240, 480, 480),
                              jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(2), (36, 24), 0,
                             cfg.bert.vocab_size)
    toks = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    lat = jax.jit(lambda p, t: encode_text_latents(p, cfg, t))(params, toks)
    jax.block_until_ready(lat)

    np.asarray(zeroshot_probs(params, cfg, image, lat))  # compile + warm
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            np.asarray(zeroshot_probs(params, cfg, image, lat))

    from xplane import op_summary
    op_summary(trace_dir)


if __name__ == "__main__":
    main()

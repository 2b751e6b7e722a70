"""Op-level profile of one integrated-gradients map at flagship shapes.

Captures a jax.profiler trace around a single `_ig_patch_space` call (the
compute half of `integrated_gradients` — the transport/densify half is
host-side) and prints the device self-time by op kind via tools/xplane.py.

Usage:  python tools/profile_ig.py [chunk] [steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from bench import flagship_cfg
from ct_clip_ut_tpu.attribution.integrated_gradients import _ig_patch_space
from ct_clip_ut_tpu.models.ctclip import init_ctclip
from xplane import op_summary


def main() -> None:
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cfg = flagship_cfg()
    params = jax.device_put(init_ctclip(jax.random.PRNGKey(0), cfg))
    image = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 240, 480, 480),
                              jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 24), 0,
                             cfg.bert.vocab_size)
    toks = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    def run():
        ig = _ig_patch_space(params, cfg, toks, image, None, 1.0, steps,
                             chunk, 0.90, 0.05)
        return float(ig.ravel()[0])

    run()  # compile
    t0 = time.perf_counter()
    run()
    print(f"ig compute (steps={steps} chunk={chunk}): "
          f"{time.perf_counter() - t0:.2f}s")

    trace_dir = os.environ.get("CTCLIP_TRACE_DIR", "/tmp/ig_trace")
    with jax.profiler.trace(trace_dir):
        run()
    op_summary(trace_dir)


if __name__ == "__main__":
    main()

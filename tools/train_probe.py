"""Isolated flagship train-step compile+run probe (suspected backend killer)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from bench import bench_train, flagship_cfg, _probe_chip

_probe_chip(120.0)
print("chip alive; compiling train step...", flush=True)
t0 = time.perf_counter()
out = bench_train(flagship_cfg())
print("train ok in", round(time.perf_counter() - t0, 1), "s:", out, flush=True)

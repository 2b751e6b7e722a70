"""Profiling and step timing.

The reference's only observability is wall-clock prints (SURVEY.md section 5:
epoch timers, occlusion per-patch ETA). Here:
  * `trace(dir)` — context manager around jax.profiler for full XLA traces
    viewable in TensorBoard/Perfetto;
  * `StepTimer` — EMA step timing with device-sync points that force a tiny
    host fetch (on relay-backed platforms block_until_ready can return
    early; fetching a scalar is the only reliable fence — see
    .claude/skills/verify/SKILL.md);
  * `benchmark(fn, *args)` — compile-then-measure helper used by bench.py
    style scripts.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Reliable device fence: fetch one scalar from the first leaf."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler trace context (degrades to a no-op if unsupported)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception as e:  # noqa: BLE001 — profiling must never break runs
        print(f"profiler unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            sync(result)
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else (self.ema * self.avg
                                                + (1 - self.ema) * dt)
        return dt


def benchmark(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Best-of-n seconds per call, with compile warmup and scalar fences."""
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best

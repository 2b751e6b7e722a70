"""Thin wrappers over XLA collectives.

Replaces the reference's raw torch.distributed call sites (SURVEY.md 2.3):
  * GatherWithGrad custom autograd.Function (reference ctclip.py:10-41) —
    `lax.all_gather` is natively differentiable, its transpose
    (psum_scatter) reproduces the rank-slice backward plus the cross-rank
    accumulation DDP supplied;
  * dist.reduce(SUM) for occlusion heatmaps (visualizations.py:407-409) ->
    psum;
  * gather_for_metrics (CTClipTrainer.py:156-162) -> all_gather + host read;
  * dist.broadcast of the shared sample (visualizations.py:296-318) — moot:
    process-0 data loading + device_put with replicated sharding.

These only make sense inside shard_map; jit/GSPMD paths get the same
collectives inserted automatically by the partitioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather(x, axis_name: str, axis: int = 0):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def psum(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str):
    return jax.lax.pmean(x, axis_name)


def axis_index(axis_name: str):
    return jax.lax.axis_index(axis_name)


def shard_diag(sim: jnp.ndarray, axis_name: str, local_batch: int = 1):
    """Per-shard diagonal extraction: each shard reads its own rows of the
    global sim matrix (the reference's `sim[rank, rank]` pattern,
    CTClipInference.py:173-174)."""
    idx = jax.lax.axis_index(axis_name) * local_batch
    rows = jax.lax.dynamic_slice_in_dim(sim, idx, local_batch, axis=0)
    cols = jax.lax.dynamic_slice_in_dim(rows, idx, local_batch, axis=1)
    return jnp.diagonal(cols)

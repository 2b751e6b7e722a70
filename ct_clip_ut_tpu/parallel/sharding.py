"""Sharding rules: how params and batches lay out over the ("data", "model")
mesh.

The reference is data-parallel only (SURVEY.md 2.2); we add tensor
parallelism where the model actually has mass:
  * the 294,912 x 512 visual projection (150M params — by far the largest
    tensor, reference ctclip.py:65) shards its contraction dim;
  * attention QKV/out and GEGLU FF shard the head/hidden dim;
  * BERT vocab embedding and the VQ codebook shard their leading dim.

Everything else (norms, scales, biases of un-sharded outputs) replicates.
Batches shard over "data". Under jit/GSPMD these PartitionSpecs are the whole
story — XLA inserts the all-reduces/all-gathers over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# applied to 2D weight matrices, matched on the name of their parent module
_COL_SHARDED = {"to_q", "to_kv", "proj_in", "q", "k", "v", "ffn_in"}   # (in, out): out dim
_ROW_SHARDED = {"to_out", "proj_out", "attn_out", "ffn_out",           # (in, out): in dim
                "to_visual_latent"}
_LEAD_SHARDED = {"word", "embed", "embed_avg"}                          # (n, d): n dim


def _spec_for(path, leaf) -> P:
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    parent = names[-2] if len(names) >= 2 else ""
    name = names[-1]

    if leaf.ndim == 2:
        if name in _LEAD_SHARDED or parent in _LEAD_SHARDED:
            return P("model", None)
        if parent in _COL_SHARDED and name == "w":
            return P(None, "model")
        if parent in _ROW_SHARDED and name == "w":
            return P("model", None)
    if leaf.ndim == 1 and parent in _COL_SHARDED and name == "b":
        return P("model")
    # MoE expert stacks [E, ...]: expert-parallel over "model" — the
    # dispatch/combine einsums become the EP all-to-all (parallel/moe.py)
    if leaf.ndim == 3 and parent == "experts":
        return P("model", None, None)
    return P()


def param_specs(params) -> Any:
    """PartitionSpec pytree matching `params`."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


# Leaves smaller than this stay replicated under FSDP: sharding a 512-float
# layernorm scale saves nothing and costs a collective per use.
_FSDP_MIN_SIZE = 2 ** 15


def _fsdp_spec_for(path, leaf, data_size: int) -> P:
    """TP spec (_spec_for) + "data" on the largest still-unsharded dim that
    divides the data axis — params, grads, and Adam moments all live sharded
    at rest (ZeRO-3 semantics); GSPMD all-gathers weights where the forward
    needs them and reduce-scatters grads back to the shards."""
    spec = _spec_for(path, leaf)
    # module global (not a default arg) so tests can monkeypatch it down
    if leaf.ndim == 0 or leaf.size < _FSDP_MIN_SIZE or data_size <= 1:
        return spec
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    best = None
    for i, (e, d) in enumerate(zip(entries, leaf.shape)):
        if e is None and d % data_size == 0 and (
                best is None or d > leaf.shape[best]):
            best = i
    if best is None:
        return spec
    entries[best] = "data"
    return P(*entries)


def fsdp_param_specs(params, data_size: int) -> Any:
    """PartitionSpec pytree for fully-sharded data parallelism."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: _fsdp_spec_for(p, l, data_size), params)


def opt_state_specs(opt_state, *, fsdp_data_size: int = 0) -> Any:
    """PartitionSpec pytree matching an optax state. Adam's mu/nu subtrees
    mirror the param tree, so the last two path components of every moment
    leaf are exactly the (parent, name) keys the param rule matches on —
    moments follow their param's sharding; scalars (count) replicate."""
    if fsdp_data_size > 1:
        rule = lambda p, l: _fsdp_spec_for(p, l, fsdp_data_size)
    else:
        rule = _spec_for
    return jax.tree_util.tree_map_with_path(rule, opt_state)


def param_shardings(params, mesh: Mesh, *, fsdp: bool = False) -> Any:
    specs = (fsdp_param_specs(params, mesh.shape["data"]) if fsdp
             else param_specs(params))
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), specs)


def opt_state_shardings(opt_state, mesh: Mesh, *, fsdp: bool = False) -> Any:
    specs = opt_state_specs(
        opt_state, fsdp_data_size=mesh.shape["data"] if fsdp else 0)
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), specs)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_specs() -> P:
    """Leading (batch) axis sharded over data."""
    return P("data")


def batch_shardings(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_specs())


def shard_params(params, mesh: Mesh, *, fsdp: bool = False):
    """Place a (host-resident) param pytree onto the mesh."""
    return jax.device_put(params, param_shardings(params, mesh, fsdp=fsdp))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_shardings(mesh))


def local_rows(x) -> "np.ndarray":
    """Host view of THIS process's rows of a batch-sharded global array, in
    global row order. Single-process (or fully-replicated arrays) this is
    just np.asarray; multi-process, np.asarray on a non-fully-addressable
    global array raises, so the addressable shards are stitched instead.
    The inverse of shard_host_batch for driver code that post-processes
    per-process results on host (e.g. zero-shot preds before the
    gather_for_metrics-style process_allgather)."""
    import numpy as np
    if jax.process_count() == 1 or getattr(x, "is_fully_replicated", True):
        return np.asarray(x)
    # dedupe by row range: with a "model" axis the same rows are replicated
    # across model-parallel devices
    seen = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)


def shard_host_batch(batch, mesh: Mesh):
    """Multi-host-aware batch placement: each process contributes its LOCAL
    batch (from its ShardedSampler shard, data/loader.py) and the result is
    the GLOBAL [local * process_count, ...] array sharded over "data" — the
    DistributedSampler + DDP data path of the reference
    (CTClipTrainer.py:88-105). Single-process this is exactly shard_batch."""
    if jax.process_count() == 1:
        return jax.device_put(batch, batch_shardings(mesh))
    return jax.make_array_from_process_local_data(batch_shardings(mesh), batch)

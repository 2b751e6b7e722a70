"""Pipeline-parallel transformer stack (beyond-parity extension).

The reference has no pipeline parallelism (its only distribution is DDP over
NCCL, src/utils/CTClipTrainer.py:62-69); this module completes the
parallelism matrix (DP / TP / SP / PP) for scaling the tower DEPTH across
devices — the regime where a deeper CT-ViT or text tower no longer fits one
core's HBM even with remat, and tensor-parallel all-reduces per matmul would
saturate ICI.

Design (GPipe schedule over a collective-permute ring, the standard TPU
formulation — stages exchange activations over ICI with `ppermute`, no
host-side scheduler):

  * the per-layer parameter pytrees are STACKED on a leading depth axis and
    that axis is sharded over the mesh's pipeline axis: each device holds
    `depth / n_stages` contiguous layers and runs them with a `lax.scan`
    (one compiled layer body per stage, not per layer);
  * the batch is split into M microbatches; the schedule runs
    `M + n_stages - 1` ticks. At tick t, stage 0 feeds microbatch t (clamped
    garbage after the last one — its results never reach a write), every
    stage runs its layer block on what it received, and `ppermute` rotates
    outputs one stage forward;
  * the last stage scatters its tick outputs into the [M, ...] output
    buffer; a final `psum` replicates the result (correctness/validation
    grade — a production serving loop would leave it stage-local);
  * with `cfg.remat`, each layer body is `jax.checkpoint`ed — the classic
    GPipe activation-stash-plus-recompute memory profile under autodiff.

Bubble fraction is the usual (S-1)/(M+S-1); callers pick `microbatches`
accordingly. The whole schedule is differentiable (scan + ppermute + psum
all have transposes), so this drops into the training step unchanged.

Semantics match `ops/transformer.transformer` (deterministic path, no taps,
no cross-attention) bit-for-bit up to XLA reassociation: PEG -> fused
self-attention(+residual) -> fused GEGLU FF(+residual) per layer, final
LayerNorm outside the pipelined region. Validated forward + grads against
the dense stack on the virtual CPU mesh (tests/test_pipeline.py) and
exercised in `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TransformerConfig
from ..ops.attention import attention
from ..ops.layers import feedforward, layernorm, peg_residual

Array = jax.Array


def _layer_fwd(layer, cfg: TransformerConfig, x: Array,
               attn_bias: Optional[Array],
               video_shape: Optional[Tuple[int, int, int, int]]) -> Array:
    """One transformer layer, mirroring ops/transformer.plain_layer on the
    deterministic no-tap path (residuals fused into the kernel writes)."""
    if cfg.peg:
        x = peg_residual(layer["peg"], x, video_shape, causal=cfg.peg_causal)
    x, _ = attention(layer["self_attn"], cfg.self_attn(), x,
                     attn_bias=attn_bias, return_weights=False,
                     deterministic=True, residual=True)
    return feedforward(layer["ff"], x, deterministic=True, residual=True)


def _pipeline_device(stacked, xmbs: Array, attn_bias, *,
                     cfg: TransformerConfig, axis_name: str, n_stages: int,
                     mb_video_shape) -> Array:
    """Per-device GPipe schedule (call inside shard_map).

    stacked: layer params stacked on a leading depth axis, of which this
      device holds its stage's [depth/n_stages, ...] shard.
    xmbs: [M, rows/M, n, d] microbatched input (replicated).
    """
    S = n_stages
    stage = jax.lax.axis_index(axis_name)
    M = xmbs.shape[0]
    perm = [(j, (j + 1) % S) for j in range(S)]

    def body(layer, x):
        return _layer_fwd(layer, cfg, x, attn_bias, mb_video_shape)

    if cfg.remat:
        body = jax.checkpoint(body)

    def stage_fn(x):
        out, _ = jax.lax.scan(lambda h, l: (body(l, h), None), x, stacked)
        return out

    def tick(carry, t):
        recv, outbuf = carry
        mb = jax.lax.dynamic_index_in_dim(xmbs, jnp.clip(t, 0, M - 1), 0,
                                          keepdims=False)
        x_in = jnp.where(stage == 0, mb, recv)
        y = stage_fn(x_in)
        o = t - (S - 1)                       # output slot; valid once o >= 0
        upd = jax.lax.dynamic_update_index_in_dim(
            outbuf, y, jnp.clip(o, 0, M - 1), 0)
        outbuf = jnp.where(jnp.logical_and(stage == S - 1, o >= 0),
                           upd, outbuf)
        recv = jax.lax.ppermute(y, axis_name, perm)
        return (recv, outbuf), None

    init = (jnp.zeros_like(xmbs[0]), jnp.zeros_like(xmbs))
    (_, outbuf), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
    # replicate the last stage's buffer (every other stage contributes zeros)
    return jax.lax.psum(
        jnp.where(stage == S - 1, outbuf, jnp.zeros_like(outbuf)), axis_name)


@functools.lru_cache(maxsize=None)
def _pipeline_jitted(cfg: TransformerConfig, mesh, axis_name: str,
                     n_micro: int, mb_video_shape, has_bias: bool,
                     data_axis: Optional[str]):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_stages = mesh.shape[axis_name]

    def run(stacked, xmbs, attn_bias):
        return _pipeline_device(
            stacked, xmbs, attn_bias if has_bias else None,
            cfg=cfg, axis_name=axis_name, n_stages=n_stages,
            mb_video_shape=mb_video_shape)

    # DPxPP: each data-shard runs its own independent pipeline on its
    # microbatch rows (axis 1 of the [M, rows/M, ...] buffer); the psum in
    # _pipeline_device reduces over the pipe axis only
    io_spec = P(None, data_axis) if data_axis else P()
    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(axis_name), io_spec, P()),
        out_specs=io_spec,
        check_vma=False)
    return jax.jit(fn)


def transformer_pipelined(params, cfg: TransformerConfig, x: Array, mesh, *,
                          axis_name: str = "pipe",
                          data_axis: Optional[str] = None,
                          microbatches: Optional[int] = None,
                          video_shape: Optional[Tuple[int, int, int, int]] = None,
                          attn_bias: Optional[Array] = None) -> Array:
    """Pipeline-parallel equivalent of `ops/transformer.transformer` on the
    deterministic no-tap path: [rows, n, d] -> post-final-LN [rows, n, d].

    `mesh.shape[axis_name]` devices each run `cfg.depth / n_stages`
    consecutive layers; the batch (leading `rows` axis, batch-major as in
    both CT-ViT stacks) splits into `microbatches` (default: n_stages).
    `video_shape` is the FULL-batch (b, t, h, w) exactly as the dense call
    takes it; the per-microbatch shape is derived here.

    data_axis composes DP with PP: each `data_axis` shard pipelines its own
    batch rows through the same stages (microbatch rows sharded over it;
    output sharded the same way).
    """
    n_stages = mesh.shape[axis_name]
    depth = len(params["layers"])
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    M = microbatches if microbatches is not None else n_stages
    D = mesh.shape[data_axis] if data_axis else 1
    rows = x.shape[0]
    if rows % (M * D) != 0:
        raise ValueError(f"batch rows {rows} not divisible by {M} microbatches"
                         f" x {D} data shards")
    mb_video_shape = None
    if cfg.peg:
        if video_shape is None:
            raise ValueError("cfg.peg requires video_shape")
        vb = video_shape[0]
        if vb % (M * D) != 0:
            raise ValueError(
                f"video batch {vb} not divisible by {M} microbatches"
                f" x {D} data shards")
        mb_video_shape = (vb // (M * D),) + tuple(video_shape[1:])
    if cfg.has_cross_attn:
        raise NotImplementedError("pipelined stack: no cross-attention")
    if cfg.attn_dropout or cfg.ff_dropout:
        raise NotImplementedError(
            "pipelined stack is deterministic: dropout is not implemented "
            "(the dense stack would apply it; refusing to drop it silently)")

    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves),
                           *params["layers"])
    xmbs = x.reshape((M, rows // M) + x.shape[1:])
    bias = attn_bias if attn_bias is not None else jnp.zeros((), x.dtype)
    fn = _pipeline_jitted(cfg, mesh, axis_name, M, mb_video_shape,
                          attn_bias is not None, data_axis)
    out = fn(stacked, xmbs, bias)
    out = out.reshape((rows,) + x.shape[1:])
    return layernorm(params["norm_out"], out)

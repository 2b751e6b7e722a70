"""Cosine-similarity vector quantization with straight-through estimator.

Replaces the reference's vector_quantize_pytorch.VectorQuantize dependency
(reference src/utils/ctvit.py:66,117-118: cosine codebook of 8192 x 512,
`self.vq.train()` forced before every call with freezing delegated to
`freeze_codebook=not self.training`). Semantics reproduced:

  * codebook rows stored l2-normalized; lookup = argmax cosine similarity
    between the l2-normalized input and the codebook;
  * output value is the selected (normalized) codebook row; gradient is
    straight-through (identity into the encoder) — this is what lets the
    attribution suite backprop through the tokenizer;
  * training updates the codebook by EMA over assigned (normalized) inputs,
    with Laplace-smoothed cluster sizes; `freeze=True` skips the update
    (eval / frozen-codebook mode).

TPU design: the naive sim matrix for 13,824 tokens x 8192 codes is a ~453 MB
fp32 intermediate; we chunk the token axis with lax.map so the transient
stays in VMEM-friendly tiles, and offer a fused Pallas kernel
(ops/pallas_vq.py) for the lookup.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .layers import l2norm

Array = jax.Array


class VQState(NamedTuple):
    embed: Array         # [codebook, dim], l2-normalized rows
    embed_avg: Array     # [codebook, dim] EMA accumulator
    cluster_size: Array  # [codebook] EMA of assignment counts


def init_vq(key, codebook_size: int, dim: int) -> VQState:
    embed = l2norm(jax.random.normal(key, (codebook_size, dim), jnp.float32))
    return VQState(embed=embed, embed_avg=embed.copy(),
                   cluster_size=jnp.zeros((codebook_size,), jnp.float32))


def _nearest(embed: Array, flat: Array, chunk: int = 2048,
             compute_dtype=jnp.float32) -> Array:
    """argmax cosine-sim indices for [n, d] l2-normalized inputs. On TPU the
    fused Pallas kernel streams codebook tiles (ops/pallas_vq.py); elsewhere
    a chunked XLA map bounds the [chunk, codebook] logits transient.

    compute_dtype: matmul input dtype on the TPU path. bf16 runs the 8192-way
    sim at MXU rate (~4x the fp32 kernel; 1.85 TFLOP at flagship shapes) and
    matches the reference's fp16-autocast VQ distance matmul
    (CTClipTrainer.py:269, vector_quantize_pytorch under autocast);
    attribution paths keep fp32 tokens and therefore the fp32 kernel."""
    n = flat.shape[0]
    if jax.default_backend() == "tpu" and embed.shape[0] % 1024 == 0:
        from .pallas_vq import vq_nearest_pallas
        # indices are integers (no tangents); stop_gradient keeps the Pallas
        # call out of the autodiff graph when the model is differentiated
        # big tiles: tc = whole codebook when it fits VMEM (8192 x 512 bf16
        # = 8 MB) measures ~49 vs ~43 TF/s at tc=2048 (round-3 sweep), and
        # tm=512 amortizes the per-tile argmax VPU pass over more rows
        return vq_nearest_pallas(
            jax.lax.stop_gradient(flat).astype(compute_dtype),
            jax.lax.stop_gradient(embed).astype(compute_dtype),
            tm=512, tc=min(8192, embed.shape[0]))

    pad = (-n) % chunk
    flat_p = jnp.pad(flat, ((0, pad), (0, 0)))
    blocks = flat_p.reshape(-1, chunk, flat.shape[-1])

    def one(block):
        sim = jnp.dot(block, embed.T, preferred_element_type=jnp.float32)
        return jnp.argmax(sim, axis=-1)

    idx = jax.lax.map(one, blocks).reshape(-1)
    return idx[:n]


def vq_lookup(state: VQState, x: Array) -> Tuple[Array, Array]:
    """Quantize [..., d] inputs. Returns (quantized_value, indices).
    The sim matmul runs in the input's dtype (bf16 inputs -> bf16 MXU pass,
    fp32 attribution inputs -> fp32 kernel); l2norm stays fp32."""
    shape = x.shape
    flat = l2norm(x.reshape(-1, shape[-1]).astype(jnp.float32))
    idx = _nearest(state.embed, flat, compute_dtype=x.dtype)
    # convert the 8192-row codebook BEFORE the 221k-row gather: per-element
    # rounding commutes with the gather, and the gather then moves half the
    # bytes (bf16 rows) — measured 3.2 -> ~1.6 ms at flagship shapes
    quant = jnp.take(state.embed.astype(x.dtype), idx, axis=0)
    return quant.reshape(shape), idx.reshape(shape[:-1])


def vq_stats_input(x: Array, dim: int) -> Array:
    """The exact input view the EMA statistics are computed from: flattened,
    l2-normalized fp32, detached. ONE definition shared by vq_apply's
    unfrozen branch and the GradCache chunked train step
    (train/trainer.py) — if these ever diverged, the chunked step's
    reconstructed EMA would silently desynchronize from the single-pass
    step."""
    flat = l2norm(x.reshape(-1, dim).astype(jnp.float32))
    return jax.lax.stop_gradient(flat)


def vq_batch_stats(idx: Array, flat: Array, codebook_size: int
                   ) -> Tuple[Array, Array]:
    """Per-batch assignment statistics feeding the EMA update: counts[c] and
    embed_sum[c] = sum of (normalized) inputs assigned to code c. Both are
    row-sums over the batch, so stats of a batch equal the sum of stats of
    its microbatches — the property the chunked (GradCache) train step relies
    on to reproduce full-batch VQ EMA semantics exactly (train/trainer.py).

    Args: idx [n] int assignments; flat [n, dim] l2-normalized fp32 inputs.
    """
    onehot = jax.nn.one_hot(idx.reshape(-1), codebook_size, dtype=jnp.float32)
    counts = onehot.sum(axis=0)                          # [codebook]
    embed_sum = onehot.T @ flat                          # [codebook, dim]
    return counts, embed_sum


def vq_ema_update(state: VQState, counts: Array, embed_sum: Array, *,
                  decay: float = 0.8, eps: float = 1e-5) -> VQState:
    """One EMA codebook update from accumulated batch statistics, with
    Laplace-smoothed cluster sizes and re-normalized rows (the
    vector_quantize_pytorch cosine-codebook update the reference delegates
    to, ctvit.py:66,117-118)."""
    codebook_size = state.embed.shape[0]
    cluster_size = state.cluster_size * decay + counts * (1.0 - decay)
    embed_avg = state.embed_avg * decay + embed_sum * (1.0 - decay)

    # Laplace smoothing of cluster sizes, then renormalize rows onto the sphere.
    n = cluster_size.sum()
    smoothed = (cluster_size + eps) / (n + codebook_size * eps) * n
    embed = l2norm(embed_avg / smoothed[:, None])

    return VQState(embed=embed, embed_avg=embed_avg,
                   cluster_size=cluster_size)


def vq_apply(state: VQState, x: Array, *, freeze: bool = True,
             decay: float = 0.8, eps: float = 1e-5
             ) -> Tuple[Array, Array, VQState]:
    """Full VQ forward.

    Returns (out, indices, new_state). `out` carries straight-through
    gradients: value == codebook row, d out/d x == identity. With
    freeze=True, new_state is the input state unchanged.
    """
    quant, idx = vq_lookup(state, x)
    out = x + jax.lax.stop_gradient(quant - x)

    if freeze:
        return out, idx, state

    _, dim = state.embed.shape
    flat = vq_stats_input(x, dim)
    counts, embed_sum = vq_batch_stats(idx, flat, state.embed.shape[0])
    return out, idx, vq_ema_update(state, counts, embed_sum,
                                   decay=decay, eps=eps)

"""Positional biases: ALiBi and Continuous Position Bias (CPB).

Reference: src/utils/attention.py:186-277. Both are deterministic functions of
static shapes, so under jit they fold into the compiled graph (no caching
buffers needed, unlike the reference's register_buffer dance).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .layers import init_linear, linear

Array = jax.Array


def alibi_slopes(heads: int) -> jnp.ndarray:
    """ALiBi per-head slopes (reference attention.py:202-213)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(heads).is_integer():
        s = pow2_slopes(heads)
    else:
        closest = 2 ** math.floor(math.log2(heads))
        s = pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: heads - closest]
    return jnp.asarray(s, jnp.float32)


def alibi_bias(heads: int, i: int, j: int) -> Array:
    """[heads, i, j] causal ALiBi bias: -|key_pos - query_pos| * slope, with
    query positions offset so the last query aligns with the last key
    (reference attention.py:195-200, 215-228)."""
    i_pos = jnp.arange(j - i, j, dtype=jnp.float32)
    j_pos = jnp.arange(j, dtype=jnp.float32)
    bias = -jnp.abs(j_pos[None, None, :] - i_pos[None, :, None])  # [1, i, j]
    return bias * alibi_slopes(heads)[:, None, None]


# ---------------------------------------------------------------------------
# Continuous position bias (Swin-v2 style MLP over signed-log relative coords)
# ---------------------------------------------------------------------------

def init_continuous_pos_bias(key, dim: int, heads: int, num_dims: int = 2,
                             layers: int = 2):
    """2-layer MLP (LeakyReLU 0.1) mapping relative ND coordinates to per-head
    biases (reference attention.py:230-253)."""
    keys = jax.random.split(key, layers + 1)
    net = [init_linear(keys[0], num_dims, dim, bias=True)]
    for li in range(layers - 1):
        net.append(init_linear(keys[1 + li], dim, dim, bias=True))
    net.append(init_linear(keys[layers], dim, heads, bias=True))
    return {"net": net}


def _cpb_mlp(params, rel: Array, log_dist: bool) -> Array:
    if log_dist:
        rel = jnp.sign(rel) * jnp.log(jnp.abs(rel) + 1.0)
    h = rel
    n_layers = len(params["net"])
    for idx, layer_p in enumerate(params["net"]):
        h = linear(layer_p, h)
        if idx < n_layers - 1:  # LeakyReLU(0.1) after all but the last
            h = jnp.where(h >= 0, h, 0.1 * h)
    return h


def continuous_pos_bias(params, *dimensions: int, log_dist: bool = True) -> Array:
    """[heads, N, N] bias for an N = prod(dimensions) token grid
    (reference attention.py:258-277). Computed in fp32.

    The MLP runs over the DISTINCT relative offsets — prod(2d - 1) values —
    and the [N, N] table is a gather. The reference evaluates the MLP on
    all N^2 pairs (attention.py:262-277), which at MaskGit's 101x8x8 grid
    would materialize a [6464, 6464, hidden] fp32 intermediate (~10 GB);
    the factored form is exact and bounded by the offset table."""
    dims = tuple(int(d) for d in dimensions)
    c = len(dims)

    # distinct offsets per axis: [-(d-1), ..., d-1]
    offset_axes = [jnp.arange(-(d - 1), d, dtype=jnp.float32) for d in dims]
    off_grid = jnp.stack(jnp.meshgrid(*offset_axes, indexing="ij"), axis=-1)
    off_flat = off_grid.reshape(-1, c)                     # [O, C]
    table = _cpb_mlp(params, off_flat, log_dist)           # [O, heads]

    # index[i, j] = flat offset id of (pos_i - pos_j)
    pos_axes = [jnp.arange(d, dtype=jnp.int32) for d in dims]
    pos = jnp.stack(jnp.meshgrid(*pos_axes, indexing="ij"), axis=-1).reshape(-1, c)
    rel_idx = pos[:, None, :] - pos[None, :, :]            # [N, N, C]
    strides = []
    s = 1
    for d in reversed(dims):
        strides.insert(0, s)
        s *= 2 * d - 1
    flat_idx = jnp.zeros(rel_idx.shape[:2], jnp.int32)
    for ax, d in enumerate(dims):
        flat_idx = flat_idx + (rel_idx[..., ax] + (d - 1)) * strides[ax]

    # gather PER HEAD: a single [N*N, heads] gather output gets lane-padded
    # heads -> 128 on TPU (21 GB at MaskGit's 6464-token grid); per-head
    # [N, N] gathers keep the lane dim wide
    heads = table.shape[-1]
    return jnp.stack([jnp.take(table[:, h], flat_idx, axis=0)
                      for h in range(heads)])              # [heads, N, N]


def causal_mask(i: int, j: int) -> Array:
    """Boolean [i, j] mask that is True where attention is DISALLOWED
    (strictly-future keys), matching triu(j - i + 1) (reference attention.py:171)."""
    rows = jnp.arange(i)[:, None]
    cols = jnp.arange(j)[None, :]
    return cols > (rows + (j - i))

"""Positional biases: ALiBi and Continuous Position Bias (CPB).

Reference: src/utils/attention.py:186-277. Both are deterministic functions of
static shapes, so under jit they fold into the compiled graph (no caching
buffers needed, unlike the reference's register_buffer dance).
"""

from __future__ import annotations

import math
from typing import Optional

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

    # Expand the offset table to the [N, N] pair grid with one-hot MATMULS
    # per axis instead of a flat [N*N] gather: TPU gathers run element-wise
    # on the VPU (~2.4 ms per [576^2] table at the CT-ViT grid, recomputed
    # per layer by XLA), while the selection matmul is a few-hundred-MFLOP
    # MXU op. Float-exact (each output row sums exactly one table entry
    # times 1.0) and differentiable, so the training path shares it.
    heads = table.shape[-1]
    offs = tuple(2 * d - 1 for d in dims)
    t = table.reshape(offs + (heads,))                     # [O1..Oc, heads]
    for ax, d in enumerate(dims):
        ar = jnp.arange(d)
        rel = ar[:, None] - ar[None, :] + (d - 1)          # [d, d] offset ids
        sel = jax.nn.one_hot(rel.reshape(-1), 2 * d - 1,
                             dtype=jnp.float32)            # [d*d, 2d-1]
        t = jnp.moveaxis(
            jnp.tensordot(sel, jnp.moveaxis(t, ax, 0), axes=1), 0, ax)
    # t: [d1*d1, ..., dc*dc, heads] -> [heads, N, N]
    pair_shape = []
    for d in dims:
        pair_shape += [d, d]
    t = t.reshape(pair_shape + [heads])
    perm = ([2 * c] + [2 * k for k in range(c)]
            + [2 * k + 1 for k in range(c)])
    n = 1
    for d in dims:
        n *= d
    return t.transpose(perm).reshape(heads, n, n)


def continuous_pos_bias_stripe(params, d1: int, d2: int, row_start,
                               row_len: int, log_dist: bool = True) -> Array:
    """Row stripe of the 2D CPB table for sequence-parallel attention:
    [heads, row_len * d2, d1 * d2] — the bias rows of the query tokens whose
    GRID ROWS are [row_start, row_start + row_len), against all keys.

    Equal to continuous_pos_bias(params, d1, d2)[:, row_start*d2 :
    (row_start+row_len)*d2, :] without ever materializing the [N, N] table —
    each device of a ring-attention mesh builds only its own stripe
    (parallel/ring_attention.py). `row_start` may be traced (it is the
    device's axis_index under shard_map)."""
    f32 = jnp.float32
    offset_axes = [jnp.arange(-(d - 1), d, dtype=f32) for d in (d1, d2)]
    off_grid = jnp.stack(jnp.meshgrid(*offset_axes, indexing="ij"), axis=-1)
    table = _cpb_mlp(params, off_grid.reshape(-1, 2), log_dist)
    heads = table.shape[-1]
    t = table.reshape(2 * d1 - 1, 2 * d2 - 1, heads)

    # axis 0 (grid rows): query rows are the local subset
    rows = row_start + jnp.arange(row_len)
    rel0 = rows[:, None] - jnp.arange(d1)[None, :] + (d1 - 1)  # [m, d1]
    sel0 = jax.nn.one_hot(rel0.reshape(-1), 2 * d1 - 1, dtype=f32)
    t = jnp.tensordot(sel0, t, axes=(1, 0))      # [(m d1), 2d2-1, heads]

    # axis 1 (grid cols): full pair grid
    ar = jnp.arange(d2)
    rel1 = ar[:, None] - ar[None, :] + (d2 - 1)                # [d2, d2]
    sel1 = jax.nn.one_hot(rel1.reshape(-1), 2 * d2 - 1, dtype=f32)
    t = jnp.tensordot(sel1, jnp.moveaxis(t, 1, 0), axes=(1, 0))
    t = jnp.moveaxis(t, 0, 1)                    # [(m d1), (d2 d2), heads]

    t = t.reshape(row_len, d1, d2, d2, heads)    # (mq, hk, wq, wk, head)
    t = t.transpose(4, 0, 2, 1, 3)               # [head, mq, wq, hk, wk]
    return t.reshape(heads, row_len * d2, d1 * d2)


def cpb_offset_table(params, dims, log_dist: bool = True) -> Array:
    """The CPB MLP evaluated over every distinct relative offset —
    [2*d1-1, ..., 2*dc-1, heads]. Loop-invariant for the stripe builders:
    evaluate ONCE per forward and pass via their `table=` kwarg when the
    stripe is built inside a scan body (blockwise attention's bias_fn) —
    otherwise the MLP re-runs every key block."""
    f32 = jnp.float32
    dims = tuple(int(d) for d in dims)
    offset_axes = [jnp.arange(-(d - 1), d, dtype=f32) for d in dims]
    off_grid = jnp.stack(jnp.meshgrid(*offset_axes, indexing="ij"), axis=-1)
    table = _cpb_mlp(params, off_grid.reshape(-1, len(dims)), log_dist)
    return table.reshape(tuple(2 * d - 1 for d in dims) + (-1,))


def _cpb_stripe_nd(params, dims, start, length: int, log_dist: bool,
                   table: Optional[Array], restrict: str) -> Array:
    """Shared N-D stripe builder over the CPB offset table.

    restrict="cols": all queries against the keys whose FIRST-AXIS rows are
    [start, start + length) -> [heads, prod(dims), length * prod(dims[1:])].
    restrict="rows": the queries whose FIRST-AXIS rows are in that range
    against all keys -> [heads, length * prod(dims[1:]), prod(dims)].
    Out-of-range stripe rows (q/k-block padding past dims[0]) still produce
    FINITE bias (legal relative offsets select real table entries; only
    offsets past the table drop to zero via one_hot) — safe because the
    blockwise attention paths discard padded rows' outputs."""
    f32 = jnp.float32
    if table is None:
        table = cpb_offset_table(params, dims, log_dist)
    heads = table.shape[-1]
    t = table
    d1, rest = dims[0], dims[1:]

    idx = start + jnp.arange(length)
    if restrict == "rows":               # queries restricted, keys full
        rel0 = idx[:, None] - jnp.arange(d1)[None, :] + (d1 - 1)
        pair0 = [length, d1]
    else:                                # keys restricted, queries full
        rel0 = jnp.arange(d1)[:, None] - idx[None, :] + (d1 - 1)
        pair0 = [d1, length]
    sel0 = jax.nn.one_hot(rel0.reshape(-1), 2 * d1 - 1, dtype=f32)
    t = jnp.tensordot(sel0, t, axes=(1, 0))

    for ax, d in enumerate(rest, start=1):       # full pair grids
        ar = jnp.arange(d)
        rel = ar[:, None] - ar[None, :] + (d - 1)
        sel = jax.nn.one_hot(rel.reshape(-1), 2 * d - 1, dtype=f32)
        t = jnp.moveaxis(
            jnp.tensordot(sel, jnp.moveaxis(t, ax, 0), axes=(1, 0)), 0, ax)

    # t: [(pair0), (d2 d2), ..., heads] with (q, k) pair order per axis
    c = len(dims)
    pair_shape = pair0[:]
    for d in rest:
        pair_shape += [d, d]
    t = t.reshape(pair_shape + [heads])
    # q-axes are the even pair members, k-axes the odd ones
    perm = ([2 * c] + [2 * k for k in range(c)]
            + [2 * k + 1 for k in range(c)])
    t = t.transpose(perm)
    n = 1
    for d in dims:
        n *= d
    blk = length
    for d in rest:
        blk *= d
    if restrict == "rows":
        return t.reshape(heads, blk, n)
    return t.reshape(heads, n, blk)


def _cpb_col_stripe_nd(params, dims, col_start, col_len: int,
                       log_dist: bool, table: Optional[Array]) -> Array:
    return _cpb_stripe_nd(params, dims, col_start, col_len, log_dist, table,
                          restrict="cols")


def continuous_pos_bias_col_stripe(params, d1: int, d2: int, col_start,
                                   col_len: int, log_dist: bool = True,
                                   table: Optional[Array] = None) -> Array:
    """Column stripe of the 2D CPB table: [heads, d1 * d2, col_len * d2] —
    all query tokens against the key tokens whose GRID ROWS are
    [col_start, col_start + col_len). Equal to
    continuous_pos_bias(params, d1, d2)[:, :, col_start*d2 :
    (col_start+col_len)*d2] without materializing [N, N]; the key-block
    counterpart of `continuous_pos_bias_stripe` for blockwise attention
    (ops/attention_blockwise.py bias_fn). `col_start` may be traced; pass
    `table=cpb_offset_table(...)` when calling inside a scan body."""
    return _cpb_col_stripe_nd(params, (d1, d2), col_start, col_len,
                              log_dist, table)


def continuous_pos_bias_grouped3(params, d1: int, d2: int, d3: int,
                                 log_dist: bool = True) -> Array:
    """[heads, n, n] 3D CPB table built FRAME-GROUPED: the within-frame
    (d2, d3) pair axes expand first into one m = d2*d3 axis, then frames
    expand through a single one-hot contraction — every intermediate keeps
    a minor axis >= m.

    Why not `continuous_pos_bias`: its generic per-axis expansion routes
    the final relayout through a [heads, d1, d2, d3, d1, d2, d3] transpose
    whose minor (8, 8) axes lane-pad 8 -> 128 under T(8, 128) tiling —
    21 GB at the MaskGit 101x8x8 grid (observed compile-time HBM OOM).
    Here the worst intermediate is [heads, d1, m, d1, m] with minor m = 64
    (2x pad), ~2.7 GB transient; the result is float-identical (same
    one-hot selections of the same offset table)."""
    f32 = jnp.float32
    table = cpb_offset_table(params, (d1, d2, d3), log_dist)
    o1 = 2 * d1 - 1
    heads = table.shape[-1]
    m = d2 * d3
    t = table                                  # [o1, 2d2-1, 2d3-1, heads]
    for ax, d in ((1, d2), (2, d3)):           # within-frame pair grids
        ar = jnp.arange(d)
        rel = ar[:, None] - ar[None, :] + (d - 1)
        sel = jax.nn.one_hot(rel.reshape(-1), 2 * d - 1, dtype=f32)
        t = jnp.moveaxis(
            jnp.tensordot(sel, jnp.moveaxis(t, ax, 0), axes=(1, 0)), 0, ax)
    # [o1, (q2 k2), (q3 k3), heads] -> [heads, o1, (q2 q3), (k2 k3)]
    t = t.reshape(o1, d2, d2, d3, d3, heads).transpose(5, 0, 1, 3, 2, 4)
    t = t.reshape(heads, o1, m, m)

    fr = jnp.arange(d1)
    rel0 = fr[:, None] - fr[None, :] + (d1 - 1)          # [fq, fk]
    sel0 = jax.nn.one_hot(rel0.reshape(-1), o1, dtype=f32)
    tq = t.transpose(0, 2, 3, 1)                         # [h, q, k, o1]
    full = jax.lax.dot_general(tq, sel0, (((3,), (1,)), ((), ())))
    full = full.reshape(heads, m, m, d1, d1).transpose(0, 3, 1, 4, 2)
    return full.reshape(heads, d1 * m, d1 * m)


def _cpb_row_stripe_nd(params, dims, row_start, row_len: int,
                       log_dist: bool, table: Optional[Array]) -> Array:
    return _cpb_stripe_nd(params, dims, row_start, row_len, log_dist, table,
                          restrict="rows")


def continuous_pos_bias_row_stripe3(params, d1: int, d2: int, d3: int,
                                    row_start, row_len: int,
                                    log_dist: bool = True,
                                    table: Optional[Array] = None) -> Array:
    """3D ROW stripe of the CPB table: [heads, row_len*d2*d3, d1*d2*d3] —
    the query tokens whose FIRST-AXIS rows are [row_start, row_start +
    row_len) against ALL keys. Equal to the matching row slice of
    continuous_pos_bias(params, d1, d2, d3) without materializing [N, N];
    the query-block counterpart of `continuous_pos_bias_col_stripe3` for
    the q-row-block attention (ops/attention_blockwise.py
    blockwise_cosine_attention_qrows). `row_start` may be traced; pass
    `table=cpb_offset_table(...)` when calling inside a scan body."""
    return _cpb_row_stripe_nd(params, (d1, d2, d3), row_start, row_len,
                              log_dist, table)


def continuous_pos_bias_col_stripe3(params, d1: int, d2: int, d3: int,
                                    col_start, col_len: int,
                                    log_dist: bool = True,
                                    table: Optional[Array] = None) -> Array:
    """3D analogue of `continuous_pos_bias_col_stripe` for the MaskGit token
    grid (reference maskgit.py:23,67: CPB over (t', h', w') = e.g.
    (101, 8, 8) = 6,464 tokens, where the dense [heads, N, N] table is
    ~1.3 GB fp32): [heads, d1*d2*d3, col_len*d2*d3] — all queries against
    the keys whose FIRST-AXIS rows are [col_start, col_start + col_len).
    `col_start` may be traced; pass `table=cpb_offset_table(...)` when
    calling inside a scan body (blockwise attention's bias_fn)."""
    return _cpb_col_stripe_nd(params, (d1, d2, d3), col_start, col_len,
                              log_dist, table)


def causal_mask(i: int, j: int) -> Array:
    """Boolean [i, j] mask that is True where attention is DISALLOWED
    (strictly-future keys), matching triu(j - i + 1) (reference attention.py:171)."""
    rows = jnp.arange(i)[:, None]
    cols = jnp.arange(j)[None, :]
    return cols > (rows + (j - i))

"""Fused Pallas TPU kernel for cosine-codebook VQ nearest-neighbor lookup.

The XLA path (ops/vq.py) computes sim = tokens @ codebook.T in chunks — for
the flagship shapes (55k tokens x 8192 codes at batch 4) that is ~1.8 GB of
HBM traffic for logits that only feed an argmax. This kernel streams codebook
tiles through VMEM and keeps a running (max, argmax) per token, so the only
HBM writes are the [M] indices.

Tie-breaking matches jnp.argmax / the reference lookup: the FIRST maximal
code wins (within a tile via argmax, across tiles via strict >).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(tok_ref, cb_ref, idx_ref, max_scr, arg_scr, *, tc: int):
    ti = pl.program_id(0)
    ci = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(ci == 0)
    def _():
        max_scr[:] = jnp.full_like(max_scr, -jnp.inf)
        arg_scr[:] = jnp.zeros_like(arg_scr)

    tok = tok_ref[:]                                  # [TM, D]
    cb = cb_ref[:]                                    # [TC, D]
    sim = jax.lax.dot_general(tok, cb, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [TM, TC]

    local_max = jnp.max(sim, axis=1)                  # [TM]
    local_arg = jnp.argmax(sim, axis=1).astype(jnp.int32) + ci * tc

    run_max = max_scr[0]
    upd = local_max > run_max
    max_scr[0] = jnp.where(upd, local_max, run_max)
    arg_scr[0] = jnp.where(upd, local_arg, arg_scr[0])

    @pl.when(ci == n_c - 1)
    def _():
        # the output block is the whole [n_tiles, TM] array (a [1, TM] block
        # would violate the (8, 128) sublane/lane tiling rule)
        idx_ref[pl.ds(ti, 1), :] = arg_scr[:]


@functools.partial(jax.jit, static_argnames=("tm", "tc", "interpret"))
def vq_nearest_pallas(tokens: Array, codebook: Array, *, tm: int = 256,
                      tc: int = 2048, interpret: bool = False) -> Array:
    """argmax_j <tokens_i, codebook_j> for l2-normalized inputs.

    Args:
      tokens: [M, D] (M padded to a multiple of tm by the caller or here).
      codebook: [C, D], C a multiple of tc.
    Returns int32 [M].
    """
    m, d = tokens.shape
    c = codebook.shape[0]
    pad = (-m) % tm
    if pad:
        tokens = jnp.pad(tokens, ((0, pad), (0, 0)))
    mp = m + pad
    assert c % tc == 0, (c, tc)

    grid = (mp // tm, c // tc)
    out = pl.pallas_call(
        functools.partial(_kernel, tc=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp // tm, tm), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp // tm, tm), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, tm), jnp.float32),
            pltpu.VMEM((1, tm), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * c * d,
            bytes_accessed=(tokens.size + codebook.size * (mp // tm))
            * tokens.dtype.itemsize + mp * 4,
            transcendentals=0),
        # the whole [mp/tm, tm] index output is VMEM-resident (tiling rule,
        # see _kernel); at CTGenerate batch >= 8 (~52k tokens) that plus the
        # double-buffered codebook tiles exceeds the 17 MB default scoped
        # budget (observed compile OOM at [101, 512] out blocks)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(tokens, codebook)
    return out.reshape(-1)[:m]

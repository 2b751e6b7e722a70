"""Expert-parallel Mixture-of-Experts GEGLU feed-forward (EP).

Beyond reference parity: CT-CLIP (reference src/utils/attention.py:38-53) is
dense-only. This module gives the framework the expert-parallel axis — the
one sharding family DP/TP/SP/PP don't cover — as a drop-in replacement for
the transformer stack's GEGLU FF (`TransformerConfig.moe_experts`).

TPU-first design (GShard-style dense dispatch):
  * routing is materialized as STATIC-SHAPE one-hot dispatch/combine tensors
    [tokens, E, capacity] and applied with einsums — all the routing work is
    MXU matmuls, no gather/scatter, no dynamic shapes under jit;
  * experts carry a leading [E, ...] axis sharded over the mesh "model" axis
    (parallel/sharding.py maps the `experts` subtree to P("model", ...)), so
    under GSPMD the dispatch einsum ([tokens,E,C] x [tokens,d] -> [E,C,d],
    tokens data-sharded, E model-sharded) lowers to the all-to-all over ICI —
    never hand-written collectives;
  * capacity bounds the per-expert token count so every shape is static;
    overflowing tokens are dropped from the FF (their combine weight is 0,
    the residual still carries them) — standard GShard/Switch semantics;
  * the router runs in fp32 (softmax over expert logits is precision-
    sensitive); expert matmuls run in the activation dtype (bf16 on TPU).

Load balancing: `moe_feedforward` returns the GShard auxiliary loss
aux = E * sum_e mean_prob_e * frac_tokens_e (top-1 assignment fraction).
Add `moe_aux_weight * aux` to the task loss when training an MoE stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import _kaiming_uniform, init_layernorm, layernorm

Array = jax.Array


def init_moe_ff(key, dim: int, inner_dim: int, n_experts: int):
    """Router + E stacked GEGLU experts. The expert weights mirror the dense
    FF (ops/layers.py:125-133: LN -> Linear(dim, 2*inner) -> GEGLU ->
    Linear(inner, dim)) with a leading expert axis; per-expert fan-in init
    matches init_linear so a 1-expert MoE is distributionally a dense FF."""
    k_router, k_in, k_out = jax.random.split(key, 3)
    w_in = jnp.stack([
        _kaiming_uniform(k, (dim, inner_dim * 2), fan_in=dim)
        for k in jax.random.split(k_in, n_experts)])
    w_out = jnp.stack([
        _kaiming_uniform(k, (inner_dim, dim), fan_in=inner_dim)
        for k in jax.random.split(k_out, n_experts)])
    return {
        "norm": init_layernorm(dim, bias=True),
        # small-init router: near-uniform initial routing
        "router": {"w": 0.02 * jax.random.normal(
            k_router, (dim, n_experts), jnp.float32)},
        "experts": {"w_in": w_in, "w_out": w_out},
    }


def _default_group_size(n: int, cap: int = 512) -> int:
    """Largest divisor of n that is <= cap: the dispatch group defaults to
    one batch row (standard GShard grouping) unless the row is long, in
    which case it splits into equal sub-rows to bound dispatch memory."""
    if n <= cap:
        return n
    for g in range(cap, 0, -1):
        if n % g == 0:
            return g
    return n  # unreachable (g=1 always divides)


def moe_feedforward(params, x: Array, *, top_k: int = 2,
                    capacity_factor: float = 2.0,
                    normalize_gates: bool = True,
                    residual: bool = False,
                    rng: Optional[Array] = None,
                    deterministic: bool = True,
                    dropout_rate: float = 0.0,
                    group_size: Optional[int] = None) -> Tuple[Array, Array]:
    """[b, n, d] -> ([b, n, d], aux_loss scalar).

    Tokens route in GROUPS of `group_size` (default: one batch row, split to
    <= 512 tokens): each group independently picks top_k experts per token,
    with per-group capacity C = ceil(top_k * group_size * capacity_factor /
    E) (earlier tokens win slots, GShard priority). Grouping bounds the
    dispatch tensors to [groups, S, E, C] ~ tokens * S * top_k * cf elements
    — without it the single-group construction is O(tokens^2) and unusable
    at CT-ViT's 1e5-token spatial stack. Gates over the chosen experts are
    renormalized (normalize_gates) so a capacity-sufficient MoE with
    identical experts reproduces the dense FF exactly — pinned by
    tests/test_moe.py."""
    b, n, d = x.shape
    w_in = params["experts"]["w_in"]
    w_out = params["experts"]["w_out"]
    n_experts = w_in.shape[0]
    top_k = min(top_k, n_experts)
    gs = group_size if group_size is not None else _default_group_size(n)
    assert gs > 0, f"group_size must be positive, got {group_size}"
    t = b * n
    assert t % gs == 0, (
        f"token count {t} (= {b} x {n}) not divisible by group_size {gs}")
    g = t // gs
    capacity = max(1, int(-(-top_k * gs * capacity_factor // n_experts)))

    h = layernorm(params["norm"], x).reshape(g, gs, d)

    # --- routing (fp32) ---
    logits = h.astype(jnp.float32) @ params["router"]["w"]        # [g, s, E]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)             # [g, s, k]
    if normalize_gates:
        gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)

    # --- static-shape dispatch/combine construction (per group) ---
    # slot j of every token claims a position in its expert's capacity
    # buffer; positions count tokens-then-slots so slot 0 (the top choice)
    # has priority over slot 1 at equal token index.
    dispatch = jnp.zeros((g, gs, n_experts, capacity), h.dtype)
    combine = jnp.zeros((g, gs, n_experts, capacity), jnp.float32)
    counts = jnp.zeros((g, n_experts), jnp.int32)
    for j in range(top_k):
        e_oh = jax.nn.one_hot(gate_idx[..., j], n_experts,
                              dtype=jnp.int32)                    # [g, s, E]
        # position of each token within its chosen expert's group buffer
        pos_in_e = counts[:, None, :] + jnp.cumsum(e_oh, axis=1) - e_oh
        pos = jnp.sum(pos_in_e * e_oh, axis=-1)                   # [g, s]
        keep = pos < capacity
        slot = jax.nn.one_hot(pos, capacity, dtype=h.dtype) \
            * keep[..., None].astype(h.dtype)                     # [g, s, C]
        d_j = e_oh.astype(h.dtype)[..., None] * slot[..., None, :]
        dispatch = dispatch + d_j
        combine = combine + (d_j.astype(jnp.float32)
                             * gate_vals[..., j][..., None, None])
        counts = counts + jnp.sum(
            e_oh * keep[..., None].astype(jnp.int32), axis=1)

    # --- expert computation (all MXU einsums; E axis model-sharded) ---
    expert_in = jnp.einsum("gsec,gsd->egcd", dispatch, h)         # all-to-all
    hidden = jnp.einsum("egcd,edf->egcf", expert_in, w_in.astype(h.dtype))
    value, gate = jnp.split(hidden, 2, axis=-1)
    act = jax.nn.gelu(gate.astype(jnp.float32),
                      approximate=False).astype(h.dtype) * value
    if not deterministic and dropout_rate > 0.0 and rng is not None:
        keep_p = 1.0 - dropout_rate
        mask = jax.random.bernoulli(rng, keep_p, act.shape)
        act = jnp.where(mask, act / keep_p, 0.0).astype(act.dtype)
    expert_out = jnp.einsum("egcf,efd->egcd", act, w_out.astype(h.dtype))
    out = jnp.einsum("gsec,egcd->gsd", combine.astype(h.dtype), expert_out)
    out = out.reshape(b, n, d).astype(x.dtype)

    # --- GShard load-balance aux loss (global over all tokens) ---
    me = jnp.mean(probs, axis=(0, 1))                              # [E]
    top1 = jax.nn.one_hot(gate_idx[..., 0], n_experts, dtype=jnp.float32)
    ce = jnp.mean(top1, axis=(0, 1))                               # [E]
    aux = n_experts * jnp.sum(me * ce)

    return (out + x if residual else out), aux

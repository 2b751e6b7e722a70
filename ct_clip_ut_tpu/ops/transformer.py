"""Transformer block stack: PEG -> self-attn -> (cross-attn) -> GEGLU FF.

Reference: src/utils/attention.py:281-336. Two deliberate API fixes over the
reference (SURVEY.md section 2.5 #1/#2): the stack returns attention weights
as structured outputs — `TransformerAux.self_attn` / `.cross_attn` hold one
[b, heads, i, j] array per layer — instead of relying on forward hooks, and
the MaskGit-expected 3-tuple contract actually exists.

The per-layer python loop unrolls under jit; depth here is 4-6 so unrolling
is the right call on TPU (lets XLA fuse PEG/attention/FF per layer without
a scan carry of stacked params).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax

from ..config import TransformerConfig
from .attention import attention, init_attention
from .layers import (feedforward, init_feedforward, init_layernorm, init_peg,
                     layernorm, peg_residual)
from .taps import NULL_TAPS, Taps

Array = jax.Array


def init_transformer(key, cfg: TransformerConfig):
    layers = []
    for _ in range(cfg.depth):
        key, k_peg, k_attn, k_cross, k_ff = jax.random.split(key, 5)
        if cfg.moe_experts > 0:
            from ..parallel.moe import init_moe_ff
            ff = init_moe_ff(k_ff, cfg.dim, cfg.ff_inner_dim, cfg.moe_experts)
        else:
            ff = init_feedforward(k_ff, cfg.dim, cfg.ff_inner_dim)
        layer = {
            "self_attn": init_attention(k_attn, cfg.self_attn()),
            "ff": ff,
        }
        if cfg.peg:
            layer["peg"] = init_peg(k_peg, cfg.dim)
        if cfg.has_cross_attn:
            layer["cross_attn"] = init_attention(k_cross, cfg.cross_attn())
        layers.append(layer)
    return {"layers": layers, "norm_out": init_layernorm(cfg.dim, bias=False)}


class TransformerAux(NamedTuple):
    self_attn: Optional[Tuple[Array, ...]]   # per-layer pre-dropout weights
    cross_attn: Optional[Tuple[Array, ...]]
    # summed GShard load-balance loss over MoE layers (None when dense);
    # add cfg-weighted to the task loss when training an MoE stack
    moe_aux: Optional[Array] = None


def transformer(params, cfg: TransformerConfig, x: Array, *,
                video_shape: Optional[Tuple[int, int, int, int]] = None,
                attn_bias: Optional[Array] = None,
                context: Optional[Array] = None,
                self_attn_mask: Optional[Array] = None,
                cross_attn_context_mask: Optional[Array] = None,
                return_weights: bool = False,
                taps: Taps = NULL_TAPS,
                scope: str = "",
                rng: Optional[Array] = None,
                deterministic: bool = True,
                self_attn_block: Optional[int] = None,
                self_attn_bias_fn=None):
    """Returns (out, TransformerAux). Tap points per layer i:
    {scope}{i}.attn_out, {scope}{i}.cross_attn_out, {scope}{i}.ff_out
    (block outputs pre-residual, matching the reference hook placement,
    visualizations.py:153-218).

    self_attn_block / self_attn_bias_fn: route self-attention through the
    query-row-block path (ops/attention_blockwise.py
    blockwise_cosine_attention_qrows) with the additive bias streamed as
    ROW stripes per query block — self_attn_bias_fn maps a token row start
    to the [heads, self_attn_block, n] stripe. For long token grids
    (MaskGit's 6,464 tokens) where the dense [heads, n, n] scores/bias are
    the memory wall; per-stripe softmax is FULL-row, so outputs equal the
    dense path exactly (the kv-block online-softmax variant's full-length
    carries cost ~70% of CTGenerate device time). Self-attention weights
    are not observable on this path, so it requires return_weights=False,
    no self-attention taps, and no mask (asserted — never a silent
    semantics change). Cross-attention (short context) stays dense."""
    self_weights = []
    cross_weights = []

    if self_attn_block is not None:
        assert self_attn_mask is None, \
            "blockwise self-attention does not support a key-padding mask"
        assert not return_weights, \
            "self-attention weights are not observable blockwise"
    else:
        assert self_attn_bias_fn is None, \
            "self_attn_bias_fn without self_attn_block would silently drop " \
            "the positional bias (the dense path only reads attn_bias)"

    # per-layer remat for training (no weight/tap outputs to preserve)
    use_remat = (cfg.remat and not return_weights and taps is NULL_TAPS
                 and taps.capture_all is False)

    def self_attend(layer, x, r_attn, want_w, residual):
        if self_attn_block is not None:
            if want_w:
                raise ValueError(
                    "self-attention weights requested (taps) on the "
                    "blockwise path — they are not observable there")
            from .attention_blockwise import blockwise_cosine_attention_qrows
            out = blockwise_cosine_attention_qrows(
                layer["self_attn"], cfg.self_attn(), x,
                q_block=self_attn_block, attn_bias=attn_bias,
                bias_row_fn=self_attn_bias_fn, deterministic=deterministic,
                residual=residual)
            return out, None
        return attention(
            layer["self_attn"], cfg.self_attn(), x,
            attn_bias=attn_bias, mask=self_attn_mask, return_weights=want_w,
            rng=r_attn, deterministic=deterministic, residual=residual)

    def apply_ff(layer, x, r_ff, residual):
        """(out, aux_or_None): dense GEGLU FF or MoE routed FF."""
        if cfg.moe_experts > 0:
            from ..parallel.moe import moe_feedforward
            return moe_feedforward(
                layer["ff"], x, top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                dropout_rate=cfg.ff_dropout, rng=r_ff,
                deterministic=deterministic, residual=residual)
        return feedforward(layer["ff"], x, dropout_rate=cfg.ff_dropout,
                           rng=r_ff, deterministic=deterministic,
                           residual=residual), None

    moe_auxes = []

    def plain_layer(layer, x, r_attn, r_cross, r_ff):
        # residual=True folds the +x into each fused kernel's output write
        # (a separate XLA add is an extra full-HBM pass per block)
        if cfg.peg:
            x = peg_residual(layer["peg"], x, video_shape, causal=cfg.peg_causal,
                             use_pallas=cfg.peg_pallas or None)
        x, _ = self_attend(layer, x, r_attn, False, True)
        if cfg.has_cross_attn and context is not None:
            x, _ = attention(
                layer["cross_attn"], cfg.cross_attn(), x, context=context,
                mask=cross_attn_context_mask, return_weights=False,
                rng=r_cross, deterministic=deterministic, residual=True)
        out, aux = apply_ff(layer, x, r_ff, True)
        return (out, aux) if cfg.moe_experts > 0 else out

    if use_remat:
        remat_layer = jax.checkpoint(plain_layer,
                                     static_argnums=())
        for layer in params["layers"]:
            if rng is not None:
                rng, r_attn, r_cross, r_ff = jax.random.split(rng, 4)
            else:
                r_attn = r_cross = r_ff = None
            x = remat_layer(layer, x, r_attn, r_cross, r_ff)
            if cfg.moe_experts > 0:
                x, aux = x
                moe_auxes.append(aux)
        return layernorm(params["norm_out"], x), TransformerAux(
            None, None,
            sum(moe_auxes) if moe_auxes else None)

    for i, layer in enumerate(params["layers"]):
        if cfg.peg:
            x = peg_residual(layer["peg"], x, video_shape, causal=cfg.peg_causal,
                             use_pallas=cfg.peg_pallas or None)

        if rng is not None:
            rng, r_attn, r_cross, r_ff = jax.random.split(rng, 4)
        else:
            r_attn = r_cross = r_ff = None

        want_w = return_weights or taps.wants(f"{scope}{i}.attn_weights")
        # the pre-residual block output is an attribution contract point
        # (capture AND injection); fuse the residual only when nothing
        # observes it
        tapped = (f"{scope}{i}.attn_out" in taps.inject
                  or taps.wants(f"{scope}{i}.attn_out"))
        attn_out, w = self_attend(layer, x, r_attn, want_w,
                                  not tapped)
        if w is not None:
            w = taps.tap(f"{scope}{i}.attn_weights", w)
        if return_weights:
            self_weights.append(w)
        if tapped:
            attn_out = taps.tap(f"{scope}{i}.attn_out", attn_out)
            x = attn_out + x
        else:
            x = attn_out

        if cfg.has_cross_attn and context is not None:
            want_cw = return_weights or taps.wants(f"{scope}{i}.cross_attn_weights")
            cross_tapped = (f"{scope}{i}.cross_attn_out" in taps.inject
                            or taps.wants(f"{scope}{i}.cross_attn_out"))
            cross_out, cw = attention(
                layer["cross_attn"], cfg.cross_attn(), x,
                context=context, mask=cross_attn_context_mask,
                return_weights=want_cw, rng=r_cross,
                deterministic=deterministic, residual=not cross_tapped)
            if cw is not None:
                cw = taps.tap(f"{scope}{i}.cross_attn_weights", cw)
            if return_weights:
                cross_weights.append(cw)
            if cross_tapped:
                cross_out = taps.tap(f"{scope}{i}.cross_attn_out", cross_out)
                x = cross_out + x
            else:
                x = cross_out

        ff_tapped = (f"{scope}{i}.ff_out" in taps.inject
                     or taps.wants(f"{scope}{i}.ff_out"))
        ff_out, ff_aux = apply_ff(layer, x, r_ff, not ff_tapped)
        if ff_aux is not None:
            moe_auxes.append(ff_aux)
        if ff_tapped:
            ff_out = taps.tap(f"{scope}{i}.ff_out", ff_out)
            x = ff_out + x
        else:
            x = ff_out

    out = layernorm(params["norm_out"], x)
    aux = TransformerAux(
        self_attn=tuple(self_weights) if return_weights else None,
        cross_attn=tuple(cross_weights) if (return_weights and cross_weights) else None,
        moe_aux=sum(moe_auxes) if moe_auxes else None)
    return out, aux

"""Post-training W8A8 quantization of the CT-ViT GEGLU feed-forwards.

`quantize_ctclip_ff(params)` returns a NEW param tree in which every dense
FF block of the visual transformer (spatial + temporal stacks) carries
int8 weights + fp32 per-column scales instead of the fp `proj_in`/
`proj_out` matrices. `ops.layers.feedforward` detects the quantized leaf
names and routes through the fused int8 kernel (ops/pallas_ff_int8.py) —
nothing else in the model changes, so `zeroshot_probs`/`ctclip_apply`
work on the quantized tree unmodified.

Why only the FF: the three FF matmuls are ~47 ms of the ~148 ms flagship
zero-shot program and already run at ~90 % of the v5e bf16 MXU peak, so
they were the only candidate for the MXU's nominal 2x int8 rate.
Attention score/PV contractions are dh=32 occupancy-bound (not
rate-bound), VQ nearest-neighbour must keep exact argmin semantics, and
the text tower is a rounding error in the zero-shot budget. NOTE the
measured on-chip result (pallas_ff_int8.py module doc): the int8 kernel
is only ~7 % faster than bf16 in isolation (Mosaic's int8 dot is not
double-rate here) — quantization buys weight memory (2x vs bf16) plus a
within-noise rate margin, not the nominal 2x throughput.

Serving-only: the quantized tree must never be trained or differentiated
(the int8 kernel raises under AD). The reference has no quantized path
(it serves fp16 autocast, CTClipTrainer.py:62-69); this is a beyond-parity
deployment feature.
"""

from __future__ import annotations

from typing import Any, Dict

from .pallas_ff_int8 import quantize_weight_int8


def quantize_ff_params(ff: Dict[str, Any]) -> Dict[str, Any]:
    """One dense-FF param dict {norm, proj_in, proj_out} -> quantized form
    {norm, wv_q, wg_q, w2_q, sv, sg, s2}."""
    w_in = ff["proj_in"]["w"]
    inner = w_in.shape[1] // 2
    wv_q, sv = quantize_weight_int8(w_in[:, :inner])
    wg_q, sg = quantize_weight_int8(w_in[:, inner:])
    w2_q, s2 = quantize_weight_int8(ff["proj_out"]["w"])
    return {"norm": ff["norm"], "wv_q": wv_q, "wg_q": wg_q, "w2_q": w2_q,
            "sv": sv, "sg": sg, "s2": s2}


def is_quantized_ff(ff: Dict[str, Any]) -> bool:
    return "wv_q" in ff


def quantize_transformer_ff(stack: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every dense FF in an init_transformer param dict. MoE FF
    stacks (expert-stacked leaves, parallel/moe.py) are left untouched."""
    layers = []
    for layer in stack["layers"]:
        layer = dict(layer)
        if "proj_in" in layer["ff"]:          # dense GEGLU FF only
            layer["ff"] = quantize_ff_params(layer["ff"])
        layers.append(layer)
    out = dict(stack)
    out["layers"] = layers
    return out


def quantize_ctvit_ff(params: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(params)
    out["spatial"] = quantize_transformer_ff(params["spatial"])
    out["temporal"] = quantize_transformer_ff(params["temporal"])
    return out


def quantize_ctclip_ff(params: Dict[str, Any]) -> Dict[str, Any]:
    """CTCLIP param tree -> same tree with the visual transformer's FFs
    quantized W8A8. Text tower, projections, VQ and attention stay fp."""
    out = dict(params)
    out["visual_transformer"] = quantize_ctvit_ff(params["visual_transformer"])
    return out

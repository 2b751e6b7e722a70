"""Torch oracles for numerical-parity tests.

These are *functional* torch re-derivations of the reference semantics
(cited per function into /root/reference), operating directly on the JAX
param pytrees (converted to torch tensors). They exist only to pin our JAX
ops to the reference math on CPU; they are not part of the framework.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def layernorm_oracle(params, x, bias):
    """reference attention.py:27-34 (bias-frozen) / torch nn.LayerNorm."""
    beta = t(params["beta"]) if bias else torch.zeros_like(t(params["gamma"]))
    return F.layer_norm(t(x), x.shape[-1:], t(params["gamma"]), beta)


def feedforward_oracle(params, x):
    """reference attention.py:38-51: LN -> Linear -> GEGLU -> Linear."""
    h = F.layer_norm(t(x), x.shape[-1:], t(params["norm"]["gamma"]),
                     t(params["norm"]["beta"]))
    h = h @ t(params["proj_in"]["w"])
    value, gate = h.chunk(2, dim=-1)
    h = F.gelu(gate) * value
    return h @ t(params["proj_out"]["w"])


def peg_oracle(params, x, video_shape, causal):
    """reference attention.py:55-83: depthwise Conv3d k=3, causal frame pad."""
    b, tt, hh, ww = video_shape
    dim = x.shape[-1]
    v = t(x).reshape(b, tt, hh, ww, dim).permute(0, 4, 1, 2, 3)  # NCDHW
    frame_pad = (2, 0) if causal else (1, 1)
    v = F.pad(v, (1, 1, 1, 1, *frame_pad), value=0.0)
    # our kernel is DHWIO with I=1 -> torch wants (out_c, 1, kD, kH, kW)
    w = t(params["w"]).permute(4, 3, 0, 1, 2)
    out = F.conv3d(v, w, bias=t(params["b"]), groups=dim)
    out = out.permute(0, 2, 3, 4, 1)
    return out.reshape(x.shape)


def cpb_oracle(params, dimensions, log_dist=True):
    """reference attention.py:230-277: MLP over signed-log relative coords."""
    positions = [torch.arange(d, dtype=torch.float32) for d in dimensions]
    grid = torch.stack(torch.meshgrid(*positions, indexing="ij"))
    grid = grid.reshape(len(dimensions), -1).T
    rel = grid[:, None, :] - grid[None, :, :]
    if log_dist:
        rel = torch.sign(rel) * torch.log(rel.abs() + 1)
    h = rel
    n = len(params["net"])
    for i, lp in enumerate(params["net"]):
        h = h @ t(lp["w"]) + t(lp["b"])
        if i < n - 1:
            h = F.leaky_relu(h, 0.1)
    return h.permute(2, 0, 1)


def alibi_oracle(heads, i, j):
    """reference attention.py:186-228."""
    def pow2(n):
        start = 2 ** (-2 ** -(math.log2(n) - 3))
        return [start * start ** k for k in range(n)]
    if math.log2(heads).is_integer():
        slopes = pow2(heads)
    else:
        c = 2 ** math.floor(math.log2(heads))
        slopes = pow2(c) + pow2(2 * c)[0::2][: heads - c]
    slopes = torch.tensor(slopes).view(heads, 1, 1)
    i_ar = torch.arange(j - i, j)
    j_ar = torch.arange(j)
    bias = -torch.abs(j_ar.view(1, 1, j) - i_ar.view(1, i, 1)).float()
    return bias * slopes


def attention_oracle(params, cfg, x, mask=None, context=None, attn_bias=None):
    """reference attention.py:126-182 (cosine-sim attention).
    Returns (out, pre-dropout weights)."""
    x = t(x)
    b = x.shape[0]
    h, dh = cfg.heads, cfg.dim_head

    def ln(p, v):
        beta = t(p["beta"]) if "beta" in p else torch.zeros(v.shape[-1])
        return F.layer_norm(v, v.shape[-1:], t(p["gamma"]), beta)

    if context is not None:
        context = t(context)
        if cfg.norm_context:
            context = ln(params["context_norm"], context)
    # reference attention.py:138-140: kv_input captured BEFORE x = norm(x)
    kv_input = context if context is not None else x
    xn = ln(params["norm"], x)

    q = xn @ t(params["to_q"]["w"])
    k, v = (kv_input @ t(params["to_kv"]["w"])).chunk(2, dim=-1)
    q, k, v = [z.reshape(b, -1, h, dh).permute(0, 2, 1, 3) for z in (q, k, v)]

    if cfg.num_null_kv > 0:
        null = t(params["null_kv"]).reshape(h, cfg.num_null_kv, 2, dh)
        nk = null[:, :, 0].unsqueeze(0).expand(b, -1, -1, -1)
        nv = null[:, :, 1].unsqueeze(0).expand(b, -1, -1, -1)
        k = torch.cat([nk, k], dim=-2)
        v = torch.cat([nv, v], dim=-2)

    q = F.normalize(q, dim=-1) * t(params["q_scale"])
    k = F.normalize(k, dim=-1) * t(params["k_scale"])
    sim = torch.einsum("bhid,bhjd->bhij", q, k) * cfg.scale
    i, j = sim.shape[-2:]

    if attn_bias is not None:
        ab = F.pad(t(attn_bias), (cfg.num_null_kv, 0), value=0.0)
        sim = sim + ab
    if mask is not None:
        m = F.pad(torch.from_numpy(np.asarray(mask)), (cfg.num_null_kv, 0), value=True)
        sim = sim.masked_fill(~m.view(b, 1, 1, -1), -torch.finfo(sim.dtype).max)
    if cfg.causal:
        sim = sim + alibi_oracle(h, i, j)
        cmask = torch.ones((i, j), dtype=torch.bool).triu(j - i + 1)
        sim = sim.masked_fill(cmask, -torch.finfo(sim.dtype).max)

    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.permute(0, 2, 1, 3).reshape(b, -1, h * dh)
    return out @ t(params["to_out"]["w"]), attn


def to_np(pytree):
    import jax
    return jax.tree.map(lambda a: np.asarray(a), pytree)

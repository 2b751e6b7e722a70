"""Checkpointing and torch->JAX weight conversion.

Two jobs:

1. Native train-state checkpoints. The reference saves only
   `{"model": state_dict, "optim": state_dict}` on rank 0 with no step
   counter or RNG state (reference CTClipTrainer.py:136-145), so mid-epoch
   resume is impossible. Here a checkpoint is the full TrainState
   (params + opt state + step + PRNG key), serialized with
   flax.serialization msgpack.

2. Converters from the reference's torch checkpoints (`ctclip_v2.pt`,
   HF CXR-BERT / T5) into our param pytrees, including the naming quirks
   (custom LayerNorm gamma/beta buffers, Sequential indices, VQ private
   `_codebook` buffers).

torch is imported lazily — it is only needed on the conversion path.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..config import BertConfig, CTCLIPConfig, CTViTConfig, MaskGitConfig, T5EncoderConfig
from ..ops.vq import VQState


# ---------------------------------------------------------------------------
# native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path, state) -> None:
    """Atomic: serialize to a sibling temp file, then rename — a crash or
    preemption mid-write can never corrupt the previous checkpoint (rename
    is atomic on POSIX; the reference's torch.save has the same
    torn-write exposure, CTClipTrainer.py:136)."""
    from flax import serialization
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(serialization.to_bytes(state))
    tmp.replace(path)


def load_checkpoint(path, template):
    """Restore into the structure of `template` (same pytree as saved)."""
    from flax import serialization
    return serialization.from_bytes(template, pathlib.Path(path).read_bytes())


def _pack_empty(x):
    # orbax refuses zero-size arrays (disabled null_kv leaves are [0, ...]);
    # swap in a scalar placeholder, restore swaps the template leaf back
    if hasattr(x, "size") and x.size == 0:
        return np.zeros((), np.int8)
    return x


def save_checkpoint_sharded(path, state) -> None:
    """Scalable alternative to `save_checkpoint`: every process writes its
    own array shards in parallel via orbax/TensorStore, so no host ever
    materializes the full state (the msgpack path gathers everything onto
    process 0 — fine single-host, impossible once params + Adam moments
    outgrow host RAM). Writes a DIRECTORY, not a file. In multi-process
    runs ALL processes must call this (it is a collective), unlike the
    rank-0-gated msgpack save."""
    import jax
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(_pack_empty, state), force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_checkpoint_sharded(path, template):
    """Restore a `save_checkpoint_sharded` directory into the structure AND
    shardings of `template`: each leaf comes back placed like the template's
    (sharded jax.Arrays restore shard-by-shard on their own devices —
    resharding across a different mesh works, TensorStore reads the needed
    slices). `template` may be the live TrainState."""
    import jax
    import orbax.checkpoint as ocp

    packed = jax.tree.map(_pack_empty, template)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None))
        if isinstance(x, jax.Array) else x, packed)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(pathlib.Path(path).absolute(), abstract)
    ckptr.close()
    return jax.tree.map(
        lambda r, t: t if (hasattr(t, "size") and t.size == 0) else r,
        restored, template)


# ---------------------------------------------------------------------------
# torch -> jax conversion helpers
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd, prefix, bias=True) -> Dict[str, Any]:
    """torch nn.Linear stores (out, in); we store (in, out)."""
    p = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _ln(sd, prefix, torch_names=("weight", "bias")) -> Dict[str, Any]:
    g, b = torch_names
    p = {"gamma": jnp.asarray(_np(sd[f"{prefix}.{g}"]))}
    if f"{prefix}.{b}" in sd:
        p["beta"] = jnp.asarray(_np(sd[f"{prefix}.{b}"]))
    return p


def _ln_frozen(sd, prefix) -> Dict[str, Any]:
    """Reference custom LayerNorm: learned `gamma`, zero `beta` buffer
    (reference attention.py:27-34). We drop the frozen beta."""
    return {"gamma": jnp.asarray(_np(sd[f"{prefix}.gamma"]))}


# ---------------------------------------------------------------------------
# BERT (HF BertModel state_dict -> models/bert.py pytree)
# ---------------------------------------------------------------------------

def convert_bert(sd: Dict[str, Any], cfg: BertConfig, prefix: str = ""):
    def key(k):
        return f"{prefix}{k}"

    params = {
        "embeddings": {
            "word": jnp.asarray(_np(sd[key("embeddings.word_embeddings.weight")])),
            "position": jnp.asarray(_np(sd[key("embeddings.position_embeddings.weight")])),
            "token_type": jnp.asarray(_np(sd[key("embeddings.token_type_embeddings.weight")])),
            "ln": _ln(sd, key("embeddings.LayerNorm")),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lp = key(f"encoder.layer.{i}")
        params["layers"].append({
            "q": _lin(sd, f"{lp}.attention.self.query"),
            "k": _lin(sd, f"{lp}.attention.self.key"),
            "v": _lin(sd, f"{lp}.attention.self.value"),
            "attn_out": _lin(sd, f"{lp}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{lp}.attention.output.LayerNorm"),
            "ffn_in": _lin(sd, f"{lp}.intermediate.dense"),
            "ffn_out": _lin(sd, f"{lp}.output.dense"),
            "ffn_ln": _ln(sd, f"{lp}.output.LayerNorm"),
        })
    return params


# ---------------------------------------------------------------------------
# reference Attention / Transformer / CTViT naming
# ---------------------------------------------------------------------------

def _convert_attention(sd, prefix, norm_context: bool):
    p = {
        "norm": _ln_frozen(sd, f"{prefix}.norm"),
        "to_q": _lin(sd, f"{prefix}.to_q", bias=False),
        "to_kv": _lin(sd, f"{prefix}.to_kv", bias=False),
        "to_out": _lin(sd, f"{prefix}.to_out", bias=False),
        "q_scale": jnp.asarray(_np(sd[f"{prefix}.q_scale"])),
        "k_scale": jnp.asarray(_np(sd[f"{prefix}.k_scale"])),
        "null_kv": jnp.asarray(_np(sd[f"{prefix}.null_kv"])),
    }
    if norm_context and f"{prefix}.context_norm.gamma" in sd:
        p["context_norm"] = _ln_frozen(sd, f"{prefix}.context_norm")
    return p


def _convert_ff(sd, prefix):
    # reference FF is nn.Sequential: 0 LayerNorm, 1 Linear, 2 GEGLU,
    # 3 Dropout, 4 Linear (reference attention.py:43-51)
    return {
        "norm": _ln(sd, f"{prefix}.0"),
        "proj_in": _lin(sd, f"{prefix}.1", bias=False),
        "proj_out": _lin(sd, f"{prefix}.4", bias=False),
    }


def _convert_peg(sd, prefix):
    # torch Conv3d weight (out, in/groups=1, kD, kH, kW) -> DHWIO
    w = _np(sd[f"{prefix}.dsconv.weight"])          # [dim, 1, 3, 3, 3]
    w = np.transpose(w, (2, 3, 4, 1, 0))            # [3, 3, 3, 1, dim]
    return {"w": jnp.asarray(w), "b": jnp.asarray(_np(sd[f"{prefix}.dsconv.bias"]))}


def _convert_transformer(sd, prefix, depth, peg, has_cross):
    layers = []
    for i in range(depth):
        lp = f"{prefix}.layers.{i}"
        layer = {
            # ModuleList indices: 0 PEG, 1 self-attn, 2 cross-attn, 3 FF
            # (reference attention.py:302-308)
            "self_attn": _convert_attention(sd, f"{lp}.1", norm_context=True),
            "ff": _convert_ff(sd, f"{lp}.3"),
        }
        if peg:
            layer["peg"] = _convert_peg(sd, f"{lp}.0")
        if has_cross:
            layer["cross_attn"] = _convert_attention(sd, f"{lp}.2", norm_context=True)
        layers.append(layer)
    return {"layers": layers, "norm_out": _ln_frozen(sd, f"{prefix}.norm_out")}


def _convert_cpb(sd, prefix, layers=2):
    # ModuleList: net.0 = Sequential(Linear, LeakyReLU), ..., net.last = Linear
    net = [_lin(sd, f"{prefix}.net.0.0")]
    for i in range(1, layers):
        net.append(_lin(sd, f"{prefix}.net.{i}.0"))
    net.append(_lin(sd, f"{prefix}.net.{layers}"))
    return {"net": net}


def _convert_vq(sd, prefix, codebook_size, dim) -> VQState:
    """vector_quantize_pytorch buffers: `_codebook.embed` (possibly with a
    leading num_codebooks=1 axis), `_codebook.embed_avg`, `_codebook.cluster_size`."""
    def get(name, default=None):
        for cand in (f"{prefix}._codebook.{name}", f"{prefix}.codebook.{name}"):
            if cand in sd:
                a = _np(sd[cand])
                return a.reshape(-1, dim) if a.ndim == 3 else a
        return default

    embed = get("embed")
    if embed is None:
        raise KeyError(f"no VQ codebook under {prefix}")
    embed_avg = get("embed_avg", embed.copy())
    cluster = get("cluster_size", np.zeros((codebook_size,), np.float32))
    cluster = np.asarray(cluster, np.float32).reshape(-1)[:codebook_size]
    return VQState(embed=jnp.asarray(embed), embed_avg=jnp.asarray(embed_avg),
                   cluster_size=jnp.asarray(cluster))


def convert_ctvit(sd: Dict[str, Any], cfg: CTViTConfig, prefix: str = ""):
    def key(k):
        return f"{prefix}{k}"

    params = {
        "spatial_rel_pos_bias": _convert_cpb(sd, key("spatial_rel_pos_bias")),
        "to_patch_emb": {
            # Sequential: 0 Rearrange, 1 LN, 2 Linear, 3 LN (reference ctvit.py:44-52)
            "norm_in": _ln(sd, key("to_patch_emb.1")),
            "proj": _lin(sd, key("to_patch_emb.2")),
            "norm_out": _ln(sd, key("to_patch_emb.3")),
        },
        "spatial": _convert_transformer(
            sd, key("enc_spatial_transformer"), cfg.spatial_depth,
            peg=True, has_cross=False),
        "temporal": _convert_transformer(
            sd, key("enc_temporal_transformer"), cfg.temporal_depth,
            peg=True, has_cross=False),
        "vq": _convert_vq(sd, key("vq"), cfg.codebook_size, cfg.dim),
    }
    if f"{prefix}to_patch_emb_first_frame.1.weight" in sd:
        params["to_patch_emb_first_frame"] = {
            "norm_in": _ln(sd, key("to_patch_emb_first_frame.1")),
            "proj": _lin(sd, key("to_patch_emb_first_frame.2")),
            "norm_out": _ln(sd, key("to_patch_emb_first_frame.3")),
        }
    return params


def convert_ctclip(sd: Dict[str, Any], cfg: CTCLIPConfig):
    """Convert a reference CTCLIP state_dict (e.g. `ctclip_v2.pt`, possibly
    wrapped as {"model": ...}, reference CTClipTrainer.py:139-143)."""
    if "model" in sd and not any(k.startswith("t") for k in list(sd)[:3]):
        sd = sd["model"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return {
        "text_transformer": convert_bert(sd, cfg.bert, prefix="text_transformer."),
        "visual_transformer": convert_ctvit(sd, cfg.ctvit, prefix="visual_transformer."),
        "to_text_latent": _lin(sd, "to_text_latent", bias=False),
        "to_visual_latent": _lin(sd, "to_visual_latent", bias=False),
        "temperature": jnp.asarray(_np(sd["temperature"]).reshape(())),
    }


def convert_t5(sd: Dict[str, Any], cfg: T5EncoderConfig, prefix: str = ""):
    """HF T5EncoderModel state_dict -> models/t5.py pytree."""
    def key(k):
        return f"{prefix}{k}"

    params = {
        "shared": jnp.asarray(_np(sd[key("shared.weight")])),
        "rel_bias": jnp.asarray(_np(sd[key(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")])),
        "final_norm": jnp.asarray(_np(sd[key("encoder.final_layer_norm.weight")])),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        bp = key(f"encoder.block.{i}")
        params["blocks"].append({
            "attn_norm": jnp.asarray(_np(sd[f"{bp}.layer.0.layer_norm.weight"])),
            "q": _lin(sd, f"{bp}.layer.0.SelfAttention.q", bias=False),
            "k": _lin(sd, f"{bp}.layer.0.SelfAttention.k", bias=False),
            "v": _lin(sd, f"{bp}.layer.0.SelfAttention.v", bias=False),
            "o": _lin(sd, f"{bp}.layer.0.SelfAttention.o", bias=False),
            "ff_norm": jnp.asarray(_np(sd[f"{bp}.layer.1.layer_norm.weight"])),
            "wi_0": _lin(sd, f"{bp}.layer.1.DenseReluDense.wi_0", bias=False),
            "wi_1": _lin(sd, f"{bp}.layer.1.DenseReluDense.wi_1", bias=False),
            "wo": _lin(sd, f"{bp}.layer.1.DenseReluDense.wo", bias=False),
        })
    return params


def convert_maskgit(sd: Dict[str, Any], cfg: MaskGitConfig, prefix: str = ""):
    """Reference MaskGit state_dict (maskgit.py:21-38) -> models/maskgit.py."""
    def key(k):
        return f"{prefix}{k}"

    return {
        "token_emb": jnp.asarray(_np(sd[key("token_emb.weight")])),
        "pos_emb": jnp.asarray(_np(sd[key("pos_emb.weight")])),
        "continuous_pos_bias": _convert_cpb(sd, key("continuous_pos_bias")),
        "transformer": _convert_transformer(
            sd, key("transformer"), cfg.depth, peg=True, has_cross=True),
        "to_logits": _lin(sd, key("to_logits"), bias=True),
    }


def convert_ctgenerate(sd: Dict[str, Any], cfg, t5_sd: Dict[str, Any] = None):
    """Reference `ctgenerate_filtered.pt` (ctvit.* + maskgit.*; the T5 tower
    lives in the HF checkpoint, passed separately as `t5_sd`)."""
    if "model" in sd:
        sd = sd["model"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params = {
        "ctvit": convert_ctvit(sd, cfg.ctvit, prefix="ctvit."),
        "maskgit": convert_maskgit(sd, cfg.maskgit, prefix="maskgit."),
    }
    if t5_sd is not None:
        params["t5"] = convert_t5(t5_sd, cfg.t5)
    return params


def load_ctclip_params(checkpoint_path: str, cfg):
    """CTCLIP params from either checkpoint format — the one loader the
    inference/export CLIs share: a torch `.pt` goes through the state_dict
    converter; a native msgpack restores into a fresh-init template, with
    the TrainState-style `{"params": ...}` wrapper unwrapped."""
    import jax

    checkpoint_path = str(checkpoint_path)
    if checkpoint_path.endswith(".pt"):
        return convert_ctclip(load_torch_checkpoint(checkpoint_path), cfg)
    from ..models.ctclip import init_ctclip
    template = init_ctclip(jax.random.PRNGKey(0), cfg)
    params = load_checkpoint(checkpoint_path, template)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    return params


def load_torch_checkpoint(path) -> Dict[str, Any]:
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)

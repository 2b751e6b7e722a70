"""Single dataclass config tree.

The reference has no config system — all settings are hard-coded constructor
kwargs in entry scripts (reference src/train_ctclip.py:19-58,
src/inference_ctclip.py:21-57) and module-level constants duplicated four
times (PATHOLOGIES in CTClipTrainer.py:23-30, CTClipInference.py:25-32,
visualizations.py:42-49, CTGenerateInference.py:25-32). Here everything is a
frozen dataclass with the reference values as defaults, so configs are
hashable and can be closed over by jit without retracing.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

# The 18-pathology label set (reference CTClipTrainer.py:23-30).
PATHOLOGIES: Tuple[str, ...] = (
    "Medical material",
    "Arterial wall calcification",
    "Cardiomegaly",
    "Pericardial effusion",
    "Coronary artery wall calcification",
    "Hiatal hernia",
    "Lymphadenopathy",
    "Emphysema",
    "Atelectasis",
    "Lung nodule",
    "Lung opacity",
    "Pulmonary fibrotic sequela",
    "Pleural effusion",
    "Mosaic attenuation pattern",
    "Peribronchial thickening",
    "Consolidation",
    "Bronchiectasis",
    "Interlobular septal thickening",
)

# Text prompts segmentation experiments use (reference visualizations.py:58-63).
SEGMENTABLE_TERMS: Tuple[str, ...] = (
    "lymph nodes", "pleural effusion", "ground glass",
    "lung parenchyma", "right lobe", "left lobe", "upper lobe",
    "lower lobe", "mediastinal mass", "lung nodules", "bone lesion",
    "right lung", "left lung", "abdominal organs",
)


@dataclass(frozen=True)
class AttentionConfig:
    """Cosine-sim (QK-normalized) attention (reference attention.py:87-182)."""
    dim: int = 512
    dim_context: Optional[int] = None  # None -> dim
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    num_null_kv: int = 0
    norm_context: bool = True
    dropout: float = 0.0
    scale: float = 8.0  # fixed post-l2norm scale (reference attention.py:98)

    @property
    def inner_dim(self) -> int:
        return self.dim_head * self.heads

    @property
    def context_dim(self) -> int:
        return self.dim_context if self.dim_context is not None else self.dim


@dataclass(frozen=True)
class TransformerConfig:
    """Transformer block stack (reference attention.py:281-336)."""
    dim: int = 512
    depth: int = 4
    dim_context: Optional[int] = None
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    peg: bool = False
    peg_causal: bool = False
    # route the PEG depthwise conv through the fused Pallas stencil
    # (ops/pallas_peg.py) instead of the XLA conv. The stencil reads the
    # row-major video form DIRECTLY (a free reshape of the attention
    # kernels' flat [rows, dim] output), skipping the {4,0,3,2,1} layout
    # transposes XLA inserts around its conv — measured in-situ at flagship
    # B=16: 25.9 vs 27.1 ms per apply+consumer, bit-identical output.
    # Inference-path only (the training backward keeps the mesh-safe
    # custom-VJP formulations in ops/layers.py).
    peg_pallas: bool = False
    attn_num_null_kv: int = 2
    has_cross_attn: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    # rematerialize each layer in backward (jax.checkpoint): trades ~1/3 more
    # FLOPs for O(depth) -> O(1) activation memory — the TPU answer to the
    # reference's fp16-autocast memory ceiling
    remat: bool = False
    # Mixture-of-Experts FF (expert parallelism, parallel/moe.py): >0 swaps
    # every layer's dense GEGLU FF for moe_experts routed experts (top-k
    # routing, GShard dense dispatch). 0 = dense (reference parity).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 2.0

    def self_attn(self) -> AttentionConfig:
        return AttentionConfig(
            dim=self.dim, dim_head=self.dim_head, heads=self.heads,
            causal=self.causal, dropout=self.attn_dropout)

    def cross_attn(self) -> AttentionConfig:
        return AttentionConfig(
            dim=self.dim, dim_head=self.dim_head, dim_context=self.dim_context,
            heads=self.heads, causal=False, num_null_kv=self.attn_num_null_kv,
            dropout=self.attn_dropout)

    @property
    def ff_inner_dim(self) -> int:
        # GEGLU inner dim = int(mult * 2/3 * dim) (reference attention.py:44)
        return int(self.ff_mult * (2.0 / 3.0) * self.dim)


@dataclass(frozen=True)
class CTViTConfig:
    """CT-ViT 3D video tokenizer (reference ctvit.py:9-66).

    Defaults follow the train entry (reference train_ctclip.py:19-29):
    480^2 x 240 volume -> 24x24 spatial x 24 temporal patch grid, dim 512.
    """
    dim: int = 512
    codebook_size: int = 8192
    image_size: int = 480
    patch_size: int = 20
    temporal_patch_size: int = 10
    spatial_depth: int = 4
    temporal_depth: int = 4
    dim_head: int = 32
    heads: int = 8
    channels: int = 1
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    model_type: str = "ctclip"  # or "ctgenerate" (first-frame embed path)
    # VQ (vector_quantize_pytorch.VectorQuantize equivalents, cosine codebook)
    vq_decay: float = 0.8
    vq_eps: float = 1e-5
    # patch-embed implementation: the LN-folded strided-conv formulation is
    # fastest on TPU, but conv lowering is not bit-stable across batching
    # contexts (vmap vs scan-of-vmap), which can flip VQ argmax near ties.
    # Attribution paths — where scores are DIFFERENCED at 1e-2 scale — use
    # the bit-stable matmul formulation (attribution/capture.parity_cfg).
    patch_embed_conv: bool = True
    remat: bool = False  # per-layer remat in the encoders (training memory)
    # serving-path PEG via the fused Pallas stencil (spatial stack only —
    # see TransformerConfig.peg_pallas); off by default
    peg_pallas: bool = False
    # MoE CT-ViT variant: >0 swaps every encoder FF for moe_experts routed
    # experts (expert-parallel over the mesh "model" axis, parallel/moe.py).
    # 0 = dense (reference parity). The stack's load-balance aux loss is
    # surfaced through CTCLIPOutput.moe_aux and weighted into the train loss
    # by TrainConfig.moe_aux_weight.
    moe_experts: int = 0
    moe_top_k: int = 2

    @property
    def patch_height(self) -> int:
        return self.image_size // self.patch_size

    @property
    def patch_width(self) -> int:
        return self.image_size // self.patch_size

    @property
    def patch_dim(self) -> int:
        return self.channels * self.patch_size ** 2 * self.temporal_patch_size

    @property
    def first_frame_patch_dim(self) -> int:
        return self.channels * self.patch_size ** 2

    def spatial_transformer(self) -> TransformerConfig:
        return TransformerConfig(
            dim=self.dim, depth=self.spatial_depth, dim_head=self.dim_head,
            heads=self.heads, attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout, peg=True, peg_causal=True,
            peg_pallas=self.peg_pallas,
            remat=self.remat, moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k)

    def temporal_transformer(self) -> TransformerConfig:
        return TransformerConfig(
            dim=self.dim, depth=self.temporal_depth, dim_head=self.dim_head,
            heads=self.heads, attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout, peg=True, peg_causal=True,
            remat=self.remat, moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k)


@dataclass(frozen=True)
class BertConfig:
    """BERT-style text tower (CXR-BERT-specialized shape).

    The reference consumes HF BertModel directly (reference train_ctclip.py:17,
    ctclip.py:107 takes the CLS hidden state). We re-implement the encoder in
    JAX; weights convert from the HF checkpoint.
    """
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


@dataclass(frozen=True)
class T5EncoderConfig:
    """T5-v1_1-base encoder shape (reference t5.py:8,28-90)."""
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    max_length: int = 256  # tokenizer truncation (reference t5.py:9)


@dataclass(frozen=True)
class MaskGitConfig:
    """MaskGit transformer over CT-ViT codebook ids (reference maskgit.py:5-38)."""
    dim: int = 512
    num_tokens: int = 8192
    max_seq_len: int = 10000
    gradient_shrink_alpha: float = 0.1
    heads: int = 8
    dim_head: int = 64
    depth: int = 6
    dim_context: int = 768
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            dim=self.dim, depth=self.depth, dim_context=self.dim_context,
            dim_head=self.dim_head, heads=self.heads, attn_num_null_kv=2,
            has_cross_attn=True, attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout, peg=True, peg_causal=False)


@dataclass(frozen=True)
class CTCLIPConfig:
    """Dual-tower contrastive model (reference ctclip.py:44-68,
    train_ctclip.py:31-37)."""
    dim_text: int = 768
    dim_image: int = 294912  # 24*24*512 after temporal mean + flatten
    dim_latent: int = 512
    temperature_init: float = 1.0
    ctvit: CTViTConfig = field(default_factory=CTViTConfig)
    bert: BertConfig = field(default_factory=BertConfig)


@dataclass(frozen=True)
class CTGenerateConfig:
    """CT-ViT tokenizer + MaskGit + T5 (reference ctgenerate.py:5-64,
    inference_ctgenerate.py:13-40)."""
    ctvit: CTViTConfig = field(default_factory=lambda: CTViTConfig(
        image_size=128, patch_size=16, temporal_patch_size=2,
        model_type="ctgenerate"))
    maskgit: MaskGitConfig = field(default_factory=MaskGitConfig)
    t5: T5EncoderConfig = field(default_factory=T5EncoderConfig)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. `data` shards the batch (DP); `model` shards
    attention heads / FF hidden / the big visual projection (TP)."""
    data: int = 1
    model: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "model")


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference CTClipTrainer.py:38-59, optimizer.py)."""
    batch_size: int = 1          # per-device
    lr: float = 1.25e-5
    wd: float = 0.0              # wd==0 -> plain Adam (reference optimizer.py:42)
    betas: Tuple[float, float] = (0.9, 0.99)
    eps: float = 1e-8
    max_grad_norm: float = 0.5
    num_epochs: int = 10
    num_save_split: int = 5
    num_train_samples: int = 100
    num_valid_samples: int = 20
    save_best_model: bool = False
    # crash resilience: atomically write last_checkpoint.msgpack every N
    # global steps (0 = off). Pairs with the trainer's epoch-level resume:
    # a killed run restarts from the last periodic save and loses at most
    # the partial epoch. The reference saves only per-epoch on rank 0
    # (CTClipTrainer.py:136-145, 238-244).
    save_every_steps: int = 0
    text_max_length: int = 512   # tokenizer truncation (CTClipTrainer.py:191)
    compute_dtype: str = "bfloat16"  # fp16 autocast in reference -> bf16 on TPU
    seed: int = 42
    # GradCache chunking: split each step's batch into `grad_accum`
    # microbatches while keeping the FULL-batch InfoNCE objective (plain
    # gradient accumulation is invalid for contrastive losses — the sim
    # matrix couples every sample in the batch). 1 = single-pass step.
    grad_accum: int = 1
    # orbax/TensorStore checkpoint directories (every process writes its own
    # shards — collective save, no process-0 full gather) instead of rank-0
    # msgpack files. Required for multi-host states that outgrow host RAM.
    sharded_checkpoints: bool = False
    # weight on the MoE load-balance aux loss (only read when the model has
    # ctvit.moe_experts > 0; the GShard paper's default scale)
    moe_aux_weight: float = 0.01
    # capture a jax.profiler trace of steps [2, 2 + profile_steps) into
    # profile_dir (0 = off). Step 1 is excluded: it carries the compile.
    profile_steps: int = 0
    profile_dir: str = "/tmp/ctclip_trace"
    # LR schedule (both 0 = the reference's constant lr): linear warmup to
    # lr over warmup_steps, then cosine decay over decay_steps down to
    # lr * end_lr_frac (train/optimizer.make_lr_schedule)
    warmup_steps: int = 0
    decay_steps: int = 0
    end_lr_frac: float = 0.0
    # store Adam's first moment in this dtype (e.g. "bfloat16" halves its
    # HBM footprint; nu stays fp32). None = fp32, the reference behavior.
    adam_mu_dtype: Optional[str] = None
    # Fully-sharded data parallelism (ZeRO-3 semantics via GSPMD): params,
    # grads, and Adam moments live sharded over the "data" mesh axis at
    # rest; XLA all-gathers weights where the step needs them and
    # reduce-scatters grads back to the shards. Composes with the "model"
    # (TP) axis. Step math is identical to plain DP (tests/test_fsdp.py).
    fsdp: bool = False


@dataclass(frozen=True)
class PreprocessConfig:
    """CT preprocessing chain (reference preprocess.py:84-151)."""
    target_spacing: Tuple[float, float, float] = (1.5, 0.75, 0.75)  # (z, x, y) mm
    hu_min: float = -1000.0
    hu_max: float = 1000.0
    target_shape_hwd: Tuple[int, int, int] = (480, 480, 240)  # (H, W, D)
    pad_value: float = -1.0
    ctgenerate_shape: Tuple[int, int, int] = (201, 128, 128)  # (D, H, W)


@dataclass(frozen=True)
class OcclusionConfig:
    """Occlusion sensitivity sweep (reference visualizations.py:1029,335-424)."""
    patch_size: Tuple[int, int, int] = (20, 40, 40)
    stride: Tuple[int, int, int] = (10, 20, 20)
    threshold: float = 0.0
    fill_value: float = -1.0
    batch_size: int = 8  # masked forwards evaluated per device batch


def replace(cfg, **kw):
    """dataclasses.replace that works on any frozen config."""
    return dataclasses.replace(cfg, **kw)

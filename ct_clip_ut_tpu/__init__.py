"""ct_clip_ut_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of CT-CLIP-UT: contrastive CT/report pretraining (CTCLIP),
CT-ViT tokenization + MaskGit text-conditioned transformer (CTGenerate),
and a five-method attribution suite (raw attention maps, attention rollout,
integrated gradients, Grad-CAM, occlusion sensitivity) for weakly-supervised
pathology localization in chest CT.

Design principles (not a port of the CUDA/torch reference):
  * functional core — pure apply functions over explicit param pytrees,
    PRNG passed explicitly, all hot paths jittable;
  * structured aux outputs + tap/inject capture instead of torch hooks
    (reference: src/utils/visualizations.py:140-263);
  * SPMD over jax.sharding.Mesh with XLA collectives instead of
    NCCL/Accelerate (reference: src/utils/CTClipTrainer.py:62-69);
  * Pallas TPU kernels for the hot ops (QK-normalized attention,
    VQ codebook lookup);
  * attribution as vmapped batched transforms instead of Python loops
    (reference occlusion: 12,167 serial forwards per scan,
    src/utils/visualizations.py:335-424).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

"""End-to-end quickstart on synthetic data — runs anywhere (CPU or TPU).

Fabricates a tiny CT-RATE-style dataset (NIfTI volumes + reports / metadata /
labels CSVs), trains a toy CTCLIP for two epochs, then runs zero-shot
classification and two attribution methods on the trained weights. Artifacts
(checkpoints, metrics.txt, loss plots, saliency .npy maps) land under
--out-dir exactly as they would in a real run.

This mirrors the real pipeline one-for-one, just smaller: swap the configs
for the flagship defaults (`CTCLIPConfig()`), the hash tokenizer for
`transformers.BertTokenizer` (microsoft/BiomedVLP-CXR-BERT-specialized), and
the synthetic folder for a CT-RATE layout, and you have the reference
workflow (see docs/MIGRATION.md for the CLI equivalents).

    python examples/quickstart.py --out-dir /tmp/ctclip_quickstart
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

# Honor JAX_PLATFORMS even when a sitecustomize pre-imported jax and pinned a
# TPU plugin (the jax.config value wins over os.environ once jax is loaded).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   OcclusionConfig, PreprocessConfig,
                                   TrainConfig)
from ct_clip_ut_tpu.attribution.suite import (AttributionContext,
                                              Visualizations)
from ct_clip_ut_tpu.data import nifti
from ct_clip_ut_tpu.data.datasets import InferenceDataset, TrainDataset
from ct_clip_ut_tpu.data.loader import DataLoader, ShardedSampler
from ct_clip_ut_tpu.infer.zeroshot import CTClipInference
from ct_clip_ut_tpu.train.trainer import CTClipTrainer

# -- toy model: same architecture as the flagship, every dim shrunk ---------
BERT = BertConfig(vocab_size=256, hidden_size=32, num_layers=1, num_heads=4,
                  intermediate_size=64, max_position_embeddings=32)
VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                  temporal_patch_size=8, spatial_depth=1, temporal_depth=1,
                  dim_head=4, heads=4)
CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                    ctvit=VIT, bert=BERT)
PREP = PreprocessConfig(target_shape_hwd=(32, 32, 16))


class HashTokenizer:
    """Deterministic offline stand-in for the CXR-BERT tokenizer.

    Uses crc32, not builtin hash(): hash() is salted per process
    (PYTHONHASHSEED), which would make a saved checkpoint tokenize reports
    differently on reload."""

    def __call__(self, texts, return_tensors="np", padding="max_length",
                 truncation=True, max_length=32):
        import zlib

        if isinstance(texts, str):
            texts = [texts]
        max_length = min(max_length, 32)
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [101] + [zlib.crc32(w.encode()) % 200 + 5
                            for w in t.split()][:max_length - 2] + [102]
            ids[i, :len(toks)] = np.asarray(toks) % 256
            mask[i, :len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def make_synthetic_dataset(root: Path, n_train: int = 4, n_valid: int = 2):
    """CT-RATE-style folder: volumes + reports/metadata/labels CSVs."""
    import pandas as pd

    rs = np.random.RandomState(0)
    findings = ["normal lungs no acute finding", "pleural effusion seen",
                "consolidation right lower lobe", "cardiomegaly noted"]
    for split, n in [("train", n_train), ("valid", n_valid)]:
        vol_dir = root / split / "volumes"
        vol_dir.mkdir(parents=True, exist_ok=True)
        names = []
        for i in range(n):
            name = f"{split}_{i}_a_1.nii.gz"
            nifti.write_nii(vol_dir / name,
                            rs.randint(0, 2000, (24, 24, 20)).astype(np.float32))
            names.append(name)
        pd.DataFrame({
            "VolumeName": names,
            "Findings_EN": [findings[i % len(findings)] for i in range(n)],
            "Impressions_EN": ["." for _ in range(n)],
        }).to_csv(root / split / "reports.csv", index=False)
        pd.DataFrame({
            "VolumeName": names, "RescaleSlope": [1] * n,
            "RescaleIntercept": [-1024] * n,
            "XYSpacing": ["[0.75, 0.75]"] * n, "ZSpacing": [1.5] * n,
        }).to_csv(root / split / "metadata.csv", index=False)
        labels = pd.DataFrame(rs.randint(0, 2, (n, 18)),
                              columns=[f"pathology_{i}" for i in range(18)])
        labels.insert(0, "VolumeName", names)
        labels.to_csv(root / split / "labels.csv", index=False)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-dir", default="/tmp/ctclip_quickstart")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args(argv)

    out = Path(args.out_dir)
    data = out / "data"
    print(f"[1/4] synthesizing dataset under {data}")
    make_synthetic_dataset(data)
    tok = HashTokenizer()

    print("[2/4] training (toy CTCLIP, whole-step jit)")
    train_ds = TrainDataset(data / "train" / "volumes",
                            data / "train" / "reports.csv",
                            data / "train" / "metadata.csv",
                            preprocess_cfg=PREP)
    valid_ds = InferenceDataset(data / "valid" / "volumes",
                                data / "valid" / "reports.csv",
                                data / "valid" / "metadata.csv",
                                data / "valid" / "labels.csv",
                                preprocess_cfg=PREP)
    train_dl = DataLoader(train_ds, batch_size=2, num_workers=2,
                          sampler=ShardedSampler(len(train_ds), shuffle=True))
    valid_dl = DataLoader(
        valid_ds, batch_size=1, num_workers=2, drop_last=False,
        sampler=ShardedSampler(len(valid_ds), shuffle=False, drop_last=False))
    # the eval loop wants (image, text) pairs
    valid_pairs = [(img, txt) for img, txt, *_ in iter(valid_dl)]

    tcfg = TrainConfig(batch_size=2, num_epochs=args.epochs, lr=1e-3,
                       text_max_length=32, num_train_samples=4,
                       num_valid_samples=2, save_best_model=True)
    trainer = CTClipTrainer(CLIP, tcfg, tok, train_dl, valid_pairs,
                            results_folder=str(out / "train"))
    trainer.train()
    params = trainer.state.params
    print(f"      checkpoints + loss plots: {trainer.results_folder}")

    print("[3/4] zero-shot classification (18 prompt pairs per scan)")
    inf = CTClipInference(params, CLIP, tok, valid_dl,
                          results_folder=out / "zeroshot", zero_shot=True,
                          pathologies=[f"pathology_{i}" for i in range(18)])
    metrics, preds, targets = inf.infer()
    print(f"      predictions {preds.shape}, metrics.txt under {out}/zeroshot")

    print("[4/4] attribution (rollout + occlusion) on one scan")
    ctx = AttributionContext(params=params, cfg=CLIP, tokenizer=tok,
                             data=[valid_ds[0]], render_gifs=False,
                             text_max_length=32)
    vis = Visualizations(ctx, out / "attribution")
    occ = OcclusionConfig(patch_size=(8, 16, 16), stride=(8, 16, 16))
    vis.visualize(attention_rollout=True, occlusion={"occ": occ})
    maps = sorted(p.relative_to(out) for p in out.rglob("*.npy"))
    print("      saliency maps:")
    for m in maps:
        print(f"        {m}")
    print(f"done — everything under {out}")


if __name__ == "__main__":
    main()

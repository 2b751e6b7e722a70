"""Build pathology diff embeddings from a labeled report corpus.

Reference: src/notebooks/embedding_arithmetic.ipynb -> the
pathology_diff_embeddings.npy resource consumed by occlusion's text-embeds
bypass. Promoted from a notebook to a CLI.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reports", required=True, help="reports CSV")
    p.add_argument("--labels", required=True, help="labels CSV")
    p.add_argument("--checkpoint", required=True,
                   help="torch ctclip_v2.pt or native .msgpack")
    p.add_argument("--out", default="resources/pathology_diff_embeddings.npy")
    p.add_argument("--tokenizer", default="microsoft/BiomedVLP-CXR-BERT-specialized")
    p.add_argument("--batch-size", type=int, default=32)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np
    import pandas as pd
    from transformers import BertTokenizer

    from ..attribution.embedding_arithmetic import (compute_diff_embeddings,
                                                    save_diff_embeddings)
    from ..config import PATHOLOGIES, CTCLIPConfig, CTViTConfig
    from ..train import checkpoint as ckpt

    model_cfg = CTCLIPConfig(ctvit=CTViTConfig(dim_head=32))
    tokenizer = BertTokenizer.from_pretrained(args.tokenizer, do_lower_case=True)

    if args.checkpoint.endswith(".pt"):
        params = ckpt.convert_ctclip(
            ckpt.load_torch_checkpoint(args.checkpoint), model_cfg)
    else:
        from ..models.ctclip import init_ctclip
        params = ckpt.load_checkpoint(
            args.checkpoint, init_ctclip(jax.random.PRNGKey(0), model_cfg))
    params = jax.device_put(params)

    reports_df = pd.read_csv(args.reports)
    labels_df = pd.read_csv(args.labels)
    merged = reports_df.merge(labels_df, on="VolumeName")
    texts = [(str(r) if not pd.isna(r) else "") +
             (str(i) if not pd.isna(i) else "")
             for r, i in zip(merged.get("Findings_EN", ""),
                             merged.get("Impressions_EN", ""))]
    labels = merged[list(PATHOLOGIES)].values

    embeds = compute_diff_embeddings(params, model_cfg, tokenizer, texts,
                                     labels, batch_size=args.batch_size)
    save_diff_embeddings(embeds, args.out)
    print(f"saved {len(embeds)} pathology diff embeddings to {args.out}")


if __name__ == "__main__":
    main()

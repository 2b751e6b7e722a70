"""Pathology diff-embedding arithmetic.

Reference: src/notebooks/embedding_arithmetic.ipynb (cells 5-7) producing
src/resources/pathology_diff_embeddings.npy — per pathology, the mean BERT
CLS embedding of reports whose label == 1 minus the mean over label == 0.
Consumed by the occlusion text-embeds bypass (reference
visualizations.py:1030-1043, ctclip.py:107). Here it is a proper batched
script instead of a notebook.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATHOLOGIES, CTCLIPConfig
from ..models.bert import bert_cls


def compute_diff_embeddings(params, cfg: CTCLIPConfig, tokenizer,
                            reports: Sequence[str], labels: np.ndarray,
                            pathologies: Sequence[str] = PATHOLOGIES,
                            batch_size: int = 32,
                            max_length: int = 512) -> Dict[str, np.ndarray]:
    """pathology -> 768-d (dim_text) diff embedding over a labeled corpus."""
    labels = np.asarray(labels)
    assert labels.shape == (len(reports), len(pathologies))

    encode = jax.jit(lambda p, ids, mask, tt: bert_cls(
        p["text_transformer"], cfg.bert, ids, mask, tt))

    cls_embeds = []
    for i in range(0, len(reports), batch_size):
        batch = list(reports[i:i + batch_size])
        enc = tokenizer(batch, return_tensors="np", padding="max_length",
                        truncation=True, max_length=max_length)
        cls = encode(params, jnp.asarray(enc["input_ids"]),
                     jnp.asarray(enc["attention_mask"]),
                     jnp.asarray(enc.get("token_type_ids",
                                         np.zeros_like(enc["input_ids"]))))
        cls_embeds.append(np.asarray(cls, np.float32))
    cls_embeds = np.concatenate(cls_embeds, axis=0)

    out = {}
    for j, pathology in enumerate(pathologies):
        pos = labels[:, j] == 1
        neg = labels[:, j] == 0
        if pos.sum() == 0 or neg.sum() == 0:
            continue  # pathology absent from corpus — skip, like the notebook
        out[pathology] = (cls_embeds[pos].mean(axis=0)
                          - cls_embeds[neg].mean(axis=0))
    return out


def save_diff_embeddings(embeds: Dict[str, np.ndarray], path) -> None:
    """Same artifact format as the reference resource: a pickled dict .npy."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.save(path, np.asarray(embeds, dtype=object), allow_pickle=True)


def load_diff_embeddings(path) -> Dict[str, np.ndarray]:
    """Load a pathology_diff_embeddings.npy (reference
    visualizations.py:1030-1032)."""
    return np.load(path, allow_pickle=True).item()

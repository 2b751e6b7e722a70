"""Datasets: CT-RATE-style directory walk + reports/labels/metadata CSV join.

Reference: src/utils/TrainDataset.py and src/utils/InferenceDataset.py.
Fixes two latent reference defects by design (SURVEY.md 2.5 #3, #7):
  * the train path actually calls the preprocessor with its model_type (the
    reference's TrainDataset passes 3 of 4 args and double-wraps the tensor —
    its committed train data path cannot run);
  * NaN report fields become "" instead of the string "nan"
    (`str(row[...]) or ""` never yields "" for NaN).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..config import PreprocessConfig
from .preprocess import process_file


def _clean_text(text: str) -> str:
    """Strip quotes/parens (reference InferenceDataset.py:71-74)."""
    for ch in ('"', "'", "(", ")"):
        text = text.replace(ch, "")
    return text.strip()


def _field(row, name) -> str:
    val = row.get(name, "")
    if val is None or (isinstance(val, float) and np.isnan(val)):
        return ""
    return str(val)


def _load_observations(reports_csv) -> dict:
    """VolumeName -> (Findings_EN, Impressions_EN)
    (reference TrainDataset.py:27-33)."""
    import pandas as pd
    df = pd.read_csv(reports_csv)
    return {row["VolumeName"]: (_field(row, "Findings_EN"),
                                _field(row, "Impressions_EN"))
            for _, row in df.iterrows()}


def _walk_nii(data_folder):
    for root, _, files in os.walk(data_folder):
        for file in sorted(files):
            if file.endswith(".nii.gz"):
                yield os.path.join(root, file), file


def _cfg_digest(model_type: str, cfg: PreprocessConfig) -> str:
    import hashlib
    return hashlib.md5(f"{model_type}|{cfg}".encode()).hexdigest()[:10]


def _cached_process(path, name, metadata_df, model_type,
                    cfg: PreprocessConfig, cache_dir: Optional[str]):
    """process_file with an optional preprocessed-volume disk cache.

    The reference has no cache — every epoch re-inflates the .nii.gz
    (single-stream gzip, ~5 s/volume) and re-runs the resample chain. Here
    the finished tensor is stored once as raw .npy keyed by volume name +
    a digest of (model_type, PreprocessConfig); subsequent epochs are a
    sequential ~100-220 MB read. Writes are atomic (tmp + os.replace) so
    concurrent multi-host workers sharing a cache directory race safely;
    unreadable entries fall through to a re-process."""
    if not cache_dir:
        return process_file(path, name, metadata_df, model_type, cfg)
    os.makedirs(cache_dir, exist_ok=True)
    stem = name[:-7] if name.endswith(".nii.gz") else os.path.splitext(name)[0]
    cpath = os.path.join(cache_dir,
                         f"{stem}.{_cfg_digest(model_type, cfg)}.npy")
    if os.path.exists(cpath):
        try:
            return np.load(cpath)
        except Exception:
            pass
    image = process_file(path, name, metadata_df, model_type, cfg)
    if image is not None:
        tmp = f"{cpath}.{os.getpid()}.tmp.npy"
        try:
            np.save(tmp, image)
            os.replace(tmp, cpath)
        except OSError:  # full/read-only cache disk: serve without caching
            if os.path.exists(tmp):
                os.remove(tmp)
    return image


class TrainDataset:
    """Yields (image [1, D, H, W] float32, report_text)
    (reference TrainDataset.py:8-78)."""

    def __init__(self, data_folder, reports, metadata, num_samples: int = 5000,
                 model_type: str = "ctclip",
                 preprocess_cfg: PreprocessConfig = PreprocessConfig(),
                 cache_dir: Optional[str] = None):
        import pandas as pd
        self.metadata_df = pd.read_csv(metadata)
        self.model_type = model_type
        self.preprocess_cfg = preprocess_cfg
        self.cache_dir = cache_dir
        observations = _load_observations(reports)

        self.samples: List[Tuple[str, str, str]] = []
        for path, file in _walk_nii(data_folder):
            if file not in observations:
                continue
            findings, impressions = observations[file]
            self.samples.append((path, findings + impressions, file))
        if num_samples < len(self.samples):
            self.samples = self.samples[:num_samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path, text, name = self.samples[index]
        image = _cached_process(path, name, self.metadata_df, self.model_type,
                                self.preprocess_cfg, self.cache_dir)
        if image is None:
            raise RuntimeError(f"Error loading {path}")
        return image.astype(np.float32), _clean_text(text)


class InferenceDataset:
    """Yields (image [1, D, H, W], text, labels [18], name, path)
    (reference InferenceDataset.py:8-76)."""

    def __init__(self, data_folder, reports, metadata, labels,
                 num_samples: int = 500, model_type: str = "ctclip",
                 preprocess_cfg: PreprocessConfig = PreprocessConfig(),
                 cache_dir: Optional[str] = None):
        import pandas as pd
        self.metadata_df = pd.read_csv(metadata)
        self.model_type = model_type
        self.preprocess_cfg = preprocess_cfg
        self.cache_dir = cache_dir
        observations = _load_observations(reports)

        labels_df = pd.read_csv(labels)
        label_cols = list(labels_df.columns[1:])
        by_name = {row["VolumeName"]: np.asarray(
            [row[c] for c in label_cols], np.float32)
            for _, row in labels_df.iterrows()}

        self.samples = []
        for path, file in _walk_nii(data_folder):
            if file not in observations or file not in by_name:
                continue
            findings, impressions = observations[file]
            self.samples.append(
                (path, findings + impressions, by_name[file], file))
        if num_samples and num_samples < len(self.samples):
            self.samples = self.samples[:num_samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path, text, labels, name = self.samples[index]
        image = _cached_process(path, name, self.metadata_df, self.model_type,
                                self.preprocess_cfg, self.cache_dir)
        if image is None:
            raise RuntimeError(f"Error loading {path}")
        return (image.astype(np.float32), _clean_text(text),
                labels, name.replace(".nii.gz", ""), path)

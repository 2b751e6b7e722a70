"""Dataset statistics: label prevalence + report token/word stats.

Reference: src/notebooks/analysis.ipynb (label distribution and report word
statistics over the CT-RATE-style CSVs), promoted from a notebook to a CLI.

    python -m ct_clip_ut_tpu.scripts.analyze_dataset \
        --labels labels/valid_labels.csv --reports reports/valid_reports.csv
"""

from __future__ import annotations

import argparse
import json
from collections import Counter


def analyze(labels_csv=None, reports_csv=None, top_words: int = 25) -> dict:
    import numpy as np
    import pandas as pd

    out = {}
    if labels_csv:
        df = pd.read_csv(labels_csv)
        label_cols = list(df.columns[1:])
        mat = df[label_cols].values.astype(float)
        out["num_volumes"] = int(len(df))
        out["label_prevalence"] = {
            c: round(float(mat[:, i].mean()), 4)
            for i, c in enumerate(label_cols)}
        out["labels_per_volume_mean"] = round(float(mat.sum(1).mean()), 3)
        out["volumes_with_no_findings"] = int((mat.sum(1) == 0).sum())

    if reports_csv:
        df = pd.read_csv(reports_csv)
        texts = []
        for col in ("Findings_EN", "Impressions_EN"):
            if col in df:
                texts += [str(t) for t in df[col].dropna()]
        words = Counter()
        lengths = []
        for t in texts:
            toks = t.lower().split()
            lengths.append(len(toks))
            words.update(toks)
        out["num_reports"] = len(texts)
        out["report_words_mean"] = round(float(np.mean(lengths)), 1) if lengths else 0
        out["report_words_p95"] = int(np.percentile(lengths, 95)) if lengths else 0
        out["top_words"] = words.most_common(top_words)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--labels", default=None)
    p.add_argument("--reports", default=None)
    p.add_argument("--out", default=None, help="write JSON here too")
    args = p.parse_args(argv)
    stats = analyze(args.labels, args.reports)
    text = json.dumps(stats, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()

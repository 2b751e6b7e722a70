"""Multi-label evaluation metrics and plots.

Reference: src/utils/metrics.py. Host-side (sklearn/matplotlib), not
performance-critical. Semantics preserved:
  * per-class optimal threshold from the ROC point closest to (0, 1)
    (reference metrics.py:37-44);
  * per-class weighted-F1 / precision / recall / AUROC; macro from nanmean;
    micro and sample F1 over hard predictions; macro mAP over soft
    predictions (reference metrics.py:47-77);
  * tabulated metrics.txt and PNG plots (ROC, PR, per-class F1, training
    progress).

The metrics.txt LINE ORDER, the metric-dict keys, and the plot file layout
are DERIVED FROM THE REFERENCE's output format deliberately — they are the
artifact contract its consumers diff against, not incidental code shape.
The golden-file regression test (tests/test_visualization_golden.py) pins
metrics.txt exactly so a refactor here cannot drift the format silently.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np


def calculate_metrics(soft_preds: np.ndarray, targets: np.ndarray,
                      pathologies) -> dict:
    from sklearn.metrics import (accuracy_score, average_precision_score,
                                 f1_score, precision_score, recall_score,
                                 roc_auc_score, roc_curve)

    soft_preds = np.asarray(soft_preds, np.float64)
    targets = np.asarray(targets)
    hard_preds = np.zeros_like(soft_preds)
    per_class = {"f1": [], "precision": [], "recall": [], "roc_auc": []}

    def optimal_threshold(y_true, y_prob):
        """(threshold, auroc): ROC point closest to the (0, 1) corner
        (reference metrics.py:37-44); single-class columns fall back to
        0.5 / NaN."""
        if len(set(y_true.tolist())) <= 1:
            return 0.5, float("nan")
        fpr, tpr, thresh = roc_curve(y_true, y_prob)
        dist = np.sqrt((1 - tpr) ** 2 + fpr ** 2)
        return thresh[int(np.argmin(dist))], roc_auc_score(y_true, y_prob)

    for i, _ in enumerate(pathologies):
        y_true, y_prob = targets[:, i], soft_preds[:, i]
        best_thresh, auroc = optimal_threshold(y_true, y_prob)
        y_pred = (y_prob > best_thresh).astype(int)
        hard_preds[:, i] = y_pred
        per_class["f1"].append(f1_score(y_true, y_pred, average="weighted",
                                        zero_division=0))
        per_class["precision"].append(precision_score(y_true, y_pred,
                                                      zero_division=0))
        per_class["recall"].append(recall_score(y_true, y_pred,
                                                zero_division=0))
        per_class["roc_auc"].append(auroc)

    m = {
        "label_accuracy": accuracy_score(targets.flatten(), hard_preds.flatten()),
        "per_class_f1": per_class["f1"],
        "macro_f1": float(np.nanmean(per_class["f1"])),
        "micro_f1": f1_score(targets, hard_preds, average="micro", zero_division=0),
        "sample_f1": f1_score(targets, hard_preds, average="samples", zero_division=0),
        "per_class_precision": per_class["precision"],
        "macro_precision": float(np.nanmean(per_class["precision"])),
        "micro_precision": precision_score(targets, hard_preds, average="micro",
                                           zero_division=0),
        "per_class_recall": per_class["recall"],
        "macro_recall": float(np.nanmean(per_class["recall"])),
        "micro_recall": recall_score(targets, hard_preds, average="micro",
                                     zero_division=0),
        "roc_aucs": per_class["roc_auc"],
        "mean_roc_auc": float(np.nanmean(per_class["roc_auc"])),
    }
    try:
        m["mAP"] = average_precision_score(targets, soft_preds, average="macro")
    except ValueError:
        m["mAP"] = float("nan")
    return m


def save_metrics(metrics_list, pathologies, results_path) -> None:
    from tabulate import tabulate
    results_path = Path(results_path)
    results_path.mkdir(parents=True, exist_ok=True)
    with open(results_path / "metrics.txt", "w") as f:
        for epoch, m in enumerate(metrics_list):
            f.write(f"Epoch {epoch} Metrics:\n" + "=" * 40 + "\n")
            for label, key in [
                ("Label Accuracy", "label_accuracy"),
                ("Sample F1 Score", "sample_f1"),
                ("Macro F1 Score", "macro_f1"),
                ("Micro F1 Score", "micro_f1"),
                ("Macro Precision", "macro_precision"),
                ("Micro Precision", "micro_precision"),
                ("Macro Recall", "macro_recall"),
                ("Micro Recall", "micro_recall"),
                ("Mean ROC-AUC", "mean_roc_auc"),
                ("Mean Average Precision (mAP)", "mAP"),
            ]:
                f.write(f"{label}: {m[key]:.4f}\n")
            f.write("\n")
            rows = []
            for i, p in enumerate(pathologies):
                auc = m["roc_aucs"][i]
                rows.append([p,
                             f"{m['per_class_precision'][i]:.4f}",
                             f"{m['per_class_recall'][i]:.4f}",
                             f"{m['per_class_f1'][i]:.4f}",
                             f"{auc:.4f}" if not np.isnan(auc) else "N/A"])
            f.write(tabulate(rows, headers=["Pathology", "Precision", "Recall",
                                            "F1 Score", "ROC-AUC"],
                             tablefmt="grid") + "\n\n")


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_precision_recall_curve(targets, predictions, pathologies,
                                results_path, epoch=1) -> None:
    from sklearn.metrics import average_precision_score, precision_recall_curve
    plt = _plt()
    path = Path(results_path) / "precision_recall_curves"
    path.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(10, 8))
    for i, p in enumerate(pathologies):
        precision, recall, _ = precision_recall_curve(targets[:, i],
                                                      predictions[:, i])
        auc = (average_precision_score(targets[:, i], predictions[:, i])
               if len(set(targets[:, i].tolist())) > 1 else float("nan"))
        plt.plot(recall, precision, label=f"{p} (AUC={auc:.2f})")
    plt.xlabel("Recall"); plt.ylabel("Precision")
    plt.title("Precision-Recall Curves")
    plt.legend(loc="best", fontsize=8); plt.grid(True); plt.tight_layout()
    plt.savefig(path / f"epoch_{epoch}_precision_recall_curves.png")
    plt.close()


def plot_roc_curve(targets, predictions, pathologies, results_path,
                   epoch=1) -> None:
    from sklearn.metrics import roc_auc_score, roc_curve
    plt = _plt()
    path = Path(results_path) / "roc_curves"
    path.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(10, 8))
    for i, p in enumerate(pathologies):
        if len(set(targets[:, i].tolist())) > 1:
            fpr, tpr, _ = roc_curve(targets[:, i], predictions[:, i])
            auc = roc_auc_score(targets[:, i], predictions[:, i])
            plt.plot(fpr, tpr, label=f"{p} (AUC={auc:.2f})")
    plt.plot([0, 1], [0, 1], "k--", label="Chance")
    plt.xlabel("False Positive Rate"); plt.ylabel("True Positive Rate")
    plt.title("ROC Curves"); plt.legend(loc="best", fontsize=8)
    plt.grid(True); plt.tight_layout()
    plt.savefig(path / f"epoch_{epoch}_roc_curves.png")
    plt.close()


def plot_per_class_f1(metrics, pathologies, results_path, epoch=1) -> None:
    plt = _plt()
    path = Path(results_path) / "f1_scores"
    path.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(12, 6))
    scores = metrics["per_class_f1"]
    colors = ["#1f77b4" if s > 0 else "#d62728" for s in scores]
    plt.bar(pathologies, scores, color=colors)
    plt.xlabel("Pathology"); plt.ylabel("F1 Score")
    plt.title("Per-Class F1 Scores")
    plt.xticks(rotation=45, ha="right"); plt.ylim(0, 1)
    plt.grid(axis="y", linestyle="--", alpha=0.7); plt.tight_layout()
    plt.savefig(path / f"epoch_{epoch}_f1_scores.png")
    plt.close()


def plot_all_metrics(metrics_history, results_path) -> None:
    plt = _plt()
    names = ["label_accuracy", "sample_f1", "macro_f1", "micro_f1",
             "macro_precision", "micro_precision", "macro_recall",
             "micro_recall", "mean_roc_auc", "mAP"]
    titles = ["Label Accuracy", "Sample F1 Score", "Macro F1 Score",
              "Micro F1 Score", "Macro Precision", "Micro Precision",
              "Macro Recall", "Micro Recall", "Macro ROC-AUC",
              "Mean Average Precision"]
    n = len(names)
    cols = math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 4 * rows))
    axes = np.asarray(axes).flatten()
    epochs = np.arange(len(metrics_history))
    for i, (name, title) in enumerate(zip(names, titles)):
        vals = [m.get(name, float("nan")) for m in metrics_history]
        axes[i].plot(epochs, vals, marker="o", linestyle="-", label=title)
        axes[i].set_xlabel("Epochs"); axes[i].set_ylabel(title)
        axes[i].set_title(title); axes[i].grid(True, linestyle="--", alpha=0.5)
        axes[i].legend()
    for i in range(n, len(axes)):
        fig.delaxes(axes[i])
    plt.suptitle("Training Metrics", fontsize=16, fontweight="bold")
    plt.tight_layout(rect=[0, 0, 1, 0.96])
    plt.savefig(Path(results_path) / "all_metrics.png")
    plt.close()


def plot_training_progress(train_losses, valid_losses, results_path) -> None:
    plt = _plt()
    path = Path(results_path)
    path.mkdir(parents=True, exist_ok=True)
    steps = train_losses["steps"]
    epochs_l = train_losses["epochs"]
    step_idx = np.arange(len(steps))
    epoch_idx = (np.linspace(0, max(len(steps) - 1, 0), len(epochs_l)).astype(int)
                 if epochs_l else np.array([], int))
    fig, ax = plt.subplots(1, 2, figsize=(14, 6), gridspec_kw={"wspace": 0.3})
    ax[0].plot(step_idx, steps, color="tab:blue", marker="o", linestyle="-",
               label="Step Losses")
    if len(epochs_l):
        ax[0].plot(epoch_idx, epochs_l, color="tab:green", marker="s",
                   linestyle="--", label="Epoch Losses")
    ax[0].set_xlabel("Step"); ax[0].set_ylabel("Contrastive Loss")
    ax[0].set_title("Training Loss"); ax[0].legend()
    ax[0].grid(True, linestyle="--", alpha=0.5)
    ax[1].plot(np.arange(len(valid_losses)), valid_losses, color="tab:orange",
               marker="o", linestyle="-")
    ax[1].set_xlabel("Epoch"); ax[1].set_ylabel("Contrastive Loss")
    ax[1].set_title("Validation Loss"); ax[1].grid(True, linestyle="--", alpha=0.5)
    plt.suptitle("Training Progress", fontsize=14, fontweight="bold")
    plt.savefig(path / "training_progress.png")
    plt.close()

"""GIF / heatmap / overlay rendering (host-side matplotlib).

Reference: src/utils/visualizations.py:427-704 (visualize_overlay,
visualize_attention_grid_gif, visualize_pathology_heatmaps). File naming and
figure layout match the reference so outputs are directly comparable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ..config import PATHOLOGIES

COLORS = [
    "red", "green", "blue", "cyan", "magenta", "yellow",
    "orange", "purple", "pink", "lime",
    "teal", "brown", "olive", "navy", "gold", "salmon",
    "turquoise", "indigo",
]


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    return plt, animation


def normalize(volume: np.ndarray) -> np.ndarray:
    """Reference visualizations.py:66-70."""
    volume = volume - volume.min()
    if volume.max() > 0:
        volume = volume / volume.max()
    return volume


def results_subdirectory(results_folder, visualization_name: str) -> Path:
    """Indexed subdir per run (reference visualizations.py:108-122).

    The index claim is ATOMIC (mkdir with exist_ok=False, retrying upward):
    concurrent claimants — e.g. per-process attribution ranks writing their
    own scans to a shared results fs — get DISTINCT run dirs instead of
    interleaving artifacts in one (the count-then-mkdir version raced)."""
    subdir = Path(results_folder) / visualization_name
    subdir.mkdir(parents=True, exist_ok=True)
    idx = len([d for d in subdir.iterdir() if d.is_dir()]) + 1
    while True:
        out = subdir / str(idx)
        try:
            out.mkdir(parents=False, exist_ok=False)
            return out
        except FileExistsError:
            idx += 1


def visualize_overlay(image: np.ndarray, overlay: np.ndarray, scan_name: str,
                      overlay_name: str, save_path, threshold: float = 0.0,
                      extra_info: str = "", display_flags: Optional[dict] = None,
                      fps: int = 10) -> None:
    """Animated scan/heatmap/overlay panels over depth slices
    (reference visualizations.py:427-492)."""
    plt, animation = _mpl()
    if display_flags is None:
        display_flags = {"original": True, "heatmap": True, "overlay": True}

    overlay = np.copy(overlay)
    overlay[overlay < threshold] = 0

    view_order = [v for v in ("original", "heatmap", "overlay")
                  if display_flags.get(v)]
    fig, axes = plt.subplots(1, len(view_order), figsize=(6 * len(view_order), 6))
    if len(view_order) == 1:
        axes = [axes]
    fig.suptitle(f"Scan: {scan_name}", fontsize=16)
    if extra_info:
        fig.text(0.00, 0.99, str(extra_info), fontsize=10, ha="left", va="top")

    ims = []
    for slice_idx in range(image.shape[0]):
        frame = []
        for ax, view in zip(axes, view_order):
            if view == "original":
                frame.append(ax.imshow(image[slice_idx], cmap="bone",
                                       animated=True))
                ax.set_title("Original Scan", fontsize=12)
            elif view == "heatmap":
                frame.append(ax.imshow(overlay[slice_idx], cmap="inferno",
                                       vmin=0, vmax=1, animated=True))
                ax.set_title(f"{overlay_name} Heatmap", fontsize=12)
            else:
                frame.append(ax.imshow(image[slice_idx], cmap="bone",
                                       animated=True))
                frame.append(ax.imshow(overlay[slice_idx], cmap="inferno",
                                       alpha=overlay[slice_idx], vmin=0, vmax=1,
                                       animated=True))
                ax.set_title("Scan + Heatmap", fontsize=12)
            ax.axis("off")
        ims.append(frame)

    if "heatmap" in view_order:
        cbar_ax = fig.add_axes([0.35, 0.08, 0.3, 0.02])
        cbar = fig.colorbar(ims[0][view_order.index("heatmap")], cax=cbar_ax,
                            orientation="horizontal")
        cbar.set_label(f"{overlay_name} Intensity", fontsize=12)

    ani = animation.ArtistAnimation(fig, ims, interval=100, blit=False,
                                    repeat_delay=1000)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    ani.save(str(save_path), writer="pillow", fps=fps)
    plt.close(fig)


def visualize_attention_grid_gif(volumes: np.ndarray, scan_name: str,
                                 save_path, fps: int = 6) -> None:
    """Heads x layers grid animated over depth (reference
    visualizations.py:641-704). `volumes` is [layers, heads, D, H, W]
    (pre-normalized / rotated, attribution/raw_attention.py)."""
    plt, animation = _mpl()
    num_layers, num_heads, depth = volumes.shape[:3]
    fig, axes = plt.subplots(num_heads, num_layers,
                             figsize=(4 * num_layers, 3 * num_heads))
    axes = np.atleast_2d(axes)

    ims = []
    for d in range(depth):
        frame = []
        for i in range(num_heads):
            for j in range(num_layers):
                ax = axes[i][j]
                frame.append(ax.imshow(volumes[j, i, d], cmap="inferno",
                                       vmin=0, vmax=1, animated=True))
                if i == 0:
                    ax.set_title(f"Layer {j}", fontsize=10)
                if j == 0:
                    ax.set_ylabel(f"Head {i}", fontsize=10)
                ax.axis("off")
        ims.append(frame)

    ani = animation.ArtistAnimation(fig, ims, interval=100, blit=False,
                                    repeat_delay=1000)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    ani.save(str(save_path), writer="pillow", fps=fps)
    plt.close(fig)


def visualize_pathology_heatmaps(image: np.ndarray,
                                 heatmaps: Dict[str, np.ndarray], save_path,
                                 interval: int = 100, figsize=None,
                                 pathologies: Sequence[str] = PATHOLOGIES,
                                 fps: int = 10) -> None:
    """Per-pathology [scan | heatmap | overlay] rows animated over slices
    (reference visualizations.py:495-567)."""
    plt, animation = _mpl()
    from matplotlib.colors import LinearSegmentedColormap, to_rgba

    if figsize is None:
        figsize = (12, 4 * len(heatmaps))
    cmaps = {p: LinearSegmentedColormap.from_list(
        f"{p.replace(' ', '_')}_cmap", [to_rgba("black", 0.0), to_rgba(c, 1.0)])
        for p, c in zip(pathologies, COLORS)}

    fig, axes = plt.subplots(nrows=len(heatmaps), ncols=3, figsize=figsize)
    axes = np.atleast_2d(axes)

    ims = []
    for slice_idx in range(image.shape[0]):
        frame = []
        for row, (pathology, heatmap) in enumerate(heatmaps.items()):
            cmap = cmaps.get(pathology, "inferno")
            img_s, heat_s = image[slice_idx], heatmap[slice_idx]
            frame.append(axes[row, 0].imshow(img_s, cmap="bone", animated=True))
            axes[row, 0].set_title(f"{pathology} - Scan", fontsize=8)
            frame.append(axes[row, 1].imshow(heat_s, cmap=cmap, vmin=0, vmax=1,
                                             animated=True))
            axes[row, 1].set_title(f"{pathology} - Heatmap", fontsize=8)
            frame.append(axes[row, 2].imshow(img_s, cmap="bone", animated=True))
            frame.append(axes[row, 2].imshow(heat_s, cmap=cmap, vmin=0, vmax=1,
                                             alpha=heat_s, animated=True))
            axes[row, 2].set_title(f"{pathology} - Overlay", fontsize=8)
        for ax in axes.flatten():
            ax.axis("off")
        ims.append(frame)

    ani = animation.ArtistAnimation(fig, ims, interval=interval, blit=False,
                                    repeat_delay=1000)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    ani.save(str(save_path), writer="pillow", fps=fps)
    plt.close(fig)

"""GIF / heatmap / overlay rendering (host-side matplotlib).

Artifact contract: the reference's figure layouts, color maps, titles, and
file-naming (src/utils/visualizations.py:427-704) — its consumers compare
our GIFs panel-for-panel against theirs. The implementation is our own: the
three public renderers are declarative PANEL LISTS fed to one shared
animator (`_animate`), instead of three hand-rolled per-slice imshow loops.
The rendered artifacts are pinned by the golden-artifact regression test
(tests/test_visualization_golden.py), so layout parity survives refactors.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

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


class _Layer(NamedTuple):
    """One imshow per animation frame: `volume[d]` with these draw args.
    `alpha_from_data` uses the slice itself as the alpha channel (the
    overlay idiom — heat shows only where heat is)."""
    volume: np.ndarray                       # [D, H, W]
    cmap: object
    vlim: Optional[Tuple[float, float]] = None
    alpha_from_data: bool = False


class _Panel(NamedTuple):
    """One axes cell: stacked layers + its static decorations."""
    rc: Tuple[int, int]
    layers: Tuple[_Layer, ...]
    title: str = ""
    title_fontsize: int = 12
    ylabel: str = ""


def _animate(panels: Sequence[_Panel], grid: Tuple[int, int], depth: int,
             save_path, *, figsize, suptitle: str = "",
             extra_text: str = "", colorbar_on: Optional[_Panel] = None,
             colorbar_label: str = "",
             colorbar_rect=(0.35, 0.08, 0.3, 0.02),
             interval: int = 100, fps: int = 10) -> None:
    """Shared renderer: build the axes grid, emit one artist list per depth
    slice, save as a pillow GIF. Decorations (titles, axis-off, colorbar)
    are applied once — the animation only swaps image artists."""
    plt, animation = _mpl()
    fig, axes = plt.subplots(*grid, figsize=figsize)
    axes = np.asarray(axes).reshape(grid)
    if suptitle:
        fig.suptitle(suptitle, fontsize=16)
    if extra_text:
        fig.text(0.00, 0.99, str(extra_text), fontsize=10, ha="left",
                 va="top")

    for p in panels:
        ax = axes[p.rc]
        if p.title:
            ax.set_title(p.title, fontsize=p.title_fontsize)
        if p.ylabel:
            ax.set_ylabel(p.ylabel, fontsize=p.title_fontsize)
    for ax in axes.ravel():
        ax.axis("off")

    frames = []
    cbar_artist = None
    for d in range(depth):
        artists = []
        for p in panels:
            ax = axes[p.rc]
            for layer in p.layers:
                kw = dict(cmap=layer.cmap, animated=True)
                if layer.vlim is not None:
                    kw["vmin"], kw["vmax"] = layer.vlim
                sl = layer.volume[d]
                if layer.alpha_from_data:
                    kw["alpha"] = sl
                artists.append(ax.imshow(sl, **kw))
                if d == 0 and colorbar_on is p and cbar_artist is None:
                    cbar_artist = artists[-1]
        frames.append(artists)

    if cbar_artist is not None:
        cbar = fig.colorbar(cbar_artist, cax=fig.add_axes(colorbar_rect),
                            orientation="horizontal")
        if colorbar_label:
            cbar.set_label(colorbar_label, fontsize=12)

    ani = animation.ArtistAnimation(fig, frames, interval=interval,
                                    blit=False, repeat_delay=1000)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    ani.save(str(save_path), writer="pillow", fps=fps)
    plt.close(fig)


def _scan_heat_overlay(rc_row: int, image, heat, cmap, titles,
                       fontsize: int, cols=(0, 1, 2)) -> list:
    """The recurring [scan | heatmap | overlay] panel triple."""
    return [
        _Panel((rc_row, cols[0]), (_Layer(image, "bone"),),
               titles[0], fontsize),
        _Panel((rc_row, cols[1]), (_Layer(heat, cmap, (0.0, 1.0)),),
               titles[1], fontsize),
        _Panel((rc_row, cols[2]),
               (_Layer(image, "bone"),
                _Layer(heat, cmap, (0.0, 1.0), alpha_from_data=True)),
               titles[2], fontsize),
    ]


def visualize_overlay(image: np.ndarray, overlay: np.ndarray, scan_name: str,
                      overlay_name: str, save_path, threshold: float = 0.0,
                      extra_info: str = "", display_flags: Optional[dict] = None,
                      fps: int = 10) -> None:
    """Animated scan/heatmap/overlay panels over depth slices
    (reference visualizations.py:427-492); `display_flags` selects which of
    the three views appear."""
    if display_flags is None:
        display_flags = {"original": True, "heatmap": True, "overlay": True}
    overlay = np.where(overlay < threshold, 0.0, overlay)

    views = {
        "original": ((_Layer(image, "bone"),), "Original Scan"),
        "heatmap": ((_Layer(overlay, "inferno", (0.0, 1.0)),),
                    f"{overlay_name} Heatmap"),
        "overlay": ((_Layer(image, "bone"),
                     _Layer(overlay, "inferno", (0.0, 1.0),
                            alpha_from_data=True)), "Scan + Heatmap"),
    }
    order = [v for v in views if display_flags.get(v)]
    panels = [_Panel((0, i), *views[v]) for i, v in enumerate(order)]
    heat_panel = (panels[order.index("heatmap")]
                  if "heatmap" in order else None)
    _animate(panels, (1, len(order)), image.shape[0], save_path,
             figsize=(6 * len(order), 6), suptitle=f"Scan: {scan_name}",
             extra_text=extra_info, colorbar_on=heat_panel,
             colorbar_label=f"{overlay_name} Intensity", fps=fps)


def visualize_attention_grid_gif(volumes: np.ndarray, scan_name: str,
                                 save_path, fps: int = 6) -> None:
    """Heads x layers grid animated over depth (reference
    visualizations.py:641-704). `volumes` is [layers, heads, D, H, W]
    (pre-normalized / rotated, attribution/raw_attention.py)."""
    num_layers, num_heads = volumes.shape[:2]
    panels = [
        _Panel((i, j), (_Layer(volumes[j, i], "inferno", (0.0, 1.0)),),
               title=f"Layer {j}" if i == 0 else "", title_fontsize=10,
               ylabel=f"Head {i}" if j == 0 else "")
        for i in range(num_heads) for j in range(num_layers)
    ]
    _animate(panels, (num_heads, num_layers), volumes.shape[2], save_path,
             figsize=(4 * num_layers, 3 * num_heads), fps=fps)


def visualize_pathology_heatmaps(image: np.ndarray,
                                 heatmaps: Dict[str, np.ndarray], save_path,
                                 interval: int = 100, figsize=None,
                                 pathologies: Sequence[str] = PATHOLOGIES,
                                 fps: int = 10) -> None:
    """Per-pathology [scan | heatmap | overlay] rows animated over slices,
    each pathology in its own transparent-to-color map (reference
    visualizations.py:495-567)."""
    from matplotlib.colors import LinearSegmentedColormap, to_rgba
    if figsize is None:
        figsize = (12, 4 * len(heatmaps))
    cmaps = {p: LinearSegmentedColormap.from_list(
        f"{p.replace(' ', '_')}_cmap",
        [to_rgba("black", 0.0), to_rgba(c, 1.0)])
        for p, c in zip(pathologies, COLORS)}

    panels = []
    for row, (pathology, heat) in enumerate(heatmaps.items()):
        panels += _scan_heat_overlay(
            row, image, heat, cmaps.get(pathology, "inferno"),
            (f"{pathology} - Scan", f"{pathology} - Heatmap",
             f"{pathology} - Overlay"), 8)
    _animate(panels, (len(heatmaps), 3), image.shape[0], save_path,
             figsize=figsize, interval=interval, fps=fps)

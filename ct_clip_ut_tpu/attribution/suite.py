"""Attribution suite driver: dataset loop + method dispatch + artifacts.

Reference: src/utils/visualizations.py:73-1195 (`Visualizations` class).
Same artifact contract: every method writes its raw `.npy` saliency maps next
to the rendered GIFs under an indexed results subdirectory, with the
reference's file names, so maps are diffable run-to-run.

The compute paths live in the sibling modules (raw_attention, rollout,
integrated_gradients, grad_cam, occlusion) — this file is host-side glue.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATHOLOGIES, CTCLIPConfig, OcclusionConfig
from ..utils import visualizations as viz
from . import grad_cam as gc
from . import integrated_gradients as ig
from . import occlusion as occ_mod
from . import raw_attention as ra
from . import rollout as ro
from .capture import rot90_ct


@dataclass
class AttributionContext:
    params: Any
    cfg: CTCLIPConfig
    tokenizer: Any
    data: Iterable                     # yields (image, text, labels, name, path)
    diff_embeds: Optional[dict] = None  # pathology -> 768-d ndarray
    pathologies: Sequence[str] = PATHOLOGIES
    text_max_length: int = 512
    render_gifs: bool = True
    # optional jax.sharding.Mesh: IG shards its interpolation steps and
    # occlusion its window sweeps over the mesh's data axis (which may span
    # processes — the multi-host deployment mode); ~n_dev x per map. When the
    # mesh spans processes, BOTH methods are collective: the suite broadcasts
    # process-0's sample before each sharded compute and rank-gates writes.
    mesh: Any = None


class Visualizations:
    def __init__(self, ctx: AttributionContext, results_folder):
        self.ctx = ctx
        self.results_folder = Path(results_folder)
        # multi-process: process 0 is the reference's rank 0 — it owns the
        # sample stream for collective methods and all artifact writes
        # (reference visualizations.py:296-318, 411-424, 1141-1151)
        self.is_main = jax.process_index() == 0

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def _broadcast_sample(sample):
        """Process-0's (image, text_tokens, labels, scan_name, path) to all
        processes (reference _broadcast_sample, visualizations.py:296-318):
        arrays ride broadcast_one_to_all; strings ride a fixed uint8 buffer."""
        if jax.process_count() <= 1:
            return sample
        from jax.experimental import multihost_utils

        image, text_tokens, labels, scan_name, path = sample

        def bcast_str(s, width=1024):
            raw = str(s).encode()
            if len(raw) > width:
                # refuse loudly: a byte-cap cut could split a multibyte
                # UTF-8 character and fail to decode on every process, and
                # silent truncation would corrupt artifact paths
                raise ValueError(
                    f"string too long to broadcast ({len(raw)} > {width} "
                    f"bytes): {str(s)[:80]}...")
            buf = np.zeros(width, np.uint8)
            buf[:len(raw)] = np.frombuffer(raw, np.uint8)
            out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            return bytes(out[out != 0]).decode()

        image = multihost_utils.broadcast_one_to_all(np.asarray(image))
        text_tokens = {k: multihost_utils.broadcast_one_to_all(np.asarray(v))
                       for k, v in sorted(text_tokens.items())}
        labels = np.asarray(
            multihost_utils.broadcast_one_to_all(
                np.asarray(labels, np.float32)))
        return (jnp.asarray(image), text_tokens, labels,
                bcast_str(scan_name), bcast_str(path))

    def _tokenize(self, text):
        enc = self.ctx.tokenizer(
            [text] if isinstance(text, str) else list(text),
            return_tensors="np", padding="max_length", truncation=True,
            max_length=self.ctx.text_max_length)
        out = {"input_ids": jnp.asarray(enc["input_ids"]),
               "attention_mask": jnp.asarray(enc["attention_mask"])}
        if "token_type_ids" in enc:
            out["token_type_ids"] = jnp.asarray(enc["token_type_ids"])
        return out

    def _image_np(self, image):
        img = np.asarray(image, np.float32).squeeze()
        return rot90_ct(img)

    # -- methods (reference visualizations.py:570-1082) ----------------------

    def raw_attention_maps(self, image, text_tokens, labels, scan_name, path):
        sp, tm = ra.raw_attention_maps_np(self.ctx.params, self.ctx.cfg,
                                          text_tokens, image)
        out = viz.results_subdirectory(self.results_folder, "raw_attention_grids")
        np.save(out / f"{scan_name}_spatial.npy", sp)
        np.save(out / f"{scan_name}_temporal.npy", tm)
        if self.ctx.render_gifs:
            viz.visualize_attention_grid_gif(
                sp, scan_name, out / f"{scan_name}_spatial_grid.gif")
            viz.visualize_attention_grid_gif(
                tm, scan_name, out / f"{scan_name}_temporal_grid.gif")

    def attention_rollout(self, image, text_tokens, labels, scan_name, path):
        sp_map, tm_map = ro.rollout_maps(self.ctx.params, self.ctx.cfg,
                                         text_tokens, image)
        self._save_rollout_maps(sp_map, tm_map, image, scan_name)

    def _save_rollout_maps(self, sp_map, tm_map, image, scan_name):
        sp_map, tm_map = rot90_ct(sp_map), rot90_ct(tm_map)
        img = self._image_np(image)
        out = viz.results_subdirectory(self.results_folder, "attention_rollout")
        np.save(out / f"{scan_name}_spatial.npy", sp_map)
        np.save(out / f"{scan_name}_temporal.npy", tm_map)
        if self.ctx.render_gifs:
            viz.visualize_overlay(img, sp_map, scan_name,
                                  "Attention Rollout (Spatial)",
                                  out / f"{scan_name}_spatial.gif")
            viz.visualize_overlay(img, tm_map, scan_name,
                                  "Attention Rollout (Temporal)",
                                  out / f"{scan_name}_temporal.gif")

    def attention_rollout_worklist(self, samples):
        """Rollout over a prepared (image, text_tokens, scan_name) worklist
        with device/host overlap (rollout_maps_pipelined): each pair's
        fetch + 2x221 MB host expansion + save runs while the NEXT scan's
        rollout computes on device."""
        metas = []

        def items():
            for image, text_tokens, scan_name in samples:
                metas.append((image, scan_name))
                yield (text_tokens, image)

        for sp_map, tm_map in ro.rollout_maps_pipelined(
                self.ctx.params, self.ctx.cfg, items()):
            image, scan_name = metas.pop(0)
            self._save_rollout_maps(sp_map, tm_map, image, scan_name)

    def integrated_gradients(self, image, text_tokens, labels, scan_name, path,
                             steps: int = 50):
        if self.ctx.mesh is not None and self.ctx.mesh.shape.get("data", 1) > 1:
            sal = ig.integrated_gradients_sharded(
                self.ctx.params, self.ctx.cfg, text_tokens, image,
                self.ctx.mesh, steps=steps)
        else:
            sal = ig.integrated_gradients(self.ctx.params, self.ctx.cfg,
                                          text_tokens, image, steps=steps)
        self._save_ig_map(sal, image, scan_name)

    def _save_ig_map(self, sal, image, scan_name):
        if not self.is_main:   # replicated result on sharded runs; rank-0
            return             # writes (and owns the indexed-subdir pick)
        sal = rot90_ct(sal)
        img = self._image_np(image)
        out = viz.results_subdirectory(self.results_folder,
                                       "integrated_gradients")
        np.save(out / f"{scan_name}.npy", sal)
        if self.ctx.render_gifs:
            viz.visualize_overlay(img, sal, scan_name,
                                  "Integrated Gradients (1)",
                                  out / f"{scan_name}.gif")

    def integrated_gradients_worklist(self, samples, steps: int = 50):
        """IG over a prepared (image, text_tokens, scan_name) worklist with
        device/host overlap: each map's transport + densify + save/render
        runs while the NEXT scan's map computes on device
        (integrated_gradients_pipelined) — the dispatcher routes the
        multi-scan IG pass here instead of the serialized per-scan call."""
        metas = []

        def items():
            for image, text_tokens, scan_name in samples:
                metas.append((image, scan_name))
                yield (text_tokens, image)

        for sal in ig.integrated_gradients_pipelined(
                self.ctx.params, self.ctx.cfg, items(), steps=steps):
            image, scan_name = metas.pop(0)
            self._save_ig_map(sal, image, scan_name)

    def grad_cam(self, image, text_tokens, labels, scan_name, path):
        maps = gc.grad_cam_maps(self.ctx.params, self.ctx.cfg, text_tokens,
                                image)
        img = self._image_np(image)
        out = viz.results_subdirectory(self.results_folder, "grad_cam")
        for key, vol in maps.items():
            vol = rot90_ct(vol)
            np.save(out / f"{scan_name}_{key}.npy", vol)
            if self.ctx.render_gifs:
                viz.visualize_overlay(
                    img, vol, scan_name, f"Grad-CAM ({key})",
                    out / f"{scan_name}_{key}.gif",
                    display_flags={"overlay": True})

    def occlusion(self, image, text_tokens, labels, scan_name, path,
                  occ: OcclusionConfig = OcclusionConfig(),
                  use_text_embeds: bool = False, prompt: str = ""):
        # artifact dir + rendering inputs only on the writing process — the
        # indexed-subdir pick (results_subdirectory) would race on a shared
        # fs if every process counted and mkdir'd independently
        if self.is_main:
            out = viz.results_subdirectory(self.results_folder, "occlusion")
            img = self._image_np(image)

        if use_text_embeds:
            if not self.ctx.diff_embeds:
                raise ValueError("use_text_embeds requires ctx.diff_embeds")
            positives = [p for p, l in zip(self.ctx.pathologies,
                                           np.asarray(labels).tolist())
                         if l == 1.0 and p in self.ctx.diff_embeds]
            if not positives:
                return {}
            # one window sweep scores ALL positive pathologies (the
            # reference re-sweeps per pathology, visualizations.py:1037-1044)
            latents = jnp.stack([
                occ_mod.diff_embedding_latent(
                    self.ctx.params, self.ctx.cfg,
                    jnp.asarray(self.ctx.diff_embeds[p], jnp.float32))
                for p in positives])
            heats = occ_mod.occlusion_heatmaps_multi(
                self.ctx.params, self.ctx.cfg, image, latents, occ=occ,
                mesh=self.ctx.mesh)
            heatmaps = {p: rot90_ct(h) for p, h in zip(positives, heats)}
            if not self.is_main:   # replicated result; rank-0 writes
                return heatmaps    # (reference visualizations.py:411-424)
            np.save(out / (f"{scan_name}_{occ.patch_size}_{occ.stride}_"
                           f"{prompt}_heatmaps.npy"), heatmaps)  # dict, like ref
            if self.ctx.render_gifs:
                for pathology, heat in heatmaps.items():
                    viz.visualize_overlay(
                        img, heat, f"{scan_name}_{pathology}", "Occlusion",
                        out / (f"{scan_name}_{pathology}_{occ.patch_size}_"
                               f"{occ.stride}_occlusion.gif"),
                        display_flags={"overlay": True})
                # combined per-pathology [scan | heatmap | overlay] figure
                # (reference visualize_pathology_heatmaps, visualizations.py:495-567)
                viz.visualize_pathology_heatmaps(
                    img, heatmaps,
                    out / (f"{scan_name}_{occ.patch_size}_{occ.stride}_"
                           f"pathology_heatmaps.gif"),
                    pathologies=self.ctx.pathologies)
            return heatmaps

        latent = occ_mod.report_text_latent(self.ctx.params, self.ctx.cfg,
                                            text_tokens)
        heat = rot90_ct(occ_mod.occlusion_heatmap(
            self.ctx.params, self.ctx.cfg, image, latent, occ=occ,
            mesh=self.ctx.mesh))
        if not self.is_main:       # replicated result; rank-0 writes
            return heat
        np.save(out / f"{scan_name}_{prompt}_heatmap.npy", heat)
        if self.ctx.render_gifs:
            viz.visualize_overlay(img, heat, scan_name, "Occlusion",
                                  out / f"{scan_name}_{prompt}.gif",
                                  display_flags={"overlay": True})
        return heat

    # -- dispatcher (reference visualizations.py:1085-1195) ------------------

    METHODS = ("raw_attention_maps", "attention_rollout",
               "integrated_gradients", "grad_cam", "occlusion")

    def visualize(self, **flags):
        multiproc = jax.process_count() > 1
        if multiproc:
            # all processes enter the suite together (reference barrier,
            # visualizations.py:1093-1094)
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("attribution_suite_start")
        for name, enabled in flags.items():
            if not enabled:
                continue
            if name not in self.METHODS:
                if self.is_main:
                    print(f"{name} is not a valid visualization argument.")
                continue
            method = getattr(self, name)
            if self.is_main:
                print(f"{name} visualization started.")
            start = time.time()

            def prepared():
                for sample in self.ctx.data:
                    image, text, labels, scan_name, path = sample
                    image = jnp.asarray(image)
                    if image.ndim == 4:
                        image = image[None]
                    text_tokens = self._tokenize(
                        text if isinstance(text, str) else text[0])
                    yield (image, text_tokens,
                           np.asarray(labels).reshape(-1),
                           scan_name if isinstance(scan_name, str)
                           else scan_name[0],
                           path if isinstance(path, str) else path[0])

            if name == "integrated_gradients":
                if (self.ctx.mesh is not None
                        and self.ctx.mesh.shape.get("data", 1) > 1):
                    # mesh set: shard each map's interpolation steps over
                    # the data axis (integrated_gradients_sharded, ~n_dev x
                    # per map) — the per-scan pipelining below is
                    # single-device and would ignore the mesh
                    for sample in prepared():
                        if multiproc:
                            # collective over a process-spanning mesh: every
                            # rank must feed the SAME sample into the sharded
                            # program (same protocol as occlusion below);
                            # rank 0 writes (_save_ig_map is rank-gated)
                            sample = self._broadcast_sample(sample)
                        self.integrated_gradients(*sample)
                else:
                    # pipelined across scans: map k's fetch/save overlaps
                    # map k+1's device compute
                    self.integrated_gradients_worklist(
                        (img, tok, nm) for img, tok, _, nm, _ in prepared())
            elif name == "attention_rollout":
                # pipelined like IG: host expansion/save of pair k overlaps
                # scan k+1's device rollout
                self.attention_rollout_worklist(
                    (img, tok, nm) for img, tok, _, nm, _ in prepared())
            else:
                for sample in prepared():
                    if name == "occlusion" and multiproc:
                        # occlusion is COLLECTIVE across processes: every
                        # rank sweeps a shard of process-0's sample's windows
                        # (reference visualizations.py:296-318, 1141-1151).
                        # The per-process data streams must therefore have
                        # equal length (ShardedSampler pads to equal shards).
                        sample = self._broadcast_sample(sample)
                    image, text_tokens, labels, scan_name, path = sample
                    kwargs = {}
                    if name == "occlusion" and isinstance(enabled, dict):
                        kwargs = enabled
                    method(image, text_tokens, labels, scan_name, path,
                           **kwargs)
            if self.is_main:
                print(f"{name} completed in {time.time() - start:.1f}s")

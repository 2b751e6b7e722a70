"""Zero-shot pathology classification.

Reference: src/utils/CTClipInference.py:133-201. For each scan and each of 18
pathologies, the prompt pair "There is {p}." / "There is no {p}." is scored
against the image; softmax over (present, absent) gives the positive
probability.

TPU re-design, scoring-exact but ~18x cheaper + batched:
  * the reference re-runs the FULL visual tower once per pathology
    (18 forwards per scan, reference CTClipInference.py:158-169). The image
    latent does not depend on the prompt, so we hoist it out of the loop;
  * all 36 prompts are tokenized and encoded ONCE per checkpoint (they are
    constants), not once per scan;
  * scans are batched: scores for a [B] batch against all 18 pairs are one
    [B, 36] matmul. The softmax over each (present, absent) pair reproduces
    the reference's per-rank diagonal scoring exactly (present_score =
    <img_i, txt_present_p> * temp is the same number the reference reads at
    sim[rank, rank]).
"""

from __future__ import annotations

import time
from datetime import datetime
from functools import partial
from pathlib import Path
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATHOLOGIES, CTCLIPConfig
from ..models.ctclip import encode_image_latents, encode_text_latents

Array = jax.Array


def prompt_texts(pathologies: Sequence[str] = PATHOLOGIES):
    """36 interleaved prompts: (present, absent) per pathology
    (reference CTClipInference.py:159-160)."""
    out = []
    for p in pathologies:
        out.append(f"There is {p}.")
        out.append(f"There is no {p}.")
    return out


def tokenize_prompts(tokenizer, pathologies: Sequence[str] = PATHOLOGIES,
                     max_length: int = 512):
    enc = tokenizer(prompt_texts(pathologies), return_tensors="np",
                    padding="max_length", truncation=True,
                    max_length=max_length)
    tokens = {"input_ids": jnp.asarray(enc["input_ids"]),
              "attention_mask": jnp.asarray(enc["attention_mask"])}
    if "token_type_ids" in enc:
        tokens["token_type_ids"] = jnp.asarray(enc["token_type_ids"])
    return tokens


@partial(jax.jit, static_argnames=("cfg",))
def encode_prompt_latents(params, cfg: CTCLIPConfig, prompt_tokens) -> Array:
    """[2 * n_pathologies, dim_latent], computed once per checkpoint."""
    return encode_text_latents(params, cfg, prompt_tokens)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def zeroshot_probs(params, cfg: CTCLIPConfig, image: Array,
                   prompt_latents: Array,
                   compute_dtype: str = "bfloat16") -> Array:
    """[B, n_pathologies] positive-class probabilities.

    softmax([present, absent]) over each prompt pair, identical numbers to
    reference CTClipInference.py:170-178 (temperature cancels nothing — it is
    applied before the softmax exactly as in validate_prompts)."""
    img_lat, _ = encode_image_latents(
        params, cfg, image.astype(jnp.dtype(compute_dtype)), freeze_vq=True)
    temp = jnp.exp(params["temperature"])
    sim = (img_lat.astype(jnp.float32) @ prompt_latents.astype(jnp.float32).T) * temp
    present, absent = sim[:, 0::2], sim[:, 1::2]            # [B, 18] each
    pair = jnp.stack([present, absent], axis=-1)            # [B, 18, 2]
    return jax.nn.softmax(pair, axis=-1)[..., 0]


def place_eval_inputs(params, prompt_latents, mesh):
    """One-time mesh placement of the eval constants: params onto their
    NamedShardings, prompt latents replicated. Called ONCE per checkpoint
    (CTClipInference.zeroshot does this before the batch loop) — placing the
    150M-param tree per batch was a measured eval-loop tax."""
    from ..parallel import sharding
    params = jax.device_put(params, sharding.param_shardings(params, mesh))
    prompt_latents = jax.device_put(prompt_latents, sharding.replicated(mesh))
    return params, prompt_latents


def zeroshot_probs_sharded(params, cfg: CTCLIPConfig, image, prompt_latents,
                           mesh, compute_dtype: str = "bfloat16") -> Array:
    """Mesh-sharded zero-shot scoring: the image batch shards over the
    "data" axis and each shard runs the visual tower in parallel (the
    reference's DDP eval — one model replica per rank over a per-rank data
    shard, CTClipInference.py:59,79-88). Under jit/GSPMD the batch sharding
    propagates through the whole tower, so this is the same compiled
    program as `zeroshot_probs`, laid out over the mesh.

    `params`/`prompt_latents` already placed via `place_eval_inputs` pass
    through device_put as no-ops (sharding match short-circuits); host
    arrays are placed here for one-shot callers.

    Multi-process: `image` is this PROCESS's local batch (its ShardedSampler
    shard); the global batch is assembled across hosts, so the returned
    [global_B, 18] probs row-align with the global batch order.

    A single-process indivisible batch (shorter final loader batch, batch 1
    on a wide data axis) is padded by repeating the last row — rows score
    independently, so the real rows' probs are unchanged; pad rows are
    sliced off before returning. Multi-process indivisible local batches
    raise instead (slicing pad rows out of a process-spanning result would
    need a cross-host gather; pick batch % (data/process_count) == 0 —
    same rule as the trainer)."""
    from ..parallel import sharding
    image = jnp.asarray(image)
    b = image.shape[0]
    local_data = max(1, mesh.shape["data"] // jax.process_count())
    pad = (-b) % local_data
    if pad and jax.process_count() > 1:
        raise ValueError(
            f"local eval batch {b} not divisible by the local data axis "
            f"{local_data} in a {jax.process_count()}-process run; pick a "
            f"batch size divisible by {mesh.shape['data']} // process_count")
    if pad:
        image = jnp.concatenate(
            [image, jnp.repeat(image[-1:], pad, axis=0)], axis=0)
    image = sharding.shard_host_batch(image, mesh)
    params, prompt_latents = place_eval_inputs(params, prompt_latents, mesh)
    probs = zeroshot_probs(params, cfg, image, prompt_latents,
                           compute_dtype=compute_dtype)
    return probs[:b] if pad else probs


def gather_predictions(preds, targets):
    """Concatenate per-process prediction/label shards across hosts — the
    reference's accelerator.gather_for_metrics (CTClipInference.py:188).
    No-op in single-process runs."""
    if jax.process_count() == 1:
        return preds, targets
    from jax.experimental import multihost_utils
    preds = multihost_utils.process_allgather(jnp.asarray(preds))
    targets = multihost_utils.process_allgather(jnp.asarray(targets))
    return (np.asarray(preds).reshape(-1, preds.shape[-1]),
            np.asarray(targets).reshape(-1, targets.shape[-1]))


class CTClipInference:
    """Zero-shot + attribution driver (reference CTClipInference.py:35-223).

    `data` yields (images [B,1,D,H,W], texts, labels [B,18], names, paths).
    """

    def __init__(self, params, model_cfg: CTCLIPConfig, tokenizer,
                 data: Iterable,
                 results_folder: str = "./results",
                 pathologies: Sequence[str] = PATHOLOGIES,
                 zero_shot: bool = True,
                 visualize: Optional[dict] = None,
                 attribution_ctx=None,
                 mesh=None):
        self.params = params
        self.cfg = model_cfg
        self.tokenizer = tokenizer
        self.data = data
        self.pathologies = tuple(pathologies)
        self.zero_shot = zero_shot
        self.visualize = visualize or {}
        self.attribution_ctx = attribution_ctx
        self.mesh = mesh  # optional jax.sharding.Mesh: DP-sharded eval
        self.metrics_history = []

        base = Path(results_folder) / datetime.now().strftime("%d-%m-%Y")
        base.mkdir(parents=True, exist_ok=True)
        self.results_folder = base

    def zeroshot(self):
        prompt_tokens = tokenize_prompts(self.tokenizer, self.pathologies)
        prompt_latents = encode_prompt_latents(self.params, self.cfg, prompt_tokens)
        if self.mesh is not None:
            # place the eval constants ONCE, not per batch
            self.params, prompt_latents = place_eval_inputs(
                self.params, prompt_latents, self.mesh)

        # pipelined eval: dispatch every batch without a host sync and
        # materialize the (tiny [B, 18]) prob arrays at the end — a
        # fetch-per-batch loop pays the dispatch round-trip latency per
        # batch (~30 ms on relay-attached chips; +21% sustained throughput
        # measured at flagship shapes, round 3)
        preds, targets = [], []
        for images, _texts, labels, *_ in self.data:
            if self.mesh is not None:
                probs = zeroshot_probs_sharded(self.params, self.cfg, images,
                                               prompt_latents, self.mesh)
            else:
                probs = zeroshot_probs(self.params, self.cfg,
                                       jnp.asarray(images), prompt_latents)
            preds.append(probs)
            targets.append(np.asarray(labels))

        if self.mesh is not None:
            # multi-process: keep THIS process's rows (they pair with the
            # local labels); gather_predictions concatenates across hosts
            from ..parallel.sharding import local_rows
            preds = [local_rows(p) for p in preds]
        else:
            preds = [np.asarray(p) for p in preds]
        preds = np.concatenate(preds, axis=0)
        targets = np.concatenate(targets, axis=0)
        # multi-host: concatenate every process's shard before metrics
        # (reference gather_for_metrics, CTClipInference.py:188)
        preds, targets = gather_predictions(preds, targets)

        from ..utils import metrics as M
        m = M.calculate_metrics(preds, targets, list(self.pathologies))
        self.metrics_history.append(m)
        M.save_metrics(self.metrics_history, list(self.pathologies),
                       self.results_folder)
        try:
            M.plot_precision_recall_curve(targets, preds, list(self.pathologies),
                                          self.results_folder)
            M.plot_roc_curve(targets, preds, list(self.pathologies),
                             self.results_folder)
            M.plot_per_class_f1(m, list(self.pathologies), self.results_folder)
        except Exception as e:
            print(f"plots skipped: {e}")
        return m, preds, targets

    def infer(self):
        start = time.time()
        result = None
        if self.zero_shot:
            result = self.zeroshot()
        if self.visualize and self.attribution_ctx is not None:
            from ..attribution.suite import Visualizations
            vis = Visualizations(self.attribution_ctx, self.results_folder)
            vis.visualize(**self.visualize)
        print(f"Evaluation completed in {time.time() - start:.1f}s")
        return result

"""Training: jitted SPMD train/eval steps + host-side driver.

Reference: src/utils/CTClipTrainer.py. Key re-designs for TPU:
  * one jitted `train_step` holds the whole step — forward (global
    contrastive batch via GSPMD), symmetric InfoNCE, backward, global-norm
    clip, Adam update, VQ EMA write-back — instead of
    autocast/backward/clip/step round-trips through the framework
    (reference CTClipTrainer.py:177-204);
  * the GatherWithGrad + DDP-average pattern (reference ctclip.py:10-41)
    falls out of jit over batch-sharded inputs: the sim matrix is global,
    the loss is computed once, grads of replicated params are automatically
    all-reduced;
  * checkpoints carry params + opt state + step + PRNG key (the reference
    stores only model/optim and cannot resume mid-epoch, SURVEY.md 5);
  * bf16 compute / fp32 params+optimizer replaces fp16 GradScaler autocast.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Callable, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CTCLIPConfig, TrainConfig
from ..models.ctclip import contrastive_loss, ctclip_apply, init_ctclip
from ..parallel import sharding
from ..parallel.mesh import make_mesh
from . import checkpoint as ckpt
from .optimizer import get_optimizer

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array
    rng: Array


def create_train_state(key, model_cfg: CTCLIPConfig, train_cfg: TrainConfig,
                       params=None) -> tuple[TrainState, optax.GradientTransformation]:
    tx = get_optimizer(lr=train_cfg.lr, wd=train_cfg.wd, betas=train_cfg.betas,
                       eps=train_cfg.eps, max_grad_norm=train_cfg.max_grad_norm,
                       warmup_steps=train_cfg.warmup_steps,
                       decay_steps=train_cfg.decay_steps,
                       end_lr_frac=train_cfg.end_lr_frac,
                       mu_dtype=train_cfg.adam_mu_dtype)
    if params is None:
        params = init_ctclip(key, model_cfg)
    # fold_in gives the state its own key buffer: train_step donates the
    # state, and donating the caller's key array would delete it under them
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.fold_in(key, 0))
    return state, tx


def shard_train_state(state: TrainState, mesh, *, fsdp: bool = False) -> TrainState:
    """Place a host-resident TrainState onto the mesh: params by the TP (+
    optional FSDP) rules, Adam moments following their param's placement
    (parallel/sharding.py). The single authority for state placement —
    trainer, dryrun, and tests all go through here."""
    return state._replace(
        params=sharding.shard_params(state.params, mesh, fsdp=fsdp),
        opt_state=jax.device_put(
            state.opt_state,
            sharding.opt_state_shardings(state.opt_state, mesh, fsdp=fsdp)))


def _write_back_vq(params, vq_state):
    new_vis = dict(params["visual_transformer"])
    new_vis["vq"] = vq_state
    new_params = dict(params)
    new_params["visual_transformer"] = new_vis
    return new_params


def make_train_step(model_cfg: CTCLIPConfig, train_cfg: TrainConfig,
                    tx: optax.GradientTransformation) -> Callable:
    """Whole-step jit. Sharding comes from the inputs: params carry their
    NamedShardings (parallel/sharding.py), batches are sharded over "data" —
    GSPMD propagates and inserts the ICI collectives."""
    if train_cfg.grad_accum > 1:
        return make_train_step_gradcache(model_cfg, train_cfg, tx)
    compute_dtype = jnp.dtype(train_cfg.compute_dtype)

    def loss_fn(params, image, text_tokens, rng):
        out = ctclip_apply(
            params, model_cfg, text_tokens, image.astype(compute_dtype),
            freeze_vq=False, rng=rng, deterministic=False)
        loss = contrastive_loss(out.sim_matrix)
        if out.moe_aux is not None:  # MoE CT-ViT variant (parallel/moe.py)
            loss = loss + train_cfg.moe_aux_weight * out.moe_aux
        return loss, out.vq_state

    def train_step(state: TrainState, image, text_tokens):
        rng, step_rng = jax.random.split(state.rng)
        (loss, vq_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, image, text_tokens, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _write_back_vq(params, vq_state)  # EMA, not a grad step
        return TrainState(params, opt_state, state.step + 1, rng), loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_step_gradcache(model_cfg: CTCLIPConfig, train_cfg: TrainConfig,
                              tx: optax.GradientTransformation) -> Callable:
    """Chunked contrastive train step with the FULL-batch InfoNCE objective
    at microbatch activation memory (the GradCache construction, Gao et al.
    2021 — adapted here to whole-step jit + VQ EMA).

    Plain gradient accumulation is wrong for this model: the reference's
    whole point of `GatherWithGrad` (ctclip.py:10-41) is that InfoNCE is
    computed over the GLOBAL batch sim matrix, which couples every sample —
    summing per-microbatch losses would contrast each sample against only
    its own microbatch. Instead:

      pass 1  lax.scan over microbatches, no grads: image/text latents +
              VQ assignment statistics (counts/embed_sum are row-sums, so
              microbatch stats sum to the full-batch stats exactly);
      head    loss + cotangents d loss/d latents + the temperature grad from
              the [B, B] sim matrix — tiny;
      pass 2  lax.scan re-runs each microbatch forward under jax.vjp with
              its latent cotangents, accumulating param grads. XLA keeps
              activations for ONE microbatch at a time.

    Step semantics (loss value, param update, VQ EMA) match the single-pass
    step exactly (tests/test_gradcache.py pins it); only dropout mask
    DRAWS differ (per-microbatch fold_in), which is immaterial — dropout is
    0 in every reference config. Enables effective batch sizes far beyond
    single-pass HBM capacity, standing in for the reference's multi-GPU
    global batch on a single chip."""
    from ..models.ctclip import encode_image_latents, encode_text_latents
    from ..ops.taps import Taps
    from ..ops.vq import vq_batch_stats, vq_ema_update, vq_stats_input

    compute_dtype = jnp.dtype(train_cfg.compute_dtype)
    k = train_cfg.grad_accum
    vq_cfg = model_cfg.ctvit

    # MoE CT-ViT: the load-balance aux is computed PER MICROBATCH and
    # averaged — each microbatch is its own dispatch group, exactly the
    # GShard local-group aux. Because aux = E*sum_e(me_e * ce_e) is quadratic
    # in batch statistics, this differs from the single-pass full-batch aux
    # at O(within-batch routing variance) scale (~1e-3 observed on random
    # inits, i.e. ~1e-5 on the loss at the default 0.01 weight). The routed
    # FF path itself remains exactly equal to single-pass (pinned with
    # aux weight 0 in tests/test_moe.py).
    moe = vq_cfg.moe_experts > 0 and train_cfg.moe_aux_weight > 0.0

    def micro_latents(params, img_i, tok_i, rng_i):
        """One microbatch forward -> (fp32 latents, moe aux, VQ stats).
        freeze_vq=True so every microbatch looks up the step's ORIGINAL
        codebook, exactly like the single vq_apply over the full batch
        (lookup precedes the EMA write there too)."""
        _, r_text, r_img = jax.random.split(rng_i, 3)  # mirrors ctclip_apply
        taps = Taps(capture=("vq.input",))
        img_lat, vit_out = encode_image_latents(
            params, model_cfg, img_i.astype(compute_dtype), freeze_vq=True,
            taps=taps, rng=r_img, deterministic=False)
        txt_lat = encode_text_latents(
            params, model_cfg, tok_i, rng=r_text, deterministic=False,
            compute_dtype=compute_dtype)
        dim = vit_out.tokens.shape[-1]
        flat = vq_stats_input(taps.collected["vq.input"], dim)
        counts, embed_sum = vq_batch_stats(
            vit_out.codebook_ids.reshape(-1), flat, vq_cfg.codebook_size)
        aux = vit_out.moe_aux if moe else jnp.zeros((), jnp.float32)
        return (img_lat.astype(jnp.float32), txt_lat.astype(jnp.float32),
                aux, counts, embed_sum)

    def loss_from_latents(temperature, img_lat, txt_lat):
        sim = (img_lat @ txt_lat.T) * jnp.exp(temperature)
        return contrastive_loss(sim)

    def train_step(state: TrainState, image, text_tokens):
        b = image.shape[0]
        assert b % k == 0, (
            f"batch {b} not divisible by grad_accum={k}; also keep "
            f"batch/grad_accum divisible by the mesh data axis")
        m = b // k
        rng, step_rng = jax.random.split(state.rng)
        rngs = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            step_rng, jnp.arange(k))
        imgs = image.reshape(k, m, *image.shape[1:])
        toks = {key: v.reshape(k, m, *v.shape[1:])
                for key, v in text_tokens.items()}
        params = state.params

        # pass 1: latents + VQ stats, activations discarded per microbatch
        def p1(carry, inp):
            counts_c, esum_c, aux_c = carry
            img_i, tok_i, rng_i = inp
            il, tl, aux, counts, esum = micro_latents(params, img_i, tok_i, rng_i)
            return (counts_c + counts, esum_c + esum, aux_c + aux), (il, tl)

        vq0 = params["visual_transformer"]["vq"]
        stats0 = (jnp.zeros_like(vq0.cluster_size),
                  jnp.zeros_like(vq0.embed_avg), jnp.zeros((), jnp.float32))
        (counts, esum, aux_sum), (ils, tls) = jax.lax.scan(
            p1, stats0, (imgs, toks, rngs))
        img_lat = ils.reshape(b, -1)
        txt_lat = tls.reshape(b, -1)

        # loss head: cotangents w.r.t. latents + the temperature grad
        loss, (g_temp, g_il, g_tl) = jax.value_and_grad(
            loss_from_latents, argnums=(0, 1, 2))(
                params["temperature"], img_lat, txt_lat)
        if moe:
            loss = loss + train_cfg.moe_aux_weight * aux_sum / k
        g_ils = g_il.reshape(k, m, -1)
        g_tls = g_tl.reshape(k, m, -1)

        # pass 2: per-microbatch VJP, grads accumulated in the carry; the
        # aux cotangent is its loss weight / k (mean over microbatches)
        g_aux = jnp.asarray(train_cfg.moe_aux_weight / k, jnp.float32)

        def p2(grads_c, inp):
            img_i, tok_i, rng_i, gil_i, gtl_i = inp

            def f(p):
                il, tl, aux, _, _ = micro_latents(p, img_i, tok_i, rng_i)
                return (il, tl, aux) if moe else (il, tl)

            _, vjp_fn = jax.vjp(f, params)
            (g,) = vjp_fn((gil_i, gtl_i, g_aux) if moe else (gil_i, gtl_i))
            return jax.tree.map(jnp.add, grads_c, g), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        grads, _ = jax.lax.scan(p2, zeros, (imgs, toks, rngs, g_ils, g_tls))
        grads = dict(grads)
        grads["temperature"] = g_temp  # latent path never reads it

        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        vq_state = vq_ema_update(vq0, counts, esum,
                                 decay=vq_cfg.vq_decay, eps=vq_cfg.vq_eps)
        new_params = _write_back_vq(new_params, vq_state)
        return TrainState(new_params, opt_state, state.step + 1, rng), loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model_cfg: CTCLIPConfig, train_cfg: TrainConfig) -> Callable:
    compute_dtype = jnp.dtype(train_cfg.compute_dtype)

    @jax.jit
    def eval_step(params, image, text_tokens):
        out = ctclip_apply(params, model_cfg, text_tokens,
                           image.astype(compute_dtype), freeze_vq=True,
                           deterministic=True)
        return contrastive_loss(out.sim_matrix)

    return eval_step


class CTClipTrainer:
    """Host-side training driver (reference CTClipTrainer.py:33-304).

    `train_data` / `valid_data` are iterables (re-iterable per epoch) yielding
    (images ndarray [B, 1, D, H, W], texts list[str]) host batches — see
    data/loader.py. Tokenization (CXR-BERT tokenizer, max_length 512,
    reference CTClipTrainer.py:186-192) happens on host per step.
    """

    def __init__(self,
                 model_cfg: CTCLIPConfig,
                 train_cfg: TrainConfig,
                 tokenizer,
                 train_data: Iterable,
                 valid_data: Iterable,
                 results_folder: str = "./results",
                 params=None,
                 mesh=None):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.tokenizer = tokenizer
        self.train_data = train_data
        self.valid_data = valid_data
        self.mesh = mesh if mesh is not None else make_mesh()

        key = jax.random.PRNGKey(train_cfg.seed)
        self.state, self.tx = create_train_state(key, model_cfg, train_cfg,
                                                 params=params)
        if (train_cfg.fsdp and not train_cfg.sharded_checkpoints
                and jax.process_count() > 1):
            # msgpack save gathers the full state onto process 0 —
            # np.asarray on a non-fully-addressable FSDP array raises at the
            # FIRST save, hours into training. Refuse up front instead.
            raise ValueError(
                "fsdp=True in a multi-process run requires "
                "sharded_checkpoints=True (--sharded-checkpoints): the "
                "msgpack checkpoint path cannot gather params that no "
                "single process holds")
        # opt state follows the params' layout (Adam moments of a sharded
        # param are sharded the same way); with train_cfg.fsdp both also
        # shard over "data" — ZeRO-3 at rest, GSPMD collectives in the step
        self.state = shard_train_state(self.state, self.mesh,
                                       fsdp=train_cfg.fsdp)
        self.train_step = make_train_step(model_cfg, train_cfg, self.tx)
        self.eval_step = make_eval_step(model_cfg, train_cfg)

        # dated + indexed results dir (reference CTClipTrainer.py:122-131).
        # In multi-process runs PROCESS 0 picks the run dir and broadcasts it:
        # counting subdirs independently per process races on a shared fs
        # (both count N, one mkdirs N+1 before the other counts -> different
        # run dirs), and collective writes (sharded checkpoints) require every
        # process to agree on the path.
        if jax.process_count() <= 1 or jax.process_index() == 0:
            base = Path(results_folder) / datetime.now().strftime("%d-%m-%Y")
            base.mkdir(parents=True, exist_ok=True)
            idx = len([d for d in base.iterdir() if d.is_dir()]) + 1
            run_rel = f"{base.name}/{idx}"
        else:
            run_rel = ""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            buf = np.zeros(64, np.uint8)
            raw = run_rel.encode()
            buf[:len(raw)] = np.frombuffer(raw, np.uint8)
            buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            run_rel = bytes(buf[buf != 0]).decode()
        self.results_folder = Path(results_folder) / run_rel
        self.results_folder.mkdir(parents=True, exist_ok=True)

        self.train_losses = {"steps": [], "epochs": []}
        self.valid_losses = []
        self.best_score = float("inf")

        # multi-host: process 0 is the reference's rank-0 / is_main_process
        # (maybe_print, checkpoint + plot writes, CTClipTrainer.py:70,136-145)
        self.is_main = jax.process_index() == 0

        # data-stream position for step-level resume: (epoch, batches
        # consumed within it), updated by the train loop and persisted as a
        # sidecar next to every checkpoint. The reference cannot resume at
        # all (CTClipTrainer.py:136-145); epoch-level resume alone loses
        # the sampler position of a mid-epoch --save-every-steps checkpoint.
        self._pos = {"epoch": 0, "step_in_epoch": 0, "steps_per_epoch": None}
        self._resume_pos = None

    def maybe_print(self, *args, **kwargs):
        if self.is_main:
            print(*args, **kwargs)

    def _stop_trace(self):
        if getattr(self, "_tracing", False):
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._tracing = False
            self.maybe_print(f"profiler trace -> {self.cfg.profile_dir}")

    # -- plumbing ----------------------------------------------------------

    def tokenize(self, texts):
        enc = self.tokenizer(
            list(texts), return_tensors="np", padding="max_length",
            truncation=True, max_length=self.cfg.text_max_length)
        out = {"input_ids": jnp.asarray(enc["input_ids"]),
               "attention_mask": jnp.asarray(enc["attention_mask"])}
        if "token_type_ids" in enc:
            out["token_type_ids"] = jnp.asarray(enc["token_type_ids"])
        return out

    def _put_batch(self, images, texts):
        images = jnp.asarray(images)
        # this process's shard must split evenly over its local devices
        local_data = self.mesh.shape["data"] // jax.process_count()
        if images.shape[0] % max(local_data, 1) == 0:
            put = lambda v: sharding.shard_host_batch(v, self.mesh)
        elif jax.process_count() > 1:
            # replication is NOT valid across hosts: each process holds a
            # DIFFERENT sampler shard, so declaring the local batch
            # replicated over a process-spanning mesh silently feeds every
            # host a different "global" batch — divergent losses/updates
            # under GSPMD. Refuse instead.
            raise ValueError(
                f"local batch {images.shape[0]} not divisible by the local "
                f"data axis {local_data} in a {jax.process_count()}-process "
                f"run; pick a batch size divisible by "
                f"{self.mesh.shape['data']} // process_count")
        else:  # single-process small batch: replicate (wastes DP, correct)
            if not getattr(self, "_warned_replicate", False):
                self.maybe_print(
                    f"batch {images.shape[0]} not divisible by local data "
                    f"axis {local_data}; replicating batches")
                self._warned_replicate = True
            put = lambda v: jax.device_put(v, sharding.replicated(self.mesh))
        images = put(images)
        tokens = {k: put(v) for k, v in self.tokenize(texts).items()}
        return images, tokens

    def save_model(self, name: str):
        if self.cfg.sharded_checkpoints:
            # collective: EVERY process writes its own shards (no rank gate)
            ckpt.save_checkpoint_sharded(self.results_folder / name,
                                         self.state)
        elif self.is_main:  # rank-0 write (reference CTClipTrainer.py:136)
            ckpt.save_checkpoint(self.results_folder / name, self.state)
        else:
            return
        if self.is_main:
            (self.results_folder / "architecture.json").write_text(
                json.dumps({"model_cfg": repr(self.model_cfg),
                            "train_cfg": repr(self.cfg)}, indent=2))
            # data-position sidecar: lets load_model resume EXACTLY at this
            # step (sampler epoch + batches consumed). Atomic for the same
            # reason the checkpoint write is; `global_step` stamps which
            # checkpoint it belongs to — a crash BETWEEN the checkpoint
            # rename and this rename leaves a stale sidecar, and resuming
            # from a stale position would re-apply (or skip) batches. The
            # loader detects the mismatch and re-derives the position from
            # the checkpoint's own step counter.
            pos_path = self.results_folder / (name + ".pos.json")
            tmp = pos_path.with_name(pos_path.name + ".tmp")
            tmp.write_text(json.dumps(
                {**self._pos, "global_step": int(self.state.step)}))
            tmp.replace(pos_path)

    def load_model(self, path):
        pos_path = Path(str(path) + ".pos.json")
        pos = (json.loads(pos_path.read_text())
               if pos_path.exists() else None)
        if jax.process_count() > 1:
            # only rank 0 WRITES the sidecar (save_model), so on a non-shared
            # or slowly-propagating fs other ranks may not see it. Every rank
            # must agree on the resume position or the loops diverge
            # (step-level resume on some ranks, epoch-level on others ->
            # mismatched collectives / silent divergence) — broadcast rank-0's
            # parsed view instead of trusting each rank's local read.
            from jax.experimental import multihost_utils
            buf = np.zeros(512, np.uint8)
            if self.is_main and pos is not None:
                raw = json.dumps(pos).encode()
                if len(raw) > buf.size:
                    raise ValueError(
                        f"resume sidecar too large to broadcast ({len(raw)} "
                        f"> {buf.size} bytes)")
                buf[:len(raw)] = np.frombuffer(raw, np.uint8)
            buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            raw = bytes(buf[buf != 0])
            pos = json.loads(raw.decode()) if raw else None
        if self.cfg.sharded_checkpoints:
            self.state = ckpt.load_checkpoint_sharded(path, self.state)
        else:
            # from_bytes returns host numpy leaves — re-place the
            # mesh-sharded ones (NamedSharding: params, opt state) on the
            # live state's shardings, or a restored TP/FSDP run would
            # silently continue with replicated params. Scalars (step, rng)
            # stay uncommitted so jit places them freely.
            restored = ckpt.load_checkpoint(path, self.state)

            def replace(r, live):
                s = getattr(live, "sharding", None)
                if isinstance(s, jax.sharding.NamedSharding):
                    return jax.device_put(r, s)
                return r

            self.state = jax.tree.map(replace, restored, self.state)

        step = int(self.state.step)
        if (pos is not None and pos.get("global_step") is not None
                and int(pos["global_step"]) != step):
            # stale sidecar (crash landed between the checkpoint rename and
            # the sidecar rename): the batch position it describes belongs
            # to an OLDER checkpoint — resuming from it would re-apply (or
            # skip) batches the restored state already consumed. The data
            # order is a pure function of (epoch, batch index), so the true
            # position derives from the restored step counter alone when
            # steps_per_epoch is known; the partial epoch's loss sum is
            # lost (its average will cover post-resume steps only).
            spe = pos.get("steps_per_epoch")
            if spe:
                pos = {"epoch": step // int(spe) + 1,
                       "step_in_epoch": step % int(spe),
                       "steps_per_epoch": int(spe)}
                self.maybe_print(
                    f"resume sidecar was stale (crash window); position "
                    f"re-derived from step {step}")
            else:
                pos = None     # epoch-level fallback (unsized data stream)
        self._resume_pos = pos

    # -- loops --------------------------------------------------------------

    def evaluate(self, epoch: int) -> float:
        total, n = 0.0, 0
        for images, texts, *_ in self.valid_data:
            images, tokens = self._put_batch(images, texts)
            total += float(self.eval_step(self.state.params, images, tokens))
            n += 1
        avg = total / max(n, 1)
        self.valid_losses.append(avg)
        self.maybe_print(f"Epoch {epoch} - Validation Loss: {avg:.4f}")

        if epoch == 0 or (avg < self.best_score and self.cfg.save_best_model):
            self.best_score = min(avg, self.best_score)
            self.save_model("best_checkpoint.orbax"
                            if self.cfg.sharded_checkpoints
                            else "best_checkpoint.msgpack")
        if self.is_main:
            try:
                from ..utils.metrics import plot_training_progress
                plot_training_progress(self.train_losses, self.valid_losses,
                                       self.results_folder)
            except Exception as e:  # plotting is best-effort
                print(f"plot skipped: {e}")
        return avg

    def train(self):
        self.maybe_print("Training started")
        start = time.time()
        # step-loss logging is subsampled num_save_split times per epoch
        # (reference CTClipTrainer.py:257,274)
        try:
            steps_per_epoch = len(self.train_data)
            save_at = max(1, steps_per_epoch // self.cfg.num_save_split)
        except TypeError:  # unsized iterable: log every step
            steps_per_epoch = None
            save_at = 1
        # resume: a restored full TrainState carries the global step counter
        # (train/checkpoint.py — the reference's checkpoints store only
        # model/optim and always restart, CTClipTrainer.py:136-145). With a
        # position sidecar (written by save_model) resume is STEP-level: the
        # partial epoch restarts at its exact batch — the sampler order is a
        # pure function of the epoch number and the skipped batches are never
        # preprocessed (data/loader.iter_from). Without a sidecar
        # (pre-sidecar checkpoint) it falls back to epoch-level: completed
        # epochs are skipped, a partial epoch is re-run from its start.
        resumed_step = int(self.state.step)
        start_epoch, resume_skip = 1, 0
        if resumed_step and self._resume_pos:
            pos = self._resume_pos
            start_epoch = max(int(pos.get("epoch") or 1), 1)
            resume_skip = int(pos.get("step_in_epoch") or 0)
            saved_spe = pos.get("steps_per_epoch")
            if saved_spe and steps_per_epoch and saved_spe != steps_per_epoch:
                # the data stream changed shape since the save; the saved
                # batch position is meaningless — restart the partial epoch
                self.maybe_print(
                    f"steps_per_epoch changed ({saved_spe} -> "
                    f"{steps_per_epoch}); falling back to epoch-level resume")
                resume_skip = 0
            spe = steps_per_epoch or saved_spe
            if spe and resume_skip >= spe:  # epoch completed: start the next
                start_epoch += 1
                resume_skip = 0
            if start_epoch <= self.cfg.num_epochs:
                self.maybe_print(
                    f"Resuming at step {resumed_step}: epoch {start_epoch}"
                    + (f", batch {resume_skip + 1}" if resume_skip else ""))
        elif resumed_step and steps_per_epoch:
            done_epochs = min(resumed_step // steps_per_epoch,
                              self.cfg.num_epochs)
            start_epoch = done_epochs + 1
            if done_epochs:
                self.maybe_print(
                    f"Resuming at step {resumed_step}: skipping "
                    f"{done_epochs} completed epoch(s)")
        for epoch in range(start_epoch, self.cfg.num_epochs + 1):
            skip = resume_skip if epoch == start_epoch else 0
            epoch_start = time.time()
            # re-shuffle per epoch (reference train_sampler.set_epoch, :265)
            sampler = getattr(self.train_data, "sampler", None)
            if sampler is not None and hasattr(sampler, "set_epoch"):
                sampler.set_epoch(epoch)
            total_loss, steps = 0.0, 0
            if skip and self._resume_pos:
                # restore the partial epoch's running loss sum so the epoch
                # average appended to train_losses["epochs"] covers the WHOLE
                # epoch, not just the post-resume steps (the sidecar persists
                # them at every --save-every-steps checkpoint)
                total_loss = float(self._resume_pos.get("loss_sum") or 0.0)
                steps = int(self._resume_pos.get("loss_steps") or 0)
            pending = None   # (step, device loss) fetched ONE step late

            def log_step(step, loss):
                nonlocal total_loss, steps
                # with the global contrastive batch under GSPMD the loss is
                # already the cross-process value — the reference's
                # avg_device_loss gather (CTClipTrainer.py:156-162) averages
                # identical per-rank copies of the same global loss
                loss = float(loss)
                total_loss += loss
                steps += 1
                if step % save_at == 0:
                    self.train_losses["steps"].append(loss)
                self.maybe_print(f"Epoch {epoch} | Step {step} | Loss: {loss:.6f}")
                return loss

            if skip:
                # mid-epoch resume: consume the epoch's deterministic batch
                # order from position `skip` (loaders skip without
                # preprocessing; generic iterables are drained via islice)
                if hasattr(self.train_data, "iter_from"):
                    data_iter = self.train_data.iter_from(skip)
                else:
                    import itertools
                    data_iter = itertools.islice(
                        iter(self.train_data), skip, None)
            else:
                data_iter = self.train_data
            for step, (images, texts) in enumerate(data_iter, start=skip + 1):
                self._pos = {"epoch": epoch, "step_in_epoch": step,
                             "steps_per_epoch": steps_per_epoch}
                # optional profiler window: steps [2, 2 + profile_steps)
                # of epoch 1 (step 1 carries the compile; traces from
                # tools/xplane.py or tensorboard read the dump)
                if self.cfg.profile_steps > 0 and epoch == 1 and self.is_main:
                    if step == 2:
                        jax.profiler.start_trace(self.cfg.profile_dir)
                        self._tracing = True
                    elif step == 2 + self.cfg.profile_steps:
                        self._stop_trace()
                images, tokens = self._put_batch(images, texts)
                self.state, loss = self.train_step(self.state, images, tokens)
                if epoch == 1 and step == 1 and resumed_step == 0:
                    # bootstrap logging keeps its synchronous shape
                    l0 = log_step(1, loss)
                    self.train_losses["epochs"].append(l0)
                    if 1 % save_at != 0:  # avoid double-append at save_at==1
                        self.train_losses["steps"].append(l0)
                    self.evaluate(0)  # step-0 bootstrap eval (reference :278-281)
                    continue
                # pipelined logging: materialize the PREVIOUS step's loss
                # only after this step is dispatched, so the host never sits
                # in the dispatch round-trip (~30 ms/step on relay-attached
                # chips) — same step-by-step prints, one step late
                if pending is not None:
                    log_step(*pending)
                pending = (step, loss)
                if (self.cfg.save_every_steps
                        and int(self.state.step)
                        % self.cfg.save_every_steps == 0):
                    # periodic crash-recovery save (atomic write); resume
                    # continues at exactly this step via the position sidecar.
                    # Flush the pipelined loss first so the persisted running
                    # sum covers THIS step — a resumed epoch's average then
                    # equals the uninterrupted epoch's average exactly.
                    if pending is not None:
                        log_step(*pending)
                        pending = None
                    self._pos = {**self._pos, "loss_sum": total_loss,
                                 "loss_steps": steps}
                    self.save_model("last_checkpoint.orbax"
                                    if self.cfg.sharded_checkpoints
                                    else "last_checkpoint.msgpack")
            if pending is not None:
                log_step(*pending)
            self._stop_trace()  # epoch shorter than the profile window

            # epoch complete: saves from here (best_checkpoint in evaluate)
            # resume at the NEXT epoch's first batch
            self._pos = {"epoch": epoch + 1, "step_in_epoch": 0,
                         "steps_per_epoch": steps_per_epoch}
            avg = total_loss / max(steps, 1)
            self.train_losses["epochs"].append(avg)
            self.maybe_print(f"Epoch {epoch} done. Avg loss {avg:.6f} "
                             f"({time.time() - epoch_start:.1f}s)")
            self.evaluate(epoch)
        self.maybe_print(f"Training completed in {time.time() - start:.1f}s")
        return self.state

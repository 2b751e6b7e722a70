"""Headline benchmark: zero-shot CT classification throughput per chip,
plus attribution-map throughput (rollout / IG / occlusion — the second half
of BASELINE.json's primary metric).

Prints ONE JSON line:
  {"metric": "zeroshot_volumes_per_sec_per_chip", "value": N,
   "unit": "volumes/s", "vs_baseline": R, "extra": {...attribution numbers}}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
measured, not quoted: R = (our batched zero-shot path) / (the reference's
*algorithm* run on the same chip). The reference algorithm re-encodes the
full visual tower once per pathology at batch 1 (18 visual forwards + 18
prompt-pair text forwards per scan, reference CTClipInference.py:153-178);
ours hoists the image latent out of the pathology loop, precomputes all 36
prompt latents once per checkpoint, and batches scans. Both paths produce
identical scores (tests/test_train_infer.py::test_zeroshot_hoisting_is_scoring_exact).

Flagship model config: reference train_ctclip.py:19-37 (CT-ViT dim 512,
4+4 layers, 13,824 tokens per 480x480x240 volume; CXR-BERT text tower).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: flagship programs take minutes through the
# remote-compile relay; cache them across bench invocations
try:
    cache_dir = os.environ.get("CTCLIP_JAX_CACHE", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from ct_clip_ut_tpu.config import BertConfig, CTCLIPConfig, CTViTConfig
from ct_clip_ut_tpu.infer.zeroshot import zeroshot_probs
from ct_clip_ut_tpu.models.ctclip import (ctclip_apply, encode_text_latents,
                                          init_ctclip)

N_PATHOLOGIES = 18
BATCH = int(os.environ.get("CTCLIP_BENCH_BATCH", "16"))
STEPS = int(os.environ.get("CTCLIP_BENCH_STEPS", "10"))
REF_SCANS = int(os.environ.get("CTCLIP_BENCH_REF_SCANS", "3"))
WITH_ATTRIBUTION = os.environ.get("CTCLIP_BENCH_ATTRIBUTION", "1") != "0"
WITH_KERNEL_PARITY = os.environ.get("CTCLIP_BENCH_KERNELS", "1") != "0"
WITH_TRAIN = os.environ.get("CTCLIP_BENCH_TRAIN", "1") != "0"
WITH_OCC_FULL = os.environ.get("CTCLIP_BENCH_OCC_FULL", "1") != "0"
IG_STEPS = int(os.environ.get("CTCLIP_BENCH_IG_STEPS", "50"))
IG_MAPS = int(os.environ.get("CTCLIP_BENCH_IG_MAPS", "3"))
IG_CHUNK = int(os.environ.get("CTCLIP_BENCH_IG_CHUNK", "5"))
OCC_WINDOWS = int(os.environ.get("CTCLIP_BENCH_OCC_WINDOWS", "256"))
TRAIN_BATCH = int(os.environ.get("CTCLIP_BENCH_TRAIN_BATCH", "8"))
WITH_CTGEN = os.environ.get("CTCLIP_BENCH_CTGEN", "1") != "0"
CTGEN_BATCH = int(os.environ.get("CTCLIP_BENCH_CTGEN_BATCH", "4"))
CTGEN_STEPS = int(os.environ.get("CTCLIP_BENCH_CTGEN_STEPS", "5"))
TRAIN_STEPS = int(os.environ.get("CTCLIP_BENCH_TRAIN_STEPS", "5"))
# bf16 kernels vs bf16 XLA twins: both sides round at 2^-8 per element and
# the 512-576-length contractions accumulate; 1.5e-2 relative max-err is the
# asserted band, ~1.7x above the worst measured kernel (attn_packed_bwd dx
# at ~0.009 — two independent bf16 rounding chains, kernel transposed-
# projection layout vs twin head-split layout; upgrading the dx/dw dots to
# fp32 costs ~4x on those MXU ops for no training-relevant gain, and every
# attribution map runs the fp32 parity_cfg XLA path, pinned <=1e-3 vs torch).
# fp32 interpret parity is pinned at 1e-5 by tests/test_pallas.py, so the
# gap is rounding, not math.
KERNEL_TOL = float(os.environ.get("CTCLIP_BENCH_KERNEL_TOL", "1.5e-2"))


def _probe_chip(deadline_s: float = 180.0) -> None:
    """Fail FAST if the TPU worker is dead. A dead relay-attached worker
    makes every JAX call hang forever (observed: multi-hour outages after a
    watchdog kill) — a trivial matmul on a daemon thread bounded by a
    deadline turns that into a clear error instead of a silent driver
    timeout."""
    import threading

    done = threading.Event()
    err: list = []

    def probe():
        try:
            x = jnp.ones((128, 128), jnp.bfloat16)
            float((x @ x).astype(jnp.float32).sum())
            done.set()
        except Exception as e:          # pragma: no cover
            err.append(e)
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(deadline_s) or err:
        raise SystemExit(
            f"TPU probe did not complete within {deadline_s:.0f}s "
            f"(worker dead or relay unavailable){': ' + repr(err[0]) if err else ''}")


def flagship_cfg() -> CTCLIPConfig:
    return CTCLIPConfig(
        dim_text=768, dim_image=294912, dim_latent=512,
        ctvit=CTViTConfig(dim=512, codebook_size=8192, image_size=480,
                          patch_size=20, temporal_patch_size=10,
                          spatial_depth=4, temporal_depth=4,
                          dim_head=32, heads=8),
        bert=BertConfig())


def bench_kernel_parity() -> dict:
    """Compiled (NON-interpret) Pallas kernels vs their XLA twins at
    flagship shapes on the real chip, forward AND backward — the on-chip
    correctness artifact for every fused kernel (the CPU suite pins the
    same kernels in interpret mode only; a Mosaic layout/VMEM bug would be
    invisible there). Reference semantics: attention.py:126-182 (cosine
    attention), attention.py:38-51 (GEGLU FF), ctvit.py:44-52 (patch
    embed), vector_quantize_pytorch (VQ nearest). Emits kparity_* max
    relative errors and a kernel_parity_ok flag; main() fails the bench
    loudly if any kernel exceeds KERNEL_TOL."""
    import numpy as np

    from ct_clip_ut_tpu.ops.pallas_attn_block import (_xla_reference_block,
                                                      attention_block_fused)
    from ct_clip_ut_tpu.ops.pallas_attn_packed import (attention_block_packed,
                                                       packed_attention_xla)
    from ct_clip_ut_tpu.ops.pallas_ff import _xla_reference, geglu_ff_fused
    from ct_clip_ut_tpu.ops.pallas_patch_embed import (_xla_twin,
                                                       patch_embed_fused)
    from ct_clip_ut_tpu.ops.pallas_vq import vq_nearest_pallas
    from ct_clip_ut_tpu.ops.layers import l2norm

    out = {}
    failures = []
    dt = jnp.bfloat16

    def rel_err(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6))

    def record(name, err):
        out[f"kparity_{name}"] = round(err, 5)
        if err > KERNEL_TOL:
            failures.append((name, err))

    def check(name, fused, twin, args, grad_args):
        record(f"{name}_fwd", rel_err(jax.jit(fused)(*args),
                                      jax.jit(twin)(*args)))
        loss_f = lambda *a: (fused(*a).astype(jnp.float32) ** 2).sum()
        loss_t = lambda *a: (twin(*a).astype(jnp.float32) ** 2).sum()
        g1 = jax.jit(jax.grad(loss_f, argnums=grad_args))(*args)
        g2 = jax.jit(jax.grad(loss_t, argnums=grad_args))(*args)
        record(f"{name}_bwd", max(rel_err(a, b) for a, b in zip(g1, g2)))

    d, h, dh, n_sp, t = 512, 8, 32, 576, 24
    ks = jax.random.split(jax.random.PRNGKey(42), 10)
    gamma = (jax.random.normal(ks[0], (d,)) * 0.1 + 1.0)
    wq = (jax.random.normal(ks[1], (d, h * dh)) / 23).astype(dt)
    wk = (jax.random.normal(ks[2], (d, h * dh)) / 23).astype(dt)
    wv = (jax.random.normal(ks[3], (d, h * dh)) / 23).astype(dt)
    wo = (jax.random.normal(ks[4], (h * dh, d)) / 16).astype(dt)
    qs = jnp.abs(jax.random.normal(ks[5], (dh,))) + 0.5
    ksc = jnp.abs(jax.random.normal(ks[6], (dh,))) + 0.5
    bias = jax.random.normal(ks[7], (h, n_sp, n_sp)).astype(jnp.float32)

    # spatial attention block: (b*t)=24 rows of 576 tokens (one volume)
    x_sp = jax.random.normal(ks[8], (t, n_sp, d)).astype(dt)
    check("attn_block",
          lambda *a: attention_block_fused(*a, bias, 8.0, False, True),
          lambda *a: _xla_reference_block(*a, bias, 8.0, True),
          (x_sp, gamma, wq, wk, wv, wo, qs, ksc), tuple(range(8)))

    # packed temporal: 576 sequences of 24 tokens
    x_tm = jax.random.normal(ks[9], (n_sp, t, d)).astype(dt)
    check("attn_packed",
          lambda *a: attention_block_packed(*a, 8.0, False, True),
          lambda *a: packed_attention_xla(*a, 8.0, True),
          (x_tm, gamma, wq, wk, wv, wo, qs, ksc), tuple(range(8)))

    # fused BERT encoder layer (the text-tower train kernel): fwd + bwd vs
    # the XLA twin at the flagship BERT geometry, deterministic mode
    from ct_clip_ut_tpu.ops.pallas_bert_layer import (bert_layer_fused,
                                                      bert_layer_xla)
    db, fb, hb, bb, nb = 768, 3072, 12, 4, 512
    kb = jax.random.split(jax.random.PRNGKey(77), 12)
    xb = jax.random.normal(kb[0], (bb, nb, db)).astype(dt)
    mrow = jnp.zeros((bb, nb), jnp.float32).at[1, nb - 37:].set(
        jnp.finfo(jnp.float32).min)
    wb = [jax.random.normal(kb[1], (db, 3 * db)) / 28.0,
          jax.random.normal(kb[2], (3 * db,)) * 0.1,
          jax.random.normal(kb[3], (db, db)) / 28.0,
          jax.random.normal(kb[4], (db,)) * 0.1,
          1.0 + jax.random.normal(kb[5], (db,)) * 0.1,
          jax.random.normal(kb[6], (db,)) * 0.1,
          jax.random.normal(kb[7], (db, fb)) / 28.0,
          jax.random.normal(kb[8], (fb,)) * 0.1,
          jax.random.normal(kb[9], (fb, db)) / 55.0,
          jax.random.normal(kb[10], (db,)) * 0.1,
          1.0 + jax.random.normal(kb[11], (db,)) * 0.1,
          jnp.zeros((db,))]
    z3 = jnp.zeros(3, jnp.int32)
    check("bert_layer",
          lambda x, *w: bert_layer_fused(x, mrow, z3, *w, hb, 1e-12, 0.0,
                                         0.0, False, False),
          lambda x, *w: bert_layer_xla(x, mrow, *w, hb, 1e-12),
          (xb, *wb), tuple(range(13)))

    # q-row-stripe kernel (the MaskGit/CTGenerate serving route), both
    # variants: b=2 routes the shared-bias kv kernel (bias cast to the
    # compute dtype there), b=1 the per-item grid. Backward is the XLA twin
    # by construction (custom VJP), so only forwards need the chip check.
    from ct_clip_ut_tpu.ops.pallas_attn_qrows import attention_qrows_fused
    dh_q, n_q = 64, 1024                 # MaskGit head geometry (8 x 64)
    hd_q = h * dh_q
    wq_q = (jax.random.normal(ks[1], (d, hd_q)) / 23).astype(dt)
    wk_q = (jax.random.normal(ks[2], (d, hd_q)) / 23).astype(dt)
    wv_q = (jax.random.normal(ks[3], (d, hd_q)) / 23).astype(dt)
    wo_q = (jax.random.normal(ks[4], (hd_q, d)) / 23).astype(dt)
    qs_q = jnp.abs(jax.random.normal(ks[5], (dh_q,))) + 0.5
    ks_q = jnp.abs(jax.random.normal(ks[6], (dh_q,))) + 0.5
    bias_q = jax.random.normal(ks[7], (h, n_q, n_q)).astype(jnp.float32)
    for nm, b_q in (("attn_qrows_kv", 2), ("attn_qrows", 1)):
        x_q = jax.random.normal(ks[8], (b_q, n_q, d)).astype(dt)
        args_q = (x_q, gamma, wq_q, wk_q, wv_q, wo_q, qs_q, ks_q)
        got = jax.jit(lambda *a: attention_qrows_fused(
            *a, bias_q, 8.0, 64, False, True))(*args_q)
        want = jax.jit(lambda *a: _xla_reference_block(
            *a, bias_q, 8.0, True))(*args_q)
        record(f"{nm}_fwd", rel_err(got, want))

    # GEGLU FF: 13,824 tokens x 512, inner 4*2/3*512
    inner = int(4 * 2 / 3 * d)
    kf = jax.random.split(jax.random.PRNGKey(43), 6)
    x_ff = jax.random.normal(kf[0], (t * n_sp, d)).astype(dt)
    beta = jax.random.normal(kf[1], (d,)) * 0.1
    fwv = (jax.random.normal(kf[2], (d, inner)) / 23).astype(dt)
    fwg = (jax.random.normal(kf[3], (d, inner)) / 23).astype(dt)
    fw2 = (jax.random.normal(kf[4], (inner, d)) / 26).astype(dt)
    check("geglu_ff",
          lambda *a: geglu_ff_fused(*a, False, True),
          lambda x, g, b, v, w, w2: _xla_reference(x, g, b, v, w, w2, True),
          (x_ff, gamma, beta, fwv, fwg, fw2), tuple(range(6)))

    # W8A8 int8 FF (serving-only, forward-only): compiled kernel vs its
    # XLA int8 twin — same quantized math, so any divergence is a Mosaic
    # layout/lowering bug, not quantization error (ops/pallas_ff_int8.py)
    from ct_clip_ut_tpu.ops.pallas_ff_int8 import (geglu_ff_int8,
                                                   quantize_weight_int8,
                                                   xla_int8_reference)
    fwvq, fsv = quantize_weight_int8(fwv)
    fwgq, fsg = quantize_weight_int8(fwg)
    fw2q, fs2 = quantize_weight_int8(fw2)
    record("geglu_ff_int8_fwd", rel_err(
        jax.jit(lambda x: geglu_ff_int8(
            x, gamma, beta, fwvq, fwgq, fw2q, fsv, fsg, fs2,
            False, True))(x_ff),
        jax.jit(lambda x: xla_int8_reference(
            x, gamma, beta, fwvq, fwgq, fw2q, fsv, fsg, fs2,
            residual=True))(x_ff)))

    # fused patch embed: full flagship volume, fwd + the residual-based
    # parameter backward (saved conv/moments + Pallas dkw kernel) vs full
    # autodiff through the XLA twin
    patch, t_patch, dim = 20, 10, 512
    patch_dim = t_patch * patch * patch
    kp = jax.random.split(jax.random.PRNGKey(44), 5)
    img = jax.random.normal(kp[0], (1, 1, 240, 480, 480)).astype(dt)
    pe_g1 = jax.random.normal(kp[1], (patch_dim,)) * 0.2 + 1.0
    pe_w = jax.random.normal(kp[2], (patch_dim, dim)) / 64.0
    wg_ = (pe_w * pe_g1[:, None]).reshape(1, t_patch, patch, patch, dim)
    s1 = (pe_w * pe_g1[:, None]).sum(axis=0)
    b1 = jax.random.normal(kp[3], (dim,)) * 0.1
    g2 = jax.random.normal(kp[4], (dim,)) * 0.2 + 1.0
    b2 = jnp.zeros((dim,))
    k1d = wg_.reshape(t_patch * patch, patch, dim).transpose(1, 0, 2)
    got = jax.jit(lambda im: patch_embed_fused(
        im, k1d, s1, b1, g2, b2, patch, t_patch, False))(img)
    want = jax.jit(lambda im: _xla_twin(
        im, k1d, s1, b1, g2, b2, patch, t_patch))(img)
    record("patch_embed_fwd", rel_err(got, want))
    pe_loss_f = lambda *a: (patch_embed_fused(
        img, *a, patch, t_patch, False).astype(jnp.float32) ** 2).sum()
    pe_loss_t = lambda *a: (_xla_twin(
        img, *a, patch, t_patch).astype(jnp.float32) ** 2).sum()
    pe_args = (k1d, s1, b1, g2, b2)
    g1 = jax.jit(jax.grad(pe_loss_f, argnums=tuple(range(5))))(*pe_args)
    g2_ = jax.jit(jax.grad(pe_loss_t, argnums=tuple(range(5))))(*pe_args)
    record("patch_embed_bwd", max(rel_err(a, b) for a, b in zip(g1, g2_)))

    # PEG residual backward: the custom VJP (Pallas dkw weight grad on TPU,
    # now the DEFAULT train path — XLA autodiff of the grouped conv
    # mis-scales the weight grad on multi-axis meshes, ops/layers.py) vs
    # plain autodiff of the same composition, which IS correct on a flat
    # single-chip mesh and so serves as the twin here
    from ct_clip_ut_tpu.ops.layers import (_peg_conv_residual,
                                           _peg_conv_residual_impl, init_peg)
    kg = jax.random.split(jax.random.PRNGKey(46), 2)
    v_peg = jax.random.normal(kg[0], (2, t, 24, 24, d)).astype(dt)
    p_peg = init_peg(kg[1], d)
    peg_fused_fn = _peg_conv_residual(True)
    peg_loss_f = lambda v_, w_, b_: (
        peg_fused_fn(v_, w_, b_).astype(jnp.float32) ** 2).sum()
    peg_loss_t = lambda v_, w_, b_: (
        _peg_conv_residual_impl(v_, w_, b_, True).astype(jnp.float32) ** 2).sum()
    # (no fwd record: the custom VJP's primal IS _peg_conv_residual_impl,
    # so a forward comparison would be 0 by construction — only the
    # backward formulations differ)
    g1 = jax.jit(jax.grad(peg_loss_f, argnums=(0, 1, 2)))(
        v_peg, p_peg["w"], p_peg["b"])
    g2p = jax.jit(jax.grad(peg_loss_t, argnums=(0, 1, 2)))(
        v_peg, p_peg["w"], p_peg["b"])
    record("peg_bwd", max(rel_err(a, b) for a, b in zip(g1, g2p)))

    # VQ nearest: ties near bf16 margins are legal argmax choices — compare
    # SCORES of chosen codes, not raw indices
    kv = jax.random.split(jax.random.PRNGKey(45), 2)
    codebook = l2norm(jax.random.normal(kv[0], (8192, d)))
    tokens = l2norm(jax.random.normal(kv[1], (t * n_sp, d)))
    got_idx = jax.jit(lambda t_, c: vq_nearest_pallas(t_, c))(tokens, codebook)
    want_idx = jnp.argmax(tokens @ codebook.T, axis=-1)
    sims = tokens @ codebook.T
    s_got = jnp.take_along_axis(sims, got_idx[:, None], axis=1)
    s_want = jnp.take_along_axis(sims, want_idx[:, None], axis=1)
    record("vq_nearest", float(jnp.abs(s_got - s_want).max()))

    out["kernel_parity_ok"] = not failures
    if failures:
        out["kernel_parity_failures"] = [
            f"{n}={e:.4f}" for n, e in failures]
    return out


def bench_train(cfg) -> dict:
    """Whole-step training throughput at flagship B=TRAIN_BATCH: one jitted
    train_step (fwd + symmetric InfoNCE + bwd + clip + Adam + VQ EMA,
    reference CTClipTrainer.py:177-204), timed steady-state.

    Per-layer remat is OFF by default: the fused kernels' custom VJPs
    already recompute their forward from saved block inputs, so layer-level
    jax.checkpoint runs every attention/FF forward a THIRD time — measured
    374 ms/step with remat vs 336 ms without at flagship B=8 (fits in the
    16 GB HBM). CTCLIP_BENCH_TRAIN_REMAT=1 restores the remat
    configuration for memory-constrained sweeps."""
    import dataclasses

    import numpy as np

    from ct_clip_ut_tpu.config import TrainConfig
    from ct_clip_ut_tpu.train.trainer import create_train_state, make_train_step

    remat = os.environ.get("CTCLIP_BENCH_TRAIN_REMAT", "0") == "1"
    model_cfg = dataclasses.replace(
        cfg, ctvit=dataclasses.replace(cfg.ctvit, remat=remat))
    train_cfg = TrainConfig(compute_dtype="bfloat16")
    state, tx = create_train_state(jax.random.PRNGKey(0), model_cfg, train_cfg)
    state = jax.device_put(state)
    step = make_train_step(model_cfg, train_cfg, tx)

    image = jax.random.normal(
        jax.random.PRNGKey(1), (TRAIN_BATCH, 1, 240, 480, 480), jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(2), (TRAIN_BATCH, 512), 0,
                             model_cfg.bert.vocab_size)
    tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    state, loss = step(state, image, tokens)   # compile
    float(loss)
    # sustained: dispatch TRAIN_STEPS steps back-to-back (state threads the
    # data dependency; no host sync in the loop) and drain once — the
    # trainer's pipelined logging runs the same way
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        state, loss = step(state, image, tokens)
    loss_v = float(loss)
    sustained = time.perf_counter() - t0
    assert np.isfinite(loss_v), loss_v
    per_step = sustained / TRAIN_STEPS
    return {"train_volumes_per_sec": round(TRAIN_BATCH / per_step, 2),
            "train_step_ms": round(per_step * 1000, 1),
            "train_batch": TRAIN_BATCH}


def bench_attribution(params, cfg, image16, prompt_tokens) -> dict:
    """Attribution throughput at flagship shapes (batch-1 scans, like the
    reference suite drives them, visualizations.py:1111-1184)."""
    import numpy as np

    from ct_clip_ut_tpu.attribution import occlusion as occ_mod
    from ct_clip_ut_tpu.attribution import rollout as ro
    from ct_clip_ut_tpu.attribution.integrated_gradients import \
        integrated_gradients
    from ct_clip_ut_tpu.config import OcclusionConfig

    image = image16[:1].astype(jnp.float32)
    tokens = {k: v[:2] for k, v in prompt_tokens.items()}
    one_tok = {k: v[:1] for k, v in tokens.items()}
    out = {}

    # rollout (one spatial + one temporal map pair per scan). Headline =
    # PIPELINED sustained pairs/s over ROLLOUT_MAPS scans (each pair's
    # fetch + 2x221 MB host expansion overlaps the next scan's device
    # compute, the way the suite drains a worklist); the serialized
    # single-pair latency is recorded alongside.
    def run_rollout():
        sp, tm = ro.rollout_maps(params, cfg, one_tok, image)
        return float(np.asarray(sp).ravel()[0]) + float(np.asarray(tm).ravel()[0])

    run_rollout()  # compile (also page-faults the first output buffers)
    times = [0.0] * 3
    for i in range(3):
        t0 = time.perf_counter()
        run_rollout()
        times[i] = time.perf_counter() - t0
    out["rollout_maps_per_sec_serialized"] = round(1.0 / min(times), 3)

    # untimed warm pass: the first few 221 MB host expansions page-fault
    # fresh buffers until the allocator settles (measured 1-3 s for the
    # first pairs vs 0.21 s steady); production runs drain many maps, so
    # the steady state is the honest sustained number
    for _pair in ro.rollout_maps_pipelined(params, cfg,
                                           [(one_tok, image)] * 3):
        pass
    ROLLOUT_MAPS = 6
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _pair in ro.rollout_maps_pipelined(
                params, cfg, [(one_tok, image)] * ROLLOUT_MAPS):
            pass
        best = min(best, (time.perf_counter() - t0) / ROLLOUT_MAPS)
    out["rollout_maps_per_sec"] = round(1.0 / best, 3)

    # raw attention maps + grad-CAM (the other two thesis methods,
    # reference visualizations.py:570-639, 913-1026) — sub-second paths,
    # timed so all 5 attribution methods appear in the artifact
    from ct_clip_ut_tpu.attribution.grad_cam import grad_cam_volumes
    from ct_clip_ut_tpu.attribution.raw_attention import raw_attention_maps

    def run_raw():
        sp, tm = raw_attention_maps(params, cfg, one_tok, image)
        return float(np.asarray(sp).ravel()[0]) + float(np.asarray(tm).ravel()[0])

    run_raw()  # compile
    times = [0.0] * 3
    for i in range(3):
        t0 = time.perf_counter()
        run_raw()
        times[i] = time.perf_counter() - t0
    out["raw_attention_scans_per_sec"] = round(1.0 / min(times), 2)

    def run_cam():
        vols = grad_cam_volumes(params, cfg, one_tok, image)
        return float(np.asarray(vols["combined"]).ravel()[0])

    run_cam()  # compile
    for i in range(3):
        t0 = time.perf_counter()
        run_cam()
        times[i] = time.perf_counter() - t0
    out["gradcam_scans_per_sec"] = round(1.0 / min(times), 2)

    # integrated gradients (50 steps, reference visualizations.py:851-910).
    # Headline = PIPELINED sustained s/map over IG_MAPS maps (each map's
    # transport + host densify overlaps the next map's device compute, the
    # way the attribution suite drains a worklist); the serialized
    # single-map latency is recorded alongside. min-of-2 on the serialized
    # number: the first post-compile call can overlap persistent-cache
    # serialization / relay warm-up and read several x slow
    from ct_clip_ut_tpu.attribution.integrated_gradients import \
        integrated_gradients_pipelined
    integrated_gradients(params, cfg, one_tok, image, steps=IG_STEPS,
                         chunk=IG_CHUNK)  # compile
    ig_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        integrated_gradients(params, cfg, one_tok, image, steps=IG_STEPS,
                             chunk=IG_CHUNK)
        ig_s = min(ig_s, time.perf_counter() - t0)
    ig_pipe = float("inf")
    for _ in range(2):  # min-of-2 sweeps: relay fetch throughput varies
        t0 = time.perf_counter()
        for _ in integrated_gradients_pipelined(
                params, cfg, [(one_tok, image)] * IG_MAPS, steps=IG_STEPS,
                chunk=IG_CHUNK):
            pass
        ig_pipe = min(ig_pipe, (time.perf_counter() - t0) / IG_MAPS)
    out[f"ig{IG_STEPS}_seconds_per_map"] = round(ig_pipe, 2)
    out[f"ig{IG_STEPS}_seconds_per_map_serialized"] = round(ig_s, 2)

    # occlusion: time OCC_WINDOWS windows of the 23^3 flagship sweep with
    # the token-level masking shortcut + frame-sparse recompute. The sweep's
    # masked image latents do not depend on the text, so ONE sweep scores
    # every pathology at once (occlusion_scores_multi) — the reference's
    # text-embeds mode re-runs all 12,167 forwards per positive pathology
    # (visualizations.py:1037-1044). Headline seconds_per_map is therefore
    # the per-map cost of the 18-pathology panel sweep; the single-text
    # map's unamortized cost is recorded alongside.
    occ = OcclusionConfig()
    coords_full = occ_mod.window_grid(image.shape[-3:], occ.patch_size,
                                      occ.stride)
    n_full = coords_full.shape[0]
    chunk = 8   # measured: chunk 8 beats 16 at flagship shapes (VMEM reuse)
    coords = coords_full[:OCC_WINDOWS]
    txts = jnp.eye(N_PATHOLOGIES, cfg.dim_latent, dtype=jnp.float32)

    occ_mod.occlusion_scores_multi(params, cfg, image, txts, coords, occ=occ,
                                   chunk=chunk)  # compile
    occ_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, scores = occ_mod.occlusion_scores_multi(
            params, cfg, image, txts, coords, occ=occ, chunk=chunk)
        np.asarray(scores)
        occ_s = min(occ_s, time.perf_counter() - t0)
    wps = OCC_WINDOWS / occ_s
    out["occlusion_windows_per_sec"] = round(wps, 1)
    out["occlusion_pathologies_per_sweep"] = N_PATHOLOGIES
    out["occlusion_seconds_per_map"] = round(n_full / wps / N_PATHOLOGIES, 1)
    out["occlusion_seconds_per_map_single_text"] = round(n_full / wps, 1)

    if WITH_OCC_FULL:
        # the full 12,167-window 18-pathology panel, timed end-to-end ONCE
        # (scores + host-side separable window-sum assembly of all 18
        # heatmaps) — not extrapolated
        t0 = time.perf_counter()
        maps = occ_mod.occlusion_heatmaps_multi(params, cfg, image, txts,
                                                occ=occ, chunk=chunk)
        full_s = time.perf_counter() - t0
        assert len(maps) == N_PATHOLOGIES
        out["occlusion_full_sweep_seconds"] = round(full_s, 1)
        out["occlusion_full_map_seconds"] = round(full_s / N_PATHOLOGIES, 1)
    return out


def bench_ctgenerate() -> dict:
    """CTGenerate keyword-localization throughput at the reference geometry
    (201x128x128 scan -> [101, 8, 8] codebook grid -> MaskGit cross-attention
    over T5 context, reference CTGenerateInference.py:112-140). The reference
    drives scans strictly one at a time; serving here batches them in one
    compiled program (ctgenerate_apply_batched). Reports sustained
    scans/s over CTGEN_STEPS pipelined batches of CTGEN_BATCH."""
    import numpy as np

    from ct_clip_ut_tpu.config import CTGenerateConfig
    from ct_clip_ut_tpu.models.ctgenerate import (ctgenerate_apply_batched,
                                                  init_ctgenerate)

    cfg = CTGenerateConfig()
    params = jax.device_put(init_ctgenerate(jax.random.PRNGKey(7), cfg))
    scans = jax.random.normal(
        jax.random.PRNGKey(8), (CTGEN_BATCH, 1, 201, 128, 128), jnp.float32)
    text_embed = jax.random.normal(
        jax.random.PRNGKey(9), (CTGEN_BATCH, 64, cfg.maskgit.dim_context),
        jnp.float32)
    text_mask = jnp.ones((CTGEN_BATCH, 64), bool)

    bias_cache = {}   # serving drivers build the CPB table once per grid

    def run():
        out = ctgenerate_apply_batched(params, cfg, scans, text_embed,
                                       text_mask, bias_cache=bias_cache)
        return out

    out = run()  # compile
    np.asarray(out.feature_map[0, 0, :4])
    t0 = time.perf_counter()
    outs = [run() for _ in range(CTGEN_STEPS)]
    # executions on one device stream complete in dispatch order, so the
    # LAST call's fetch proves every prior call finished. Fetching each
    # output separately dispatches a tiny slice execution per call — each
    # pays the ~29 ms relay dispatch floor and was measured to hide ~40%
    # of real throughput (50.6 -> 38 scans/s; docs/ROADMAP.md round 5).
    np.asarray(outs[-1].feature_map[0, 0, :4])
    sps = CTGEN_BATCH * CTGEN_STEPS / (time.perf_counter() - t0)
    return {"ctgenerate_scans_per_sec": round(sps, 2),
            "ctgenerate_batch": CTGEN_BATCH}


def _replay_last_ledger_run(reason: str) -> bool:
    """Dead-chip fallback: print the newest committed BENCH_LOG.jsonl record
    (a real on-chip measurement from a previous run) instead of nothing, so
    an outage at bench time does not erase the round's recorded numbers.
    The record is explicitly marked stale with its original timestamp."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LOG.jsonl")
    try:
        with open(path) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        for ln in reversed(lines):
            rec = json.loads(ln)
            run = rec["run"]
            # never replay a recorded kernel-parity FAILURE as a green run
            if run.get("extra", {}).get("kernel_parity_ok") is False:
                continue
            run.setdefault("extra", {})
            run["extra"]["stale"] = True
            run["extra"]["stale_measured_at"] = rec.get("ts")
            run["extra"]["stale_reason"] = reason
            print(json.dumps(run))
            return True
    except Exception:
        pass
    return False


def _arm_deadline_watchdog() -> None:
    """Hard wall-clock bound on the whole bench. The observed worker failure
    mode is a mid-execution wedge (a dispatched program never completes, every
    subsequent JAX call blocks forever) — a probe at start-up cannot catch a
    chip that dies MID-run, and a wedged main thread never reaches Python
    again, so the bound lives on a daemon thread: at the deadline it replays
    the newest committed ledger record (marked stale) and hard-exits."""
    import threading

    deadline = float(os.environ.get("CTCLIP_BENCH_DEADLINE_S", "3000"))
    finished = threading.Event()

    def reaper():
        if finished.wait(deadline):
            return
        import sys
        if not _replay_last_ledger_run(
                f"bench exceeded {deadline:.0f}s deadline "
                "(worker died mid-run)"):
            print(json.dumps({"metric": "zeroshot_volumes_per_sec_per_chip",
                              "value": 0.0, "unit": "volumes/s",
                              "vs_baseline": 0.0,
                              "extra": {"error": "bench deadline, no ledger"}}))
        sys.stdout.flush()
        os._exit(0)

    threading.Thread(target=reaper, daemon=True).start()
    _arm_deadline_watchdog.finished = finished


def main() -> None:
    _arm_deadline_watchdog()
    try:
        _probe_chip()
    except SystemExit as e:
        if _replay_last_ledger_run(str(e)):
            # the probe's daemon thread is still wedged inside a JAX call on
            # the dead worker; normal interpreter teardown then aborts in the
            # TPU client's atexit (observed SIGABRT/134 AFTER the replay line
            # printed, which the driver would read as a failed bench). The
            # replay line is complete — exit hard, skipping teardown.
            import sys
            sys.stdout.flush()
            os._exit(0)
        raise
    cfg = flagship_cfg()
    key = jax.random.PRNGKey(0)
    params = init_ctclip(key, cfg)
    params = jax.device_put(params)

    image = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 1, 240, 480, 480), jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(2),
                             (2 * N_PATHOLOGIES, 24), 0, cfg.bert.vocab_size)
    prompt_tokens = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}

    # ---- ours: batched, hoisted, prompts precomputed --------------------
    prompt_latents = jax.jit(
        lambda p, t: encode_text_latents(p, cfg, t))(params, prompt_tokens)
    jax.block_until_ready(prompt_latents)

    import numpy as np
    # NOTE: on the axon relay platform block_until_ready returns early, so
    # every timed call forces a device->host fetch of the (tiny) result.
    run = lambda: np.asarray(zeroshot_probs(params, cfg, image, prompt_latents))
    run()  # compile

    # headline = PIPELINED sustained throughput: dispatch STEPS batches
    # back-to-back and drain once, the way a serving loop runs (JAX dispatch
    # is async; per-batch [B, 18] prob fetches are tiny). Serialized
    # dispatch-fetch-dispatch pays the relay's ~30 ms per-call dispatch
    # latency every batch — a latency number, not a throughput number; it is
    # recorded alongside as zeroshot_vps_serialized (median of STEPS).
    t0 = time.perf_counter()
    outs = [zeroshot_probs(params, cfg, image, prompt_latents)
            for _ in range(STEPS)]
    for o in outs:
        np.asarray(o)
    ours_vps = BATCH * STEPS / (time.perf_counter() - t0)

    times = []
    for _ in range(max(3, STEPS // 2)):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    vps_serial = BATCH / times[len(times) // 2]
    vps_serial_best = BATCH / times[0]

    # ---- reference algorithm on the same chip ----------------------------
    one_image = image[:1]

    @jax.jit
    def ref_one_pathology(params, pair_tokens, image):
        out = ctclip_apply(params, cfg, pair_tokens, image)
        sim = (out.image_latents.astype(jnp.float32)
               @ out.text_latents.astype(jnp.float32).T) * out.temperature
        pair = jnp.stack([sim[0, 0], sim[0, 1]])
        return jax.nn.softmax(pair)[0]

    pair0 = {k: v[:2] for k, v in prompt_tokens.items()}
    np.asarray(ref_one_pathology(params, pair0, one_image))  # compile
    ref_times = []
    for _ in range(REF_SCANS):
        t0 = time.perf_counter()
        for j in range(N_PATHOLOGIES):
            pair = {k: v[2 * j:2 * j + 2] for k, v in prompt_tokens.items()}
            np.asarray(ref_one_pathology(params, pair, one_image))
        ref_times.append(time.perf_counter() - t0)
    ref_vps = 1.0 / min(ref_times)

    extra = {"ref_algorithm_vps": round(ref_vps, 3),
             "zeroshot_vps_serialized": round(vps_serial, 3),
             "zeroshot_vps_serialized_best": round(vps_serial_best, 3),
             "zeroshot_batch": BATCH, "timed_steps": STEPS}

    # MFU from XLA's own flop count of the compiled zero-shot program
    # (v5e bf16 matmul peak: 197 TFLOP/s)
    try:
        lowered = zeroshot_probs.lower(params, cfg, image, prompt_latents)
        flops = lowered.compile().cost_analysis()["flops"]
        extra["fwd_tflop_per_volume"] = round(flops / BATCH / 1e12, 3)
        extra["mfu_pct"] = round(100 * flops / BATCH * ours_vps / 197e12, 1)
    except Exception:
        pass
    if WITH_ATTRIBUTION:
        extra.update(bench_attribution(params, cfg, image, prompt_tokens))
    if WITH_KERNEL_PARITY:
        extra.update(bench_kernel_parity())
    if WITH_TRAIN:
        extra.update(bench_train(cfg))
    if WITH_CTGEN:
        extra.update(bench_ctgenerate())

    # kernel-path fallback counters (ops/fallbacks.py): a silent deopt off
    # a fused kernel (odd batch, VMEM cap) must be visible in the artifact
    from ct_clip_ut_tpu.ops.fallbacks import fallback_counts
    extra["kernel_fallbacks"] = fallback_counts()

    line = json.dumps({
        "metric": "zeroshot_volumes_per_sec_per_chip",
        "value": round(ours_vps, 3),
        "unit": "volumes/s",
        "vs_baseline": round(ours_vps / ref_vps, 2),
        "extra": extra,
    })
    print(line)
    _arm_deadline_watchdog.finished.set()   # real line printed — disarm
    if not extra.get("kernel_parity_ok", True):
        raise SystemExit(
            f"KERNEL PARITY FAILURE: {extra['kernel_parity_failures']}")
    # append to the committed measurement ledger so a successful run
    # survives even if a later driver invocation hits a dead chip — but only
    # runs at the DEFAULT configuration: an experiment sweep (sections off,
    # non-default batch/steps/windows) must not become the newest record the
    # dead-chip replay serves
    defaults = (WITH_ATTRIBUTION and WITH_KERNEL_PARITY and WITH_TRAIN
                and WITH_CTGEN and WITH_OCC_FULL
                and BATCH == 16 and STEPS == 10 and IG_STEPS == 50
                and IG_MAPS == 3 and OCC_WINDOWS == 256 and TRAIN_BATCH == 8
                and CTGEN_BATCH == 4)
    if not defaults:
        return
    try:
        import datetime
        ts = datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds")
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LOG.jsonl"), "a") as f:
            f.write(json.dumps({"ts": ts, "run": json.loads(line)}) + "\n")
    except Exception as e:
        import sys
        print(f"WARNING: could not append BENCH_LOG.jsonl: {e!r}",
              file=sys.stderr)


if __name__ == "__main__":
    main()

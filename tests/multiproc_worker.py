"""Worker process for the 2-process distributed integration test.

Launched (twice) by tests/test_multiprocess.py with a local coordinator.
Each worker is a real separate `jax.distributed` process with 4 virtual CPU
devices, so the `jax.process_count() > 1` branches — dead code in every
single-process test — actually execute here:

  * parallel/mesh.initialize_runtime       (jax.distributed bring-up)
  * parallel/sharding.shard_host_batch     (make_array_from_process_local_data)
  * parallel/sharding.local_rows           (addressable-shard stitching)
  * infer/zeroshot.gather_predictions      (process_allgather)
  * train/trainer rank-0 gating            (save_model writes on process 0 only)
  * data/loader.ShardedSampler             (per-process disjoint shards)
  * train/checkpoint sharded orbax path    (collective per-process shard
                                            writes + restore onto the live
                                            process-spanning shardings)
  * parallel/sp_encoder                    (ring + PEG-halo ppermutes across
                                            a process-spanning "model" axis)
  * parallel/moe                           (GShard dispatch/combine einsums
                                            over a process-spanning expert
                                            axis — cross-host all-to-alls)

This is the reference's entire deployment mode (NCCL DDP,
reference CTClipTrainer.py:62-69, CTClipInference.py:59) recreated on the
JAX multi-process runtime. The worker prints one JSON line of results that
the parent test checks against a single-process 8-device run of the SAME
global batch.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_dir = sys.argv[3]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")  # a sitecustomize may pin a TPU

    from ct_clip_ut_tpu.parallel.mesh import initialize_runtime, make_mesh
    initialize_runtime(coordinator_address=coordinator, num_processes=2,
                       process_id=pid)

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import numpy as np

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_trainer_driver import SMALL_CLIP, HashTokenizer

    from ct_clip_ut_tpu.config import TrainConfig
    from ct_clip_ut_tpu.data.loader import ShardedSampler
    from ct_clip_ut_tpu.infer import zeroshot as zs
    from ct_clip_ut_tpu.train.trainer import CTClipTrainer

    result = {"pid": pid}

    # ---- ShardedSampler: per-process shards are disjoint and cover ------
    sampler = ShardedSampler(10, num_shards=2, shard_index=pid,
                             shuffle=True, drop_last=True, seed=3)
    sampler.set_epoch(1)
    mine = np.asarray(sampler.indices(), np.int32)
    from jax.experimental import multihost_utils
    both = np.asarray(multihost_utils.process_allgather(mine))  # [2, 5]
    assert both.shape == (2, 5), both.shape
    union = np.sort(both.ravel())
    assert len(np.unique(union)) == 10, union  # disjoint + covering

    # ---- gather_predictions: the process_allgather branch ---------------
    preds_local = np.full((2, 18), float(pid), np.float32)
    targets_local = np.full((2, 18), float(pid) + 10.0, np.float32)
    preds, targets = zs.gather_predictions(preds_local, targets_local)
    assert preds.shape == (4, 18), preds.shape
    np.testing.assert_array_equal(preds[:2], 0.0)
    np.testing.assert_array_equal(preds[2:], 1.0)
    np.testing.assert_array_equal(targets[:2], 10.0)
    np.testing.assert_array_equal(targets[2:], 11.0)

    # ---- global batch: this process contributes rows [4p, 4p + 4) -------
    rs = np.random.RandomState(7)
    images_global = rs.randn(8, 1, 20, 32, 32).astype(np.float32)
    texts_global = [f"report row {i} effusion" for i in range(8)]
    lo, hi = 4 * pid, 4 * pid + 4
    images_local, texts_local = images_global[lo:hi], texts_global[lo:hi]

    # ---- trainer: shard_host_batch assembly + one SPMD train step -------
    cfg = TrainConfig(lr=1e-3, num_epochs=1, compute_dtype="float32",
                      text_max_length=16)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            train_data=[], valid_data=[],
                            results_folder=os.path.join(out_dir, "results"))
    assert trainer.is_main == (pid == 0)
    img, tok = trainer._put_batch(images_local, texts_local)
    assert img.shape[0] == 8  # global batch assembled across processes
    assert not img.is_fully_addressable
    state, loss = trainer.train_step(trainer.state, img, tok)
    result["train_loss"] = float(loss)

    # indivisible local batch must be a hard error in multi-process runs
    try:
        trainer._put_batch(images_local[:3], texts_local[:3])
        raise AssertionError("indivisible multi-process batch did not raise")
    except ValueError:
        pass

    # rank-0 gating: only process 0 writes the checkpoint
    trainer.state = state
    trainer.save_model("mp_checkpoint.msgpack")
    wrote = (trainer.results_folder / "mp_checkpoint.msgpack").exists()
    assert wrote == (pid == 0), (pid, wrote)

    # both processes must have agreed on the SAME run dir (process-0 pick
    # broadcast — the independent subdir count races on a shared fs)
    folder_u8 = np.zeros(128, np.uint8)
    raw = str(trainer.results_folder).encode()
    folder_u8[:len(raw)] = np.frombuffer(raw, np.uint8)
    folders = np.asarray(multihost_utils.process_allgather(folder_u8))
    assert (folders[0] == folders[1]).all(), "run dirs diverged across procs"

    # ---- orbax sharded checkpoint: COLLECTIVE save/restore ---------------
    # every process writes its own TensorStore shards (no rank gate, no
    # process-0 full gather), then restores onto the live process-spanning
    # shardings; addressable shards must roundtrip bit-equal
    import dataclasses
    trainer.cfg = dataclasses.replace(cfg, sharded_checkpoints=True)
    before = [np.asarray(s.data)
              for leaf in jax.tree.leaves(trainer.state)
              if hasattr(leaf, "addressable_shards")
              for s in leaf.addressable_shards]
    trainer.save_model("mp_checkpoint.orbax")
    assert (trainer.results_folder / "mp_checkpoint.orbax").is_dir()
    trainer.state = trainer.state._replace(
        params=jax.tree.map(lambda x: x * 0, trainer.state.params))
    trainer.load_model(trainer.results_folder / "mp_checkpoint.orbax")
    after = [np.asarray(s.data)
             for leaf in jax.tree.leaves(trainer.state)
             if hasattr(leaf, "addressable_shards")
             for s in leaf.addressable_shards]
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    result["orbax_roundtrip_ok"] = True
    trainer.cfg = cfg

    # ---- FSDP over the PROCESS-SPANNING data axis ------------------------
    # params + Adam moments shard over "data" (8 devices, 4 per process), so
    # every leaf's shards live on BOTH hosts; the step's weight all-gathers
    # and grad reduce-scatters are real cross-host collectives. Same seed +
    # same batch as the plain trainer above -> the loss must be identical.
    from ct_clip_ut_tpu.parallel import sharding as shard_mod
    fsdp_cfg = dataclasses.replace(cfg, fsdp=True, sharded_checkpoints=True)
    old_min = shard_mod._FSDP_MIN_SIZE
    shard_mod._FSDP_MIN_SIZE = 0   # tiny model: shard every divisible leaf
    try:
        ftr = CTClipTrainer(SMALL_CLIP, fsdp_cfg, HashTokenizer(),
                            train_data=[], valid_data=[],
                            results_folder=os.path.join(out_dir, "fsdp"))
        w = ftr.state.params["to_visual_latent"]["w"]
        assert "data" in tuple(w.sharding.spec), tuple(w.sharding.spec)
        assert not w.is_fully_addressable  # shards span the two processes
        fstate, floss = ftr.train_step(ftr.state, img, tok)
        result["fsdp_train_loss"] = float(floss)

        # collective orbax roundtrip of the FSDP-sharded state
        ftr.state = fstate
        ftr.save_model("fsdp_ckpt.orbax")
        ftr.state = ftr.state._replace(
            params=jax.tree.map(lambda x: x * 0, ftr.state.params))
        ftr.load_model(ftr.results_folder / "fsdp_ckpt.orbax")
        w2 = ftr.state.params["to_visual_latent"]["w"]
        assert tuple(w2.sharding.spec) == tuple(
            fstate.params["to_visual_latent"]["w"].sharding.spec)
        for a, b in zip(
                fstate.params["to_visual_latent"]["w"].addressable_shards,
                w2.addressable_shards):
            np.testing.assert_array_equal(np.asarray(a.data),
                                          np.asarray(b.data))
        result["fsdp_orbax_roundtrip_ok"] = True
    finally:
        shard_mod._FSDP_MIN_SIZE = old_min

    # ---- sharded zero-shot eval over the 2-process mesh -----------------
    mesh = make_mesh()
    ids = (np.arange(36 * 16).reshape(36, 16) % 256).astype(np.int32)
    prompt_tokens = {"input_ids": jnp.asarray(ids),
                     "attention_mask": jnp.ones_like(jnp.asarray(ids))}
    prompt_latents = zs.encode_prompt_latents(trainer.state.params, SMALL_CLIP,
                                              prompt_tokens)
    params, prompt_latents = zs.place_eval_inputs(trainer.state.params,
                                                  prompt_latents, mesh)
    probs = zs.zeroshot_probs_sharded(params, SMALL_CLIP, images_local,
                                      prompt_latents, mesh,
                                      compute_dtype="float32")
    from ct_clip_ut_tpu.parallel.sharding import local_rows
    mine_rows = local_rows(probs)
    assert mine_rows.shape == (4, 18), mine_rows.shape
    result["zeroshot_rows"] = mine_rows.tolist()

    # ---- sequence-parallel encoder with a CROSS-PROCESS "model" axis -----
    # transpose the device grid so each ("data" row, "model" pair) couples
    # one device from EACH process: the SP ring / PEG-halo ppermutes and the
    # spatial all_gather become real cross-host collectives
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ct_clip_ut_tpu.models.ctclip import encode_image_latents
    from ct_clip_ut_tpu.parallel.sp_encoder import encode_image_latents_sp

    devs = np.array(jax.devices()).reshape(2, 4).T       # [4, 2]
    sp_mesh = Mesh(devs, ("data", "model"))
    assert {d.process_index for d in devs[0]} == {0, 1}  # spans processes

    params_np = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    img1 = images_global[:1]
    dense, _ = encode_image_latents(params_np, SMALL_CLIP, jnp.asarray(img1),
                                    freeze_vq=True)
    dense = np.asarray(dense)

    def gput(a, spec):
        sh = NamedSharding(sp_mesh, spec)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    params_g = jax.tree_util.tree_map(lambda a: gput(np.asarray(a), P()),
                                      params_np)
    img_g = gput(img1, P(None, None, None, "model", None))
    sp = encode_image_latents_sp(params_g, SMALL_CLIP, img_g, sp_mesh)
    sp_np = np.asarray(jax.device_get(sp))
    np.testing.assert_allclose(sp_np, dense, atol=2e-5, rtol=2e-5)
    result["sp_err"] = float(np.abs(sp_np - dense).max())

    # ---- expert-parallel MoE FF with a CROSS-PROCESS expert axis ---------
    # experts shard over the same process-spanning "model" axis, so the
    # GShard dispatch/combine einsums (parallel/moe.py) lower to REAL
    # cross-host all-to-alls; identical experts + drop-free capacity must
    # reproduce the dense GEGLU FF
    from ct_clip_ut_tpu.ops.layers import feedforward, init_feedforward
    from ct_clip_ut_tpu.parallel.moe import init_moe_ff, moe_feedforward
    from ct_clip_ut_tpu.parallel.sharding import param_specs

    n_exp = 4
    moe_p = init_moe_ff(jax.random.PRNGKey(11), 16, 24, n_exp)
    dense_p = init_feedforward(jax.random.PRNGKey(12), 16, 24)
    moe_p["norm"] = dense_p["norm"]
    moe_p["experts"] = {
        "w_in": np.broadcast_to(np.asarray(dense_p["proj_in"]["w"]),
                                (n_exp, 16, 48)).copy(),
        "w_out": np.broadcast_to(np.asarray(dense_p["proj_out"]["w"]),
                                 (n_exp, 24, 16)).copy(),
    }
    xs_moe = rs.randn(8, 6, 16).astype(np.float32)
    dense_ff = np.asarray(feedforward(dense_p, jnp.asarray(xs_moe)))

    moe_np = jax.tree_util.tree_map(np.asarray, moe_p)
    moe_g = jax.tree_util.tree_map(gput, moe_np, param_specs(moe_np))
    x_g = gput(xs_moe, P("data"))
    ep_out, ep_aux = jax.jit(lambda p, x: moe_feedforward(
        p, x, top_k=2, capacity_factor=float(n_exp)))(moe_g, x_g)
    ep_np = np.asarray(jax.device_get(ep_out))
    np.testing.assert_allclose(ep_np, dense_ff, atol=2e-5, rtol=2e-5)
    assert np.isfinite(float(jax.device_get(ep_aux)))
    result["ep_err"] = float(np.abs(ep_np - dense_ff).max())

    # ---- multi-process attribution suite: collective occlusion -----------
    # the reference's occlusion deployment mode (visualizations.py:296-318,
    # 404-424, 1141-1151): every rank enters the suite, process-0's sample
    # is broadcast, the window sweep shards over the PROCESS-SPANNING mesh,
    # and only rank 0 writes artifacts. Pinned here against the dense
    # single-process heatmap of the same sample.
    from ct_clip_ut_tpu.attribution import occlusion as occ_mod
    from ct_clip_ut_tpu.attribution.suite import (AttributionContext,
                                                  Visualizations)
    from ct_clip_ut_tpu.config import OcclusionConfig

    params_host = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    # DIFFERENT image per process: only process 0's may reach the sweep
    local_img = (images_global[:1] if pid == 0
                 else np.full_like(images_global[:1], 7.0))
    text = "multi process occlusion effusion"
    occ_cfg = OcclusionConfig(patch_size=(10, 16, 16), stride=(5, 8, 8),
                              fill_value=-1.0, threshold=0.0)
    attr_dir = os.path.join(out_dir, "attr")
    ctx = AttributionContext(
        params=params_host, cfg=SMALL_CLIP, tokenizer=HashTokenizer(),
        data=[(local_img, text, np.zeros((18,), np.float32),
               f"scan{pid}", f"/p{pid}")],
        render_gifs=False, text_max_length=16, mesh=mesh)
    vis = Visualizations(ctx, attr_dir)
    assert vis.is_main == (pid == 0)
    vis.visualize(occlusion={"occ": occ_cfg})

    # rank gating: exactly process 0 wrote the map — under the scan name
    # broadcast from process 0 (scan0), on both processes' view of the fs
    maps = list(__import__("pathlib").Path(attr_dir).rglob("*.npy"))
    if pid == 0:
        assert len(maps) == 1 and "scan0" in maps[0].name, maps
    else:
        assert maps == [] or all("scan0" in m.name for m in maps), maps

    # numerical pin: the 2-process window-sharded map equals the dense
    # single-process map of PROCESS 0's sample (both ranks can check — the
    # sharded result is replicated)
    img0 = np.asarray(multihost_utils.broadcast_one_to_all(local_img))
    tok0 = vis._tokenize(text)
    latent0 = occ_mod.report_text_latent(params_host, SMALL_CLIP, tok0)
    dense = occ_mod.occlusion_heatmap(params_host, SMALL_CLIP,
                                      jnp.asarray(img0), latent0,
                                      occ=occ_cfg)
    from ct_clip_ut_tpu.attribution.capture import rot90_ct
    dense = rot90_ct(dense)
    if pid == 0:
        saved = np.load(maps[0])
        np.testing.assert_allclose(saved, dense, atol=1e-5)
    result["mp_occlusion_ok"] = True

    with open(os.path.join(out_dir, f"worker_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

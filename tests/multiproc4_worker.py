"""Worker for the 4-PROCESS distributed integration test (2 virtual CPU
devices per process, 8 global). Focus: the three subsystems VERDICT round 4
asked to compose past 2 processes — FSDP over a 4-process data axis,
collective orbax sharded checkpoints, and the collective attribution suite
(sample broadcast + window sweep sharded over all 4 processes + rank-0
writes). Each worker emits one JSON result the parent pins against a
single-process replay of the same global batch.
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
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from ct_clip_ut_tpu.parallel.mesh import initialize_runtime, make_mesh
    initialize_runtime(coordinator_address=coordinator, num_processes=4,
                       process_id=pid)
    assert jax.process_count() == 4
    assert len(jax.local_devices()) == 2 and len(jax.devices()) == 8

    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_trainer_driver import SMALL_CLIP, HashTokenizer

    from ct_clip_ut_tpu.config import TrainConfig
    from ct_clip_ut_tpu.parallel import sharding as shard_mod
    from ct_clip_ut_tpu.train.trainer import CTClipTrainer

    result = {"pid": pid}

    rs = np.random.RandomState(7)
    images_global = rs.randn(8, 1, 20, 32, 32).astype(np.float32)
    texts_global = [f"report row {i} effusion" for i in range(8)]
    lo, hi = 2 * pid, 2 * pid + 2
    images_local, texts_local = images_global[lo:hi], texts_global[lo:hi]

    # ---- FSDP + sharded checkpoints over the 4-PROCESS data axis ---------
    cfg = TrainConfig(lr=1e-3, num_epochs=1, compute_dtype="float32",
                      text_max_length=16, fsdp=True,
                      sharded_checkpoints=True)
    old_min = shard_mod._FSDP_MIN_SIZE
    shard_mod._FSDP_MIN_SIZE = 0
    try:
        trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                                train_data=[], valid_data=[],
                                results_folder=os.path.join(out_dir, "fsdp"))
        w = trainer.state.params["to_visual_latent"]["w"]
        assert "data" in tuple(w.sharding.spec)
        assert not w.is_fully_addressable      # spans the 4 processes
        img, tok = trainer._put_batch(images_local, texts_local)
        assert img.shape[0] == 8
        state, loss = trainer.train_step(trainer.state, img, tok)
        result["fsdp_train_loss"] = float(loss)

        # collective orbax roundtrip: all 4 processes write their shards,
        # restore onto the live process-spanning shardings bit-equal
        trainer.state = state
        before = [np.asarray(s.data)
                  for leaf in jax.tree.leaves(trainer.state)
                  if hasattr(leaf, "addressable_shards")
                  for s in leaf.addressable_shards]
        trainer.save_model("ckpt4.orbax")
        trainer.state = trainer.state._replace(
            params=jax.tree.map(lambda x: x * 0, trainer.state.params))
        trainer.load_model(trainer.results_folder / "ckpt4.orbax")
        after = [np.asarray(s.data)
                 for leaf in jax.tree.leaves(trainer.state)
                 if hasattr(leaf, "addressable_shards")
                 for s in leaf.addressable_shards]
        assert len(before) == len(after)
        for a, b in zip(before, after):
            np.testing.assert_array_equal(a, b)
        result["orbax4_roundtrip_ok"] = True
    finally:
        shard_mod._FSDP_MIN_SIZE = old_min

    # ---- collective attribution across 4 processes ------------------------
    from ct_clip_ut_tpu.attribution import occlusion as occ_mod
    from ct_clip_ut_tpu.attribution.capture import rot90_ct
    from ct_clip_ut_tpu.attribution.suite import (AttributionContext,
                                                  Visualizations)
    from ct_clip_ut_tpu.config import OcclusionConfig
    from jax.experimental import multihost_utils

    mesh = make_mesh()
    # a fresh replicated init: the FSDP state above is process-sharded and
    # the suite expects host-replicable params (every rank same bytes)
    from ct_clip_ut_tpu.models.ctclip import init_ctclip
    params_host = jax.tree_util.tree_map(
        np.asarray, init_ctclip(jax.random.PRNGKey(0), SMALL_CLIP))

    local_img = (images_global[:1] if pid == 0
                 else np.full_like(images_global[:1], float(pid) + 5.0))
    text = "four process occlusion effusion"
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

    maps = list(__import__("pathlib").Path(attr_dir).rglob("*.npy"))
    if pid == 0:
        assert len(maps) == 1 and "scan0" in maps[0].name, maps
    else:
        assert maps == [] or all("scan0" in m.name for m in maps), maps

    img0 = np.asarray(multihost_utils.broadcast_one_to_all(local_img))
    tok0 = vis._tokenize(text)
    latent0 = occ_mod.report_text_latent(params_host, SMALL_CLIP, tok0)
    dense = rot90_ct(occ_mod.occlusion_heatmap(
        params_host, SMALL_CLIP, jnp.asarray(img0), latent0, occ=occ_cfg))
    if pid == 0:
        saved = np.load(maps[0])
        np.testing.assert_allclose(saved, dense, atol=1e-5)
    result["mp4_occlusion_ok"] = True

    with open(os.path.join(out_dir, f"worker4_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

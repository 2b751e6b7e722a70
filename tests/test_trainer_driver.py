"""CTClipTrainer host-driver loop end-to-end on fabricated data."""

import numpy as np
import pytest

import jax

from ct_clip_ut_tpu.config import (BertConfig, CTCLIPConfig, CTViTConfig,
                                   TrainConfig)
from ct_clip_ut_tpu.train.trainer import CTClipTrainer

SMALL_BERT = BertConfig(vocab_size=256, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=32)
SMALL_VIT = CTViTConfig(dim=16, codebook_size=32, image_size=32, patch_size=8,
                        temporal_patch_size=10, spatial_depth=1,
                        temporal_depth=1, dim_head=4, heads=4)
SMALL_CLIP = CTCLIPConfig(dim_text=32, dim_image=4 * 4 * 16, dim_latent=8,
                          ctvit=SMALL_VIT, bert=SMALL_BERT)


class HashTokenizer:
    def __call__(self, texts, return_tensors="np", padding="max_length",
                 truncation=True, max_length=32):
        # crc32, not hash(): Python string hashing is salted per process,
        # and the 2-process integration test compares tokenizations across
        # separate interpreter processes
        import zlib
        texts = [texts] if isinstance(texts, str) else list(texts)
        max_length = min(max_length, 16)
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros_like(ids)
        for i, t in enumerate(texts):
            toks = [1] + [zlib.crc32(w.encode()) % 200 + 5
                          for w in t.split()][:max_length - 2] + [2]
            ids[i, :len(toks)] = np.asarray(toks) % 256
            mask[i, :len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class FakeBatches:
    """Re-iterable: yields (images, texts) batches."""

    def __init__(self, n_batches, b, with_labels=False, seed=0):
        self.n = n_batches
        self.b = b
        self.with_labels = with_labels
        self.seed = seed

    def __iter__(self):
        rs = np.random.RandomState(self.seed)
        for i in range(self.n):
            images = rs.randn(self.b, 1, 20, 32, 32).astype(np.float32)
            texts = [f"report {i} sample {j} effusion" for j in range(self.b)]
            if self.with_labels:
                yield images, texts, rs.randint(0, 2, (self.b, 18)), ["n"] * self.b
            else:
                yield images, texts


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_trainer_profile_window(tmp_path):
    """--profile-steps captures a trace dump of steps [2, 2+N); the
    epoch-end safety stop closes a window longer than the epoch."""
    cfg = TrainConfig(lr=1e-3, num_epochs=1, compute_dtype="float32",
                      text_max_length=16, profile_steps=99,  # > epoch length
                      profile_dir=str(tmp_path / "trace"))
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            FakeBatches(3, 2),
                            FakeBatches(1, 2, with_labels=True),
                            results_folder=tmp_path)
    trainer.train()
    assert not getattr(trainer, "_tracing", False)
    dumps = list((tmp_path / "trace").rglob("*.xplane.pb"))
    assert dumps, "no profiler dump written"


def test_trainer_driver_two_epochs(tmp_path):
    cfg = TrainConfig(lr=1e-3, num_epochs=2, compute_dtype="float32",
                      save_best_model=True, text_max_length=16)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            FakeBatches(3, 2), FakeBatches(2, 2, with_labels=True),
                            results_folder=tmp_path)
    state = trainer.train()
    assert int(state.step) == 6  # 3 batches x 2 epochs
    assert len(trainer.valid_losses) == 3  # bootstrap eval + 2 epochs
    assert all(np.isfinite(v) for v in trainer.valid_losses)
    # best checkpoint written
    ckpts = list(tmp_path.rglob("best_checkpoint.msgpack"))
    assert ckpts
    # training progress plot rendered
    assert list(tmp_path.rglob("training_progress.png"))

    # resume: load back and continue one step
    trainer2 = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                             FakeBatches(1, 2), FakeBatches(1, 2, with_labels=True),
                             results_folder=tmp_path)
    trainer2.load_model(ckpts[0])
    s = trainer2.state
    assert int(s.step) >= 0  # restored state is usable
    images, texts = next(iter(FakeBatches(1, 2)))
    img, tok = trainer2._put_batch(images, texts)
    new_state, loss = trainer2.train_step(s, img, tok)
    assert np.isfinite(float(loss))


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_trainer_driver_tp_mesh_4x2(tmp_path):
    """CLI-reachable tensor parallelism: make_cli_mesh(--mesh-model 2) gives
    a ("data", "model") 4x2 mesh on the 8-device backend, and the trainer
    drives a full epoch + eval on it with finite losses."""
    import argparse

    from ct_clip_ut_tpu.scripts.train_ctclip import make_cli_mesh

    args = argparse.Namespace(mesh_data=None, mesh_model=2)
    mesh = make_cli_mesh(args)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}

    cfg = TrainConfig(lr=1e-3, num_epochs=1, compute_dtype="float32",
                      text_max_length=16)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            train_data=FakeBatches(2, 8),
                            valid_data=FakeBatches(1, 4, with_labels=True),
                            results_folder=tmp_path, mesh=mesh)
    trainer.train()
    assert all(np.isfinite(v) for v in trainer.train_losses["steps"])


class SizedFakeBatches(FakeBatches):
    def __len__(self):
        return self.n


def test_trainer_resume_skips_completed_epochs(tmp_path):
    """A restored full TrainState resumes at the epoch after its step
    counter (the reference's model/optim-only checkpoints always restart,
    CTClipTrainer.py:136): 4-epoch config restored from a 2-epoch
    checkpoint runs exactly epochs 3..4, and the resumed run performs no
    step-0 bootstrap eval."""
    cfg = TrainConfig(lr=1e-3, num_epochs=2, compute_dtype="float32",
                      text_max_length=16)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            SizedFakeBatches(3, 2),
                            FakeBatches(1, 2, with_labels=True),
                            results_folder=tmp_path / "a")
    trainer.train()
    trainer.save_model("state.msgpack")
    ckpt_path = trainer.results_folder / "state.msgpack"
    assert int(trainer.state.step) == 6

    cfg4 = TrainConfig(lr=1e-3, num_epochs=4, compute_dtype="float32",
                       text_max_length=16)
    trainer2 = CTClipTrainer(SMALL_CLIP, cfg4, HashTokenizer(),
                             SizedFakeBatches(3, 2),
                             FakeBatches(1, 2, with_labels=True),
                             results_folder=tmp_path / "b")
    trainer2.load_model(ckpt_path)
    state = trainer2.train()
    assert int(state.step) == 12            # only epochs 3..4 ran
    assert len(trainer2.valid_losses) == 2  # one eval per resumed epoch,
    assert len(trainer2.train_losses["epochs"]) == 2  # no bootstrap entries

    # resuming past the configured horizon trains zero steps
    trainer3 = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                             SizedFakeBatches(3, 2),
                             FakeBatches(1, 2, with_labels=True),
                             results_folder=tmp_path / "c")
    trainer3.load_model(ckpt_path)
    state3 = trainer3.train()
    assert int(state3.step) == 6


def test_trainer_periodic_checkpoint(tmp_path):
    """save_every_steps writes last_checkpoint.msgpack during the epoch; a
    fresh trainer restored from it resumes with the saved step counter."""
    cfg = TrainConfig(lr=1e-3, num_epochs=1, compute_dtype="float32",
                      text_max_length=16, save_every_steps=2)
    trainer = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                            SizedFakeBatches(4, 2),
                            FakeBatches(1, 2, with_labels=True),
                            results_folder=tmp_path)
    trainer.train()
    last = trainer.results_folder / "last_checkpoint.msgpack"
    assert last.exists()
    trainer2 = CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                             SizedFakeBatches(4, 2),
                             FakeBatches(1, 2, with_labels=True),
                             results_folder=tmp_path / "b")
    trainer2.load_model(last)
    assert int(trainer2.state.step) in (2, 4)


@pytest.mark.slow  # >40 s single-core; full/CI suite runs it
def test_trainer_step_level_resume_bitwise(tmp_path):
    """Mid-epoch resume reproduces the uninterrupted run EXACTLY: a run
    checkpointed at step 2 of a 3-step epoch 1, resumed into a 2-epoch
    config, ends with the same TrainState bit-for-bit as the uninterrupted
    2-epoch run (position sidecar + deterministic sampler order; the
    reference cannot resume at all, CTClipTrainer.py:136-145)."""
    def make(num_epochs, folder, save_every=0):
        cfg = TrainConfig(lr=1e-3, num_epochs=num_epochs,
                          compute_dtype="float32", text_max_length=16,
                          save_every_steps=save_every, save_best_model=False)
        return CTClipTrainer(SMALL_CLIP, cfg, HashTokenizer(),
                             SizedFakeBatches(3, 2),
                             FakeBatches(1, 2, with_labels=True),
                             results_folder=tmp_path / folder)

    # uninterrupted 2-epoch run: 6 steps
    ref_tr = make(2, "ref")
    ref = ref_tr.train()
    assert int(ref.step) == 6

    # interrupted run: 1 epoch with a mid-epoch save at step 2
    t1 = make(1, "partial", save_every=2)
    t1.train()
    last = t1.results_folder / "last_checkpoint.msgpack"
    assert last.exists()
    pos = __import__("json").loads((last.parent / (last.name + ".pos.json"))
                                   .read_text())
    core = {k: pos[k] for k in ("epoch", "step_in_epoch", "steps_per_epoch")}
    assert core == {"epoch": 1, "step_in_epoch": 2, "steps_per_epoch": 3}
    # the sidecar also persists the partial epoch's running loss so the
    # resumed epoch's average covers the whole epoch
    assert pos["loss_steps"] == 2 and np.isfinite(pos["loss_sum"])

    # resume from step 2 into the 2-epoch config: runs batch 3 of epoch 1,
    # then epoch 2 — final state must equal the uninterrupted run exactly
    t2 = make(2, "resumed")
    t2.load_model(last)
    assert int(t2.state.step) == 2
    out = t2.train()
    assert int(out.step) == 6
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(out.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(out.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref.rng), np.asarray(out.rng))
    # the resumed epoch-1 average equals the uninterrupted run's exactly
    # (restored running sum + identical remaining losses, same add order);
    # ref's epochs list has the step-1 bootstrap entry prepended
    np.testing.assert_array_equal(t2.train_losses["epochs"],
                                  ref_tr.train_losses["epochs"][1:])


def test_loader_iter_from_skips_preprocessing():
    """DataLoader.iter_from(k) yields exactly list(loader)[k:] and never
    touches the skipped samples (mid-epoch resume costs zero preprocessing
    for the skipped prefix)."""
    from ct_clip_ut_tpu.data.loader import DataLoader, ShardedSampler

    touched = []

    class Ds:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            touched.append(i)
            return np.full((2, 2), i, np.float32), f"t{i}"

    def mk():
        return DataLoader(Ds(), batch_size=2,
                          sampler=ShardedSampler(12, shuffle=True, seed=7),
                          num_workers=2)

    full = [b for b in mk()]
    # within-batch order is the SAMPLER's, not worker completion order —
    # two runs must collate identically (the bit-for-bit resume contract)
    full2 = [b for b in mk()]
    for (ia, ta), (ib, tb) in zip(full, full2):
        np.testing.assert_array_equal(ia, ib)
        assert ta == tb
    touched.clear()
    tail = [b for b in mk().iter_from(4)]
    assert len(tail) == len(full) - 4
    for (ia, _), (ib, _) in zip(tail, full[4:]):
        np.testing.assert_array_equal(ia, ib)
    skipped = {int(v) for b in full[:4] for v in b[0][:, 0, 0]}
    assert not (set(touched) & skipped), "skipped samples were preprocessed"

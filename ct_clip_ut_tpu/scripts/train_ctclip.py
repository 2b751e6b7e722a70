"""CTCLIP contrastive pretraining entry point.

Mirrors reference src/train_ctclip.py (which hard-codes every path and
hyperparameter, :39-58) but with a real CLI. Example:

    python -m ct_clip_ut_tpu.scripts.train_ctclip \
        --data-train /data/train --data-valid /data/valid \
        --train-reports reports/train_reports.csv \
        --valid-reports reports/valid_reports.csv \
        --valid-labels labels/valid_labels.csv \
        --train-metadata metadata/train_metadata.csv \
        --valid-metadata metadata/valid_metadata.csv \
        --results-folder results/train/ctclip \
        --batch-size 8 --num-epochs 15
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-train", required=True)
    p.add_argument("--data-valid", required=True)
    p.add_argument("--train-reports", required=True)
    p.add_argument("--valid-reports", required=True)
    p.add_argument("--valid-labels", required=True)
    p.add_argument("--train-metadata", required=True)
    p.add_argument("--valid-metadata", required=True)
    p.add_argument("--results-folder", default="./results/train/ctclip")
    p.add_argument("--checkpoint", default=None,
                   help="torch ctclip_v2.pt or native .msgpack to init from")
    p.add_argument("--tokenizer", default="microsoft/BiomedVLP-CXR-BERT-specialized")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--num-epochs", type=int, default=15)
    p.add_argument("--num-train-samples", type=int, default=5000)
    p.add_argument("--num-valid-samples", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1.25e-5)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--max-grad-norm", type=float, default=0.5)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="GradCache microbatch count: full-batch InfoNCE "
                        "objective at batch/grad_accum activation memory "
                        "(batch-size must be divisible by it)")
    p.add_argument("--save-best-model", action="store_true")
    p.add_argument("--save-every-steps", type=int, default=0,
                   help="atomically write last_checkpoint every N steps "
                        "(crash recovery; 0 = off)")
    p.add_argument("--sharded-checkpoints", action="store_true",
                   help="orbax/TensorStore checkpoint dirs: each process "
                        "writes its own shards (collective save) — required "
                        "once the state outgrows one host's RAM")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--preprocess-cache", default=None,
                   help="dir for preprocessed-volume .npy cache "
                        "(skips the ~5 s/volume gzip decode after epoch 1)")
    p.add_argument("--multihost", action="store_true",
                   help="bring up jax.distributed across TPU hosts "
                        "(auto-detected coordinator on Cloud TPU)")
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh axis size (default: all devices)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="MoE CT-ViT variant: number of routed FF experts per "
                        "encoder layer (expert-parallel over the mesh "
                        "'model' axis, parallel/moe.py); 0 = dense "
                        "reference-parity model")
    p.add_argument("--moe-aux-weight", type=float, default=0.01,
                   help="weight on the MoE load-balance aux loss")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis size; data*model must "
                        "equal the device count")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace of this many steps "
                        "(starting at step 2 of epoch 1; 0 = off)")
    p.add_argument("--profile-dir", default="/tmp/ctclip_trace")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear lr warmup steps (0 = constant lr, the "
                        "reference schedule)")
    p.add_argument("--decay-steps", type=int, default=0,
                   help="cosine lr decay steps after warmup (0 = none)")
    p.add_argument("--end-lr-frac", type=float, default=0.0,
                   help="cosine decay floor as a fraction of --lr")
    p.add_argument("--adam-mu-dtype", default=None,
                   help="dtype for Adam's first moment (e.g. bfloat16 to "
                        "halve its HBM footprint); default fp32")
    p.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallelism: params, grads, and "
                        "Adam moments shard over the 'data' mesh axis at "
                        "rest (ZeRO-3 semantics via GSPMD); composes with "
                        "--mesh-model")
    return p


def make_cli_mesh(args):
    """("data", "model") mesh from --mesh-data/--mesh-model (None -> pure DP
    over all devices, the reference's only strategy)."""
    from ..config import MeshConfig
    from ..parallel.mesh import make_mesh
    if args.mesh_data is None and args.mesh_model == 1:
        return make_mesh()
    import jax
    data = args.mesh_data
    if data is None:
        data = len(jax.devices()) // args.mesh_model
    return make_mesh(MeshConfig(data=data, model=args.mesh_model))


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.grad_accum < 1 or args.batch_size % args.grad_accum:
        parser.error(
            f"--batch-size {args.batch_size} must be a positive multiple of "
            f"--grad-accum {args.grad_accum}")

    # multi-host bring-up must happen before the first jax device query
    # (replaces the reference's NCCL process-group init, CTClipTrainer.py:62-69)
    if args.multihost or (args.num_processes or 0) > 1:
        from ..parallel.mesh import initialize_runtime
        initialize_runtime(coordinator_address=args.coordinator_address,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    import jax

    from transformers import BertTokenizer

    from ..config import CTCLIPConfig, CTViTConfig, TrainConfig
    from ..data.datasets import InferenceDataset, TrainDataset
    from ..data.loader import DataLoader, ShardedSampler
    from ..train.trainer import CTClipTrainer

    # flagship model (reference train_ctclip.py:19-37)
    model_cfg = CTCLIPConfig(ctvit=CTViTConfig(
        dim_head=32, moe_experts=args.moe_experts))
    train_cfg = TrainConfig(
        batch_size=args.batch_size, lr=args.lr, wd=args.wd,
        max_grad_norm=args.max_grad_norm, grad_accum=args.grad_accum,
        num_epochs=args.num_epochs,
        num_train_samples=args.num_train_samples,
        num_valid_samples=args.num_valid_samples,
        save_best_model=args.save_best_model, seed=args.seed,
        save_every_steps=args.save_every_steps,
        sharded_checkpoints=args.sharded_checkpoints,
        moe_aux_weight=args.moe_aux_weight, fsdp=args.fsdp,
        warmup_steps=args.warmup_steps, decay_steps=args.decay_steps,
        end_lr_frac=args.end_lr_frac, adam_mu_dtype=args.adam_mu_dtype,
        profile_steps=args.profile_steps, profile_dir=args.profile_dir)

    tokenizer = BertTokenizer.from_pretrained(args.tokenizer, do_lower_case=True)

    train_ds = TrainDataset(args.data_train, args.train_reports,
                            args.train_metadata,
                            num_samples=args.num_train_samples,
                            cache_dir=args.preprocess_cache)
    valid_ds = InferenceDataset(args.data_valid, args.valid_reports,
                                args.valid_metadata, args.valid_labels,
                                num_samples=args.num_valid_samples,
                                cache_dir=args.preprocess_cache)
    # per-process contiguous-interleaved shards, the DistributedSampler
    # pattern of the reference (CTClipTrainer.py:88-105); single-process this
    # is the identity shard
    n_proc, pid = jax.process_count(), jax.process_index()
    train_dl = DataLoader(train_ds, batch_size=args.batch_size,
                          sampler=ShardedSampler(len(train_ds), shuffle=True,
                                                 num_shards=n_proc,
                                                 shard_index=pid,
                                                 seed=args.seed),
                          num_workers=args.num_workers)
    valid_dl = DataLoader(valid_ds, batch_size=args.batch_size,
                          sampler=ShardedSampler(len(valid_ds), shuffle=False,
                                                 num_shards=n_proc,
                                                 shard_index=pid),
                          num_workers=args.num_workers)

    params = None
    if args.checkpoint:
        from ..train import checkpoint as ckpt
        if args.checkpoint.endswith(".pt"):
            params = ckpt.convert_ctclip(
                ckpt.load_torch_checkpoint(args.checkpoint), model_cfg)
        # .msgpack restores after trainer construction (needs the template)

    trainer = CTClipTrainer(model_cfg, train_cfg, tokenizer,
                            train_dl, valid_dl,
                            results_folder=args.results_folder, params=params,
                            mesh=make_cli_mesh(args))
    if args.checkpoint and args.checkpoint.endswith(".msgpack"):
        trainer.load_model(args.checkpoint)
    trainer.train()


if __name__ == "__main__":
    main()

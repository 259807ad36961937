"""LAM entry point — mirrors the reference's ``HHI/scripts/run_lam.py``
flag surface (HHI/configs/lam/config.py) plus egot2x extensions:

  --synthetic         run on a generated fixture tree (hermetic smoke)
  --data_root PATH    unified dataset root (imgs/ json/ gt/ *.list)
  --img_size N        face-crop resolution (224 default, smaller for smoke)

Usage:
  python -m egot2x.cli.run_lam --model BaselineLSTM --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Ego4D Looking at me (egot2x)")
    # dataset
    p.add_argument("--data_root", type=str, default="../data/lam")
    p.add_argument("--train_stride", type=int, default=13)
    p.add_argument("--val_stride", type=int, default=13)
    p.add_argument("--test_stride", type=int, default=1)
    # training
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weights", type=float, nargs=2, default=[0.136, 0.864])
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--exp_path", type=str, default="debug")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume training from the last checkpoint")
    p.add_argument("--seed", type=int, default=0)
    # model
    p.add_argument("--model", type=str, default="BaselineLSTM")
    p.add_argument("--checkpoint", type=str, default=None)
    # egot2x extensions
    p.add_argument("--synthetic", action="store_true",
                   help="generate + use a tiny synthetic fixture dataset")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bf16"],
                   help="activation dtype (bf16 for MXU throughput)")
    p.add_argument("--model_parallel", type=int, nargs="?", const=2,
                   default=0,
                   help="model-axis size for tensor parallelism (shards "
                        "wide trainable kernels); bare flag means 2")
    p.add_argument("--precise_bn_batches", type=int, default=0,
                   help="recompute exact BN stats over N train batches "
                        "before validation (reference BN.USE_PRECISE_STATS)")
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import Trainer

    if args.synthetic:
        root = os.path.join(tempfile.gettempdir(), "egot2x_lam_fixture")
        if not os.path.exists(os.path.join(root, "train.list")):
            from egot2x.data.synthetic import make_lam_fixture

            make_lam_fixture(root, img_size=max(args.img_size // 2, 16))
        args.data_root = root
        args.train_stride = args.val_stride = 1
        args.batch_size = min(args.batch_size, 4)
        args.img_size = min(args.img_size, 64)
        args.num_workers = 2

    cfg = Config(vars(args))
    task = LookingAtMe(cfg)
    trainer = Trainer(
        task,
        max_epochs=args.epochs,
        fast_dev_run=args.fast_dev_run,
        default_root_dir=os.path.join("logs", "lam", args.output_dir),
        seed=args.seed,
        model_parallel=args.model_parallel,
        precise_bn_batches=args.precise_bn_batches,
    )
    if args.eval:
        import jax

        state = task.build_state(jax.random.key(args.seed))
        if args.ckpt:
            from egot2x.train.trainer import CheckpointManager

            mgr = CheckpointManager(args.ckpt, task.checkpoint_metric)
            state = mgr.restore(state)
        metrics = trainer.validate(state)
    else:
        resume_dir = None
        if args.resume:
            resume_dir = os.path.join("logs", "lam", args.output_dir,
                                      "checkpoints")
        state = trainer.fit(state=None, resume_from=resume_dir)
        metrics = trainer.validate(state)
    print({k: round(v, 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

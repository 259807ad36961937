"""TTM entry point — mirrors ``HHI/scripts/run_ttm.py`` + config flags
(HHI/configs/ttm/config.py), incl. the ``--two_loader`` switch that
selects the 3-task translator data path. egot2x extensions: --synthetic,
--data_root, --img_size.

Usage:
  python -m egot2x.cli.run_ttm --model TTMBaselineLSTM --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Ego4D Talking to me (egot2x)")
    p.add_argument("--data_root", type=str, default="../data/ttm")
    p.add_argument("--train_stride", type=int, default=3)
    p.add_argument("--val_stride", type=int, default=1)
    p.add_argument("--two_loader", action="store_true")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=400,
                   help="frames budget per batch (reference semantics)")
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--weights", type=float, nargs=2, default=[0.266, 0.734])
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--exp_path", type=str, default="debug")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--submit", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", type=str, default="TTMBaselineLSTM")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--lam_checkpoint", type=str, default=None)
    p.add_argument("--ttm_checkpoint", type=str, default=None)
    p.add_argument("--asd_checkpoint", type=str, default=None)
    p.add_argument("--nofreeze", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone activations in backward "
                        "(nofreeze full-train memory saver)")
    p.add_argument("--quant_trunks", action="store_true",
                   help="run the FROZEN Stage-I trunks in int8 static-PTQ "
                        "during Stage-II training (scales calibrated on "
                        "the first batch; accuracy-gated deployment path)")
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--hidden_dim2", type=int, default=512)
    # egot2x extensions
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bf16"],
                   help="activation dtype (bf16 for MXU throughput)")
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    from egot2x.train.trainer import Trainer

    if args.synthetic:
        root = os.path.join(tempfile.gettempdir(), "egot2x_ttm_fixture")
        if not os.path.exists(os.path.join(root, "train.list")):
            from egot2x.data.synthetic import make_ttm_fixture

            make_ttm_fixture(root, img_size=32)
        args.data_root = root
        args.img_size = min(args.img_size, 64)
        args.batch_size = min(args.batch_size, 120)
        args.num_workers = 2

    TWO_TASK_TRANSLATORS = {"TaskFusionMFTransformer2Task"}
    cfg = Config(vars(args))
    if args.two_loader:
        from egot2x.tasks.ttm_2loader import TalkingToMe2Loader as TaskCls
    elif args.model in TWO_TASK_TRANSLATORS:
        from egot2x.tasks.ttm_2loader import TalkingToMe2Task as TaskCls
    else:
        from egot2x.tasks.ttm import TalkingToMe as TaskCls
    task = TaskCls(cfg)
    trainer = Trainer(
        task,
        max_epochs=args.epochs,
        fast_dev_run=args.fast_dev_run,
        default_root_dir=os.path.join("logs", "ttm", args.output_dir),
        seed=args.seed,
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
        state = trainer.fit(state=None)
        metrics = trainer.validate(state)
    print({k: round(v, 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

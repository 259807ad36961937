"""ASD entry point — mirrors ``HHI/scripts/run_asd.py`` flags
(HHI/configs/asd/config.py): TalkNet training with --init_from_ava /
--finetune checkpoint modes, plus egot2x --synthetic smoke mode.

Usage:
  python -m egot2x.cli.run_asd --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Ego4D Active Speaker Detection (egot2x)")
    p.add_argument("--data_file_path", dest="data_root", type=str, default="../data/asd")
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=2500,
                   help="frames budget per batch (TalkNet semantics)")
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_decay", type=float, default=0.95)
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--exp_path", type=str, default="debug")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", type=str, default="TalkNetWithHeads")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--asd_checkpoint", type=str, default=None)
    p.add_argument("--init_from_ava", action="store_true")
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--two_loader", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    from egot2x.tasks.asd import ActiveSpeakerDetection
    from egot2x.train.trainer import Trainer

    if args.synthetic:
        root = os.path.join(tempfile.gettempdir(), "egot2x_asd_fixture")
        if not os.path.exists(os.path.join(root, "csv", "active_speaker_train.csv")):
            from egot2x.data.synthetic import make_asd_fixture

            make_asd_fixture(root, img_size=48)
        args.data_root = root
        args.batch_size = min(args.batch_size, 60)
        args.num_workers = 2

    if args.two_loader and args.model == "TalkNetWithHeads":
        args.model = "TaskFusionMFTransformer3TaskASD"
    if args.synthetic and args.two_loader:
        args.rgb_size = 64

    cfg = Config(vars(args))
    if args.two_loader:
        from egot2x.tasks.asd_2loader import ActiveSpeakerDetection2Loader

        task = ActiveSpeakerDetection2Loader(cfg)
    else:
        task = ActiveSpeakerDetection(cfg)
    trainer = Trainer(
        task,
        max_epochs=args.epochs,
        fast_dev_run=args.fast_dev_run,
        default_root_dir=os.path.join("logs", "asd", args.output_dir),
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

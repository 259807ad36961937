"""HHI EgoT2-g entry point — mirrors ``HHI/scripts/run_multitask.py``:
``--task translation`` selects Unified3TaskTranslation (EgoT2-g),
``--task unified`` the single-encoding Unified3Task baseline; min
val_loss checkpointing. egot2x extensions: --synthetic smoke mode
generating all three HHI fixtures.

Usage:
  python -m egot2x.cli.run_multitask --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile


def build_argparser():
    p = argparse.ArgumentParser(description="Ego4D HHI EgoT2-g (egot2x)")
    p.add_argument("--task", type=str, default="translation",
                   choices=["translation", "unified"])
    p.add_argument("--lam_root", type=str, default="../data/lam")
    p.add_argument("--ttm_root", type=str, default="../data/ttm")
    p.add_argument("--asd_root", type=str, default="../data/asd")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--lam_checkpoint", type=str, default=None)
    p.add_argument("--ttm_checkpoint", type=str, default=None)
    p.add_argument("--asd_checkpoint", type=str, default=None)
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--lam_batch", type=int, default=4)
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    from egot2x.tasks.multitask_hhi import Unified3Task, Unified3TaskTranslation
    from egot2x.train.trainer import Trainer

    if args.synthetic:
        tmp = tempfile.gettempdir()
        from egot2x.data.synthetic import (
            make_asd_fixture,
            make_lam_fixture,
            make_ttm_fixture,
        )

        args.lam_root = os.path.join(tmp, "egot2x_lam_fixture")
        args.ttm_root = os.path.join(tmp, "egot2x_ttm_fixture")
        args.asd_root = os.path.join(tmp, "egot2x_asd_fixture")
        if not os.path.exists(os.path.join(args.lam_root, "train.list")):
            make_lam_fixture(args.lam_root, img_size=32)
        if not os.path.exists(os.path.join(args.ttm_root, "train.list")):
            make_ttm_fixture(args.ttm_root, img_size=32)
        if not os.path.exists(os.path.join(args.asd_root, "csv",
                                           "active_speaker_train.csv")):
            make_asd_fixture(args.asd_root, img_size=48)
        args.img_size = 64
        args.num_workers = 2
        args.lam_batch = 2

    cfg = Config(vars(args))
    task_cls = Unified3TaskTranslation if args.task == "translation" else Unified3Task
    task = task_cls(cfg)
    trainer = Trainer(
        task,
        max_epochs=args.epochs,
        fast_dev_run=args.fast_dev_run,
        default_root_dir=os.path.join("logs", "multitask_hhi", args.output_dir),
        seed=args.seed,
    )
    state = trainer.fit(state=None)
    metrics = trainer.validate(state)
    print({k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

"""HOI EgoT2-g entry point — mirrors ``HOI/scripts/multitask/run.py``:
``--task unify6task`` (full EgoT2-g) and subsets. egot2x --synthetic
smoke mode reuses the PNR and LTA fixtures.

Usage:
  python -m egot2x.cli.multitask_run --task unify6task --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile


def build_argparser():
    p = argparse.ArgumentParser(description="Ego4D HOI EgoT2-g (egot2x)")
    p.add_argument("--task", type=str, default="unify6task",
                   choices=["unify6task", "unify3task", "unify4task",
                            "unify4taskaction", "task12", "pnr_only",
                            "oscc_only", "action_only"])
    p.add_argument("--pnr_root", type=str, default="../data/pnr")
    p.add_argument("--lta_root", type=str, default="../data/lta")
    p.add_argument("--taxonomy", type=str, default=None)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--alpha", type=int, default=8)
    p.add_argument("--beta_inv", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--pnr_crop", type=int, default=225)
    p.add_argument("--pnr_frames", type=int, default=16)
    p.add_argument("--num_input_clips", type=int, default=2)
    p.add_argument("--num_actions", type=int, default=20)
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    import egot2x.tasks.multitask_hoi as mt
    from egot2x.train.trainer import Trainer

    TASK_CLASSES = {
        "unify6task": mt.Unified6TaskTranslation,
        "unify3task": mt.Unified3TaskTranslation,
        "unify4task": mt.Unified4TaskTranslation,
        "unify4taskaction": mt.Unified4TaskTranslationAction,
        "task12": mt.Task12Translation,
        "pnr_only": mt.PnrOnlyTaskTranslation,
        "oscc_only": mt.OsccOnlyTaskTranslation,
        "action_only": mt.ActionOnlyTranslation,
    }

    if args.synthetic:
        tmp = tempfile.gettempdir()
        from egot2x.data.synthetic import make_lta_fixture, make_pnr_fixture

        args.pnr_root = os.path.join(tmp, "egot2x_pnr_fixture")
        args.lta_root = os.path.join(tmp, "egot2x_lta_fixture")
        if not os.path.exists(os.path.join(args.pnr_root, "train.json")):
            make_pnr_fixture(args.pnr_root, img_size=64)
        if not os.path.exists(os.path.join(args.lta_root, "fho_lta_train.json")):
            make_lta_fixture(args.lta_root, img_size=64)
        args.crop_size = 64
        args.pnr_crop = 65
        args.num_frames = 8
        args.alpha = 4
        args.pnr_frames = 8
        args.hidden_dim = 64
        args.num_layers = 1
        args.num_workers = 2

    cfg = Config(vars(args))
    task = TASK_CLASSES[args.task](cfg)
    trainer = Trainer(
        task,
        max_epochs=args.epochs,
        fast_dev_run=args.fast_dev_run,
        default_root_dir=os.path.join("logs", "multitask_hoi", args.output_dir),
        seed=args.seed,
    )
    state = trainer.fit(state=None)
    metrics = trainer.validate(state)
    print({k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

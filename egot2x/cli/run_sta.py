"""STA entry point — mirrors ``HOI/scripts/lta/run_sta.py`` (vestigial
in the reference; unused by EgoT2 training). Trains/validates
``ShortTermAnticipationTask`` with the usual --cfg YAML + KEY VAL
override surface and --synthetic / --fast_dev_run smoke flags.

Usage:
  python -m egot2x.cli.run_sta --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile


def build_argparser():
    p = argparse.ArgumentParser(description="Ego4D STA (egot2x)")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--data_root", type=str, default="../data/sta")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--optimizer", type=str, default="sgd")
    p.add_argument("--lr_policy", type=str, default="cosine")
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--alpha", type=int, default=8)
    p.add_argument("--beta_inv", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--num_verbs", type=int, default=115)
    p.add_argument("--max_boxes", type=int, default=16)
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("opts", nargs="*", default=[])
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    from egot2x.core.schema import (install_reference_defaults,
                                    propagate_reference_keys,
                                    reapply_cli_flags)
    from egot2x.tasks.sta import ShortTermAnticipationTask
    from egot2x.train.trainer import Trainer

    cfg = Config(vars(args))
    if args.cfg:
        cfg.merge_yaml(args.cfg)
    propagate_reference_keys(cfg, family="recognition")
    reapply_cli_flags(cfg, args, build_argparser())
    if args.opts:
        opts_cfg = Config().merge_dotlist(args.opts)
        cfg.merge(opts_cfg)
        propagate_reference_keys(cfg, family="recognition", source=opts_cfg)
    install_reference_defaults(cfg, family="recognition")

    if cfg.synthetic:
        root = os.path.join(tempfile.gettempdir(), "egot2x_sta_fixture")
        if not os.path.exists(os.path.join(root, "fho_sta_train.json")):
            from egot2x.data.synthetic import make_sta_fixture

            make_sta_fixture(root)
        cfg.data_root = root
        cfg.crop_size = 64
        cfg.num_frames = 8
        cfg.alpha = 4
        cfg.batch_size = 2
        cfg.num_verbs = 10
        cfg.max_boxes = 6
        cfg.num_workers = 2
        cfg.jitter_scales = (72, 96)

    task = ShortTermAnticipationTask(cfg)
    trainer = Trainer(
        task,
        max_epochs=cfg.epochs,
        fast_dev_run=cfg.fast_dev_run,
        default_root_dir=os.path.join("logs", "sta", cfg.output_dir),
        seed=cfg.seed,
    )
    state = trainer.fit(state=None)
    metrics = trainer.validate(state)
    print({k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

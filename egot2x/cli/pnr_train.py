"""PNR/OSCC entry point — mirrors ``HOI/scripts/pnr/train.py``:
``--cfg file.yaml KEY VAL ...`` dispatching on DATA.TASK
(keyframe_localisation / state_change_classification /
state_change_detection_and_keyframe_localisation), plus egot2x
--synthetic / --fast_dev_run smoke flags.

Usage:
  python -m egot2x.cli.pnr_train --task keyframe_localisation --synthetic --fast_dev_run
  python -m egot2x.cli.pnr_train --cfg my.yaml DATA.TASK state_change_classification
"""

from __future__ import annotations

import argparse
import os
import tempfile

TASKS = {
    "keyframe_localisation": "KeyframeLocalisation",
    "state_change_classification": "StateChangeClassification",
    "state_change_detection_and_keyframe_localisation":
        "StateChangeAndKeyframeLocalisation",
    # EgoT2-s 2-loader translation tasks (egot2x.tasks.pnr_2loader)
    "keyframe_localisation2loader": "KeyframeLocalisation2Loader",
    "state_change_classification2loader": "StateChangeClassification2Loader",
}


def build_argparser():
    p = argparse.ArgumentParser(description="Ego4D PNR/OSCC (egot2x)")
    p.add_argument("--cfg", type=str, default=None, help="YAML config file")
    p.add_argument("--task", type=str, default="keyframe_localisation",
                   choices=sorted(TASKS))
    p.add_argument("--data_root", type=str, default="../data/pnr")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--optimizer", type=str, default="adamw")
    p.add_argument("--lr_policy", type=str, default="constant")
    p.add_argument("--loss_func", type=str, default="bce")
    p.add_argument("--arch", type=str, default="slow_layer5")
    p.add_argument("--crop_size", type=int, default=225)
    p.add_argument("--sampling_fps", type=int, default=2)
    p.add_argument("--clip_len_sec", type=int, default=8)
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--quant_trunks", action="store_true",
                   help="run the FROZEN HOI trunks in int8 static-PTQ "
                        "during 2-loader translator training (scales "
                        "calibrated on the first batch)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize trunk stages (memory for FLOPs)")
    p.add_argument("opts", nargs="*", default=[],
                   help="KEY VALUE config overrides (reference style)")
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    import egot2x.tasks.pnr as pnr_tasks
    from egot2x.train.trainer import Trainer

    # precedence (reference load_config order): KEY VAL opts > explicit
    # CLI flags > YAML schema keys > argparse/reference defaults
    from egot2x.core.schema import (install_reference_defaults,
                                    propagate_reference_keys,
                                    reapply_cli_flags)

    cfg = Config(vars(args))
    if args.cfg:
        cfg.merge_yaml(args.cfg)
    propagate_reference_keys(cfg, family="pnr")
    reapply_cli_flags(cfg, args, build_argparser())
    if args.opts:
        opts_cfg = Config().merge_dotlist(args.opts)
        cfg.merge(opts_cfg)
        propagate_reference_keys(cfg, family="pnr", source=opts_cfg)
    install_reference_defaults(cfg, family="pnr")

    if cfg.synthetic:
        root = os.path.join(tempfile.gettempdir(), "egot2x_pnr_fixture")
        if not os.path.exists(os.path.join(root, "train.json")):
            from egot2x.data.synthetic import make_pnr_fixture

            make_pnr_fixture(root, img_size=64)
        cfg.data_root = root
        cfg.crop_size = min(cfg.crop_size, 65)
        cfg.batch_size = min(cfg.batch_size, 4)
        cfg.num_workers = 2

    if cfg.task.endswith("2loader"):
        import egot2x.tasks.pnr_2loader as pnr_tasks  # noqa: F811
        if cfg.synthetic:
            cfg.aux_crop = 64
            cfg.aux_num_frames = 8
            cfg.alpha = 4
    task_cls = getattr(pnr_tasks, TASKS[cfg.task])
    task = task_cls(cfg)
    trainer = Trainer(
        task,
        max_epochs=cfg.epochs,
        fast_dev_run=cfg.fast_dev_run,
        default_root_dir=os.path.join("logs", "pnr", cfg.output_dir),
        seed=cfg.seed,
    )
    state = trainer.fit(state=None)
    metrics = trainer.validate(state)
    print({k: round(v, 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

"""AR/LTA entry point — mirrors ``HOI/scripts/lta/run_lta.py``: task
dispatch on DATA.TASK (classification / long_term_anticipation and the
2-loader translation variants), ``--cfg`` YAML + KEY VAL overrides, plus
egot2x --synthetic / --fast_dev_run smoke flags.

Usage:
  python -m egot2x.cli.run_lta --task classification --synthetic --fast_dev_run
  python -m egot2x.cli.run_lta --task long_term_anticipation --synthetic --fast_dev_run
"""

from __future__ import annotations

import argparse
import os
import tempfile

TASKS = {
    "classification": ("egot2x.tasks.ar", "MultiTaskClassificationTask"),
    "long_term_anticipation": ("egot2x.tasks.lta", "LongTermAnticipationTask"),
    "long_term_anticipation_seq":
        ("egot2x.tasks.lta", "LongTermAnticipationTaskSeq"),
    "long_term_anticipation_separateseq":
        ("egot2x.tasks.lta", "LongTermAnticipationTaskSeparateSeq"),
    "recognition2loader": ("egot2x.tasks.ar_2loader", "RecognitionTask2Loader"),
    "lta2loader": ("egot2x.tasks.lta_2loader", "LTA2Loader"),
}


def build_argparser():
    p = argparse.ArgumentParser(description="Ego4D AR / LTA (egot2x)")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--task", type=str, default="classification",
                   choices=sorted(TASKS))
    p.add_argument("--data_root", type=str, default="../data/lta")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--optimizer", type=str, default="sgd")
    p.add_argument("--lr_policy", type=str, default="cosine_warmup")
    p.add_argument("--num_frames", type=int, default=32)
    p.add_argument("--alpha", type=int, default=8)
    p.add_argument("--beta_inv", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--num_classes", type=int, nargs=2, default=[115, 478])
    p.add_argument("--num_input_clips", type=int, default=2)
    p.add_argument("--num_actions", type=int, default=20)
    p.add_argument("--num_sequences_to_predict", type=int, default=5)
    # reference LOG_GRADIENT_PERIOD (recognition defaults.py:526; -1=off)
    p.add_argument("--log_gradient_period", type=int, default=-1)
    p.add_argument("--aggregator", type=str, default="TransformerAggregator")
    p.add_argument("--model", type=str, default=None,
                   help="override the task's default backbone/model, e.g. "
                        "MultiTaskMViT for classification (reference cfg "
                        "MODEL.ARCH mvit, lta_models.py:96-106)")
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--output_dir", type=str, default="debug")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("opts", nargs="*", default=[])
    return p


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    import importlib

    args = build_argparser().parse_args(argv)
    from egot2x.core.config import Config
    from egot2x.train.trainer import Trainer

    cfg = Config(vars(args))
    if cfg.get("model") is None:
        cfg.pop("model", None)  # let each task pick its own default
    from egot2x.core.schema import (install_reference_defaults,
                                    propagate_reference_keys,
                                    reapply_cli_flags)

    if args.cfg:
        cfg.merge_yaml(args.cfg)
    propagate_reference_keys(cfg, family="recognition")
    reapply_cli_flags(cfg, args, build_argparser())
    if cfg.get("model") is None:
        cfg.pop("model", None)
    if args.opts:
        opts_cfg = Config().merge_dotlist(args.opts)
        cfg.merge(opts_cfg)
        propagate_reference_keys(cfg, family="recognition", source=opts_cfg)
    install_reference_defaults(cfg, family="recognition")

    if cfg.synthetic:
        root = os.path.join(tempfile.gettempdir(), "egot2x_lta_fixture")
        if not os.path.exists(os.path.join(root, "fho_lta_train.json")):
            from egot2x.data.synthetic import make_lta_fixture

            make_lta_fixture(root, img_size=64)
        cfg.data_root = root
        cfg.crop_size = min(cfg.crop_size, 64)
        cfg.num_frames = min(cfg.num_frames, 8)
        cfg.alpha = min(cfg.alpha, 4)
        cfg.batch_size = min(cfg.batch_size, 2)
        cfg.num_classes = [10, 12]
        cfg.num_workers = 2
        if cfg.task.endswith("seq"):
            cfg.seq_decoder_dim = 64
            cfg.num_layers = 1
            cfg.num_actions = 4
        if cfg.task.endswith("2loader"):
            cfg.pnr_crop = 65
            cfg.pnr_frames = 8
            cfg.translation_features = 64
            cfg.num_actions = 4 if cfg.task == "lta2loader" else 20

    mod_name, cls_name = TASKS[cfg.task]
    task_cls = getattr(importlib.import_module(mod_name), cls_name)
    task = task_cls(cfg)
    trainer = Trainer(
        task,
        max_epochs=cfg.epochs,
        fast_dev_run=cfg.fast_dev_run,
        default_root_dir=os.path.join("logs", "lta", cfg.output_dir),
        seed=cfg.seed,
        log_gradient_period=max(cfg.get("log_gradient_period", -1), 0),
    )
    state = trainer.fit(state=None)
    metrics = trainer.validate(state)
    print({k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()

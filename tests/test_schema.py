"""Reference config schema: trees, flat-knob resolution, precedence."""

import io

from egot2x.core.config import Config
from egot2x.core.schema import (pnr_schema, recognition_schema,
                                resolve_reference_cfg)


def test_schema_trees_have_reference_defaults():
    pnr = pnr_schema()
    assert pnr.DATA.SAMPLING_FPS == 4
    assert pnr.MODEL.ARCH == "slow_layer5"
    assert pnr.SOLVER.ACCELERATOR == "dp"
    assert pnr.BN.NUM_SYNC_DEVICES == 1
    rec = recognition_schema()
    assert rec.FORECASTING.NUM_SEQUENCES_TO_PREDICT == 5
    assert rec.SLOWFAST.ALPHA == 8
    assert rec.MVIT.EMBED_DIM == 96
    assert rec.MVIT.PATCH_KERNEL == [3, 7, 7]
    assert rec.DATA.MEAN == [0.45, 0.45, 0.45]


def test_resolve_propagates_user_yaml_keys():
    yaml_text = """
SOLVER:
  BASE_LR: 0.02
  LR_POLICY: cosine_warmup
MODEL:
  LOSS_FUNC: cross_entropy
  TRANSLATION_LAYERS: 6
DATA:
  TASK: state_change_classification
  SAMPLING_FPS: 4
"""
    cfg = Config({"lr": 1e-4, "task": "keyframe_localisation",
                  "loss_func": "bce", "epochs": 5})
    cfg.merge_yaml(io.StringIO(yaml_text))
    resolve_reference_cfg(cfg, family="pnr")
    assert cfg.lr == 0.02
    assert cfg.lr_policy == "cosine_warmup"
    assert cfg.loss_func == "cross_entropy"
    assert cfg.translation_layers == 6
    assert cfg.task == "state_change_classification"
    # explicit value equal to the reference default still propagates
    assert cfg.sampling_fps == 4
    # untouched flat knobs stay
    assert cfg.epochs == 5


def test_resolve_installs_defaults_without_overwriting():
    cfg = Config({"lr": 1e-4})
    cfg.merge_dotlist(["MVIT.DEPTH", "24"])
    resolve_reference_cfg(cfg, family="recognition")
    assert cfg.MVIT.DEPTH == 24          # user value kept
    assert cfg.MVIT.EMBED_DIM == 96      # default installed
    assert cfg.NONLOCAL.INSTANTIATION == "dot_product"
    assert cfg.get_path("BN.NUM_SPLITS") == 1


def test_resolve_opts_map_to_flat():
    cfg = Config({"aggregator": "TransformerAggregator",
                  "num_input_clips": 2})
    cfg.merge_dotlist(["FORECASTING.AGGREGATOR", "MeanAggregator",
                       "FORECASTING.NUM_INPUT_CLIPS", "4",
                       "SLOWFAST.ALPHA", "4"])
    resolve_reference_cfg(cfg, family="recognition")
    assert cfg.aggregator == "MeanAggregator"
    assert cfg.num_input_clips == 4
    assert cfg.alpha == 4


def test_cli_flags_beat_yaml_but_opts_beat_flags():
    """Reference precedence: KEY VAL opts > explicit CLI flags > YAML >
    defaults (the round-1 resolver let YAML clobber explicit flags)."""
    import argparse

    from egot2x.core.schema import (install_reference_defaults,
                                    propagate_reference_keys,
                                    reapply_cli_flags)

    parser = argparse.ArgumentParser()
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args(["--lr", "0.5", "--fast_dev_run"])

    cfg = Config(vars(args))
    cfg.merge_yaml(io.StringIO(
        "SOLVER:\n  BASE_LR: 0.02\nMISC:\n  FAST_DEV_RUN: false\n"
        "MODEL:\n  LOSS_FUNC: bce\n"))
    propagate_reference_keys(cfg, family="pnr")
    assert cfg.lr == 0.02            # yaml applied first
    reapply_cli_flags(cfg, args, parser)
    assert cfg.lr == 0.5             # explicit flag wins over yaml
    assert cfg.fast_dev_run is True  # yaml can't cancel --fast_dev_run
    assert cfg.loss_func == "bce"    # yaml-only key survives
    opts_cfg = Config().merge_dotlist(["SOLVER.BASE_LR", "0.9"])
    cfg.merge(opts_cfg)
    propagate_reference_keys(cfg, family="pnr", source=opts_cfg)
    assert cfg.lr == 0.9             # opts beat everything
    assert cfg.fast_dev_run is True  # opts stage must not re-apply yaml
    install_reference_defaults(cfg, family="pnr")
    assert cfg.lr == 0.9             # installing defaults changes nothing
    assert cfg.BN.NUM_SPLITS == 1    # every reference knob has a home

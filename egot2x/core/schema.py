"""Reference config schemas + resolution onto egot2x knobs.

The reference configures HOI via fvcore CfgNode trees
(HOI/configs/pnr/defaults.py — 366 lines; HOI/configs/recognition/
defaults.py — 916 lines) merged with YAML + CLI ``opts``. egot2x's
tasks read flat snake_case knobs. This module gives every reference
knob a home:

  * :func:`pnr_schema` / :func:`recognition_schema` build Config trees
    carrying the reference's knob names and DEFAULT VALUES (defaults
    are behavior, so they are reproduced; internal cluster paths are
    left empty);
  * :data:`PNR_FLAT_MAP` / :data:`RECOGNITION_FLAT_MAP` map dotted
    schema keys onto the flat knobs egot2x tasks consume;
  * :func:`resolve_reference_cfg` propagates schema keys the user set
    (via ``--cfg file.yaml`` or ``KEY VAL`` opts) onto those flat
    knobs, then installs the remaining schema defaults underneath, so
    a reference YAML drives egot2x unmodified and every knob is
    addressable even when egot2x has no behavior keyed on it yet.

Unmapped groups (NONLOCAL.*, JSON_EXPORT.*, MVIT.* details) stay
reachable via ``cfg.get_path`` for models that consume them.
"""

from __future__ import annotations

from typing import Dict

from egot2x.core.config import Config


def pnr_schema() -> Config:
    """HOI/configs/pnr/defaults.py knob tree (reference defaults)."""
    return Config({
        "DATA": {
            "VIDEO_DIR_PATH": "", "ANN_PATH": "", "ANN_DIR": "",
            "SPLIT_PATH": "", "CLIPS_SAVE_PATH": "", "NO_SC_PATH": "",
            "NO_SC_SPLIT_PATH": "",
            "SAMPLING_FPS": 4, "CLIP_LEN_SEC": 8,
            "INPUT_CHANNEL_NUM": [3], "NUM_FRAMES": 8, "CROP_SIZE": 224,
            "TASK": "frame_detection_regression",
        },
        "TRAIN": {"TRAIN_ENABLE": True,
                  "DATASET": "Ego4DKeyframeLocalisation", "BATCH_SIZE": 8},
        "TEST": {"ENABLE": False, "DATASET": "Ego4DKeyframeLocalisation",
                 "BATCH_SIZE": 4, "JSON": "fixed_test_set.json",
                 "VAL_JSON": "fixed_val_set.json"},
        "DATA_LOADER": {"NUM_WORKERS": 8, "PIN_MEMORY": True,
                        "SHUFFLE": True, "DROP_LAST": True,
                        "IS_NO_STATE_CHANGE": True},
        "MISC": {"CHECKPOINT_FILE_PATH": None, "OUTPUT_DIR": "",
                 "LOG_DIR": "debug", "NUM_GPUS": 1, "NUM_SHARDS": 1,
                 "ENABLE_LOGGING": True, "FAST_DEV_RUN": False},
        "BN": {"WEIGHT_DECAY": 0.0, "NORM_TYPE": "batchnorm",
               "NUM_SPLITS": 1, "NUM_SYNC_DEVICES": 1},
        "RESNET": {"TRANS_FUNC": "bottleneck_transform", "NUM_GROUPS": 1,
                   "WIDTH_PER_GROUP": 64, "INPLACE_RELU": True,
                   "STRIDE_1X1": False, "ZERO_INIT_FINAL_BN": True,
                   "DEPTH": 50,
                   "NUM_BLOCK_TEMP_KERNEL": [[3], [4], [6], [3]],
                   "SPATIAL_STRIDES": [[1], [2], [2], [2]],
                   "SPATIAL_DILATIONS": [[1], [1], [1], [1]]},
        "MODEL": {"NO_TEMP_POOL": False, "ARCH": "slow_layer5",
                  "MODEL_NAME": "DualHeadResNet", "NUM_CLASSES": [2],
                  "NUM_STATE_CLASSES": [2], "LOSS_REDUCTION": "none",
                  "LAMBDA_1": 1, "LAMBDA_2": 1,
                  "LOSS_FUNC": "cross_entropy", "DROPOUT_RATE": 0.5,
                  "TRANSLATION_LAYERS": 3,
                  "TRANSLATION_INPUT_FEATURES": 256,
                  "FEAT_DROPOUT_MODE": 0, "FEAT_DROPOUT_RATE": 0.5,
                  "TRANSFORMER_DROPOUT_RATE": 0.1, "FC_INIT_STD": 0.01,
                  "HEAD_ACT": "softmax", "STATE_CHANGE_ACT": "softmax_2",
                  "KEYFRAME_DETECTION_ACT": "softmax_1"},
        "NONLOCAL": {"LOCATION": [[[]], [[]], [[]], [[]]],
                     "GROUP": [[1], [1], [1], [1]],
                     "INSTANTIATION": "dot_product"},
        "SOLVER": {"BASE_LR": 0.1, "MAX_EPOCH": 100, "WEIGHT_DECAY": 1e-4,
                   "OPTIMIZING_METHOD": "sgd", "MOMENTUM": 0.9,
                   "DAMPENING": 0.0, "NESTEROV": True, "ACCELERATOR": "dp",
                   "LR_POLICY": "cosine"},
        "PRETRAIN": {"PNR_CFG": None, "PNR_FT": True, "OSCC_CFG": None,
                     "OSCC_FT": True, "ACTION_CFG": None, "ACTION_FT": True},
    })


def recognition_schema() -> Config:
    """HOI/configs/recognition/defaults.py knob tree (subset shared with
    pnr_schema plus the FORECASTING/SLOWFAST/MVIT/CHECKPOINT groups)."""
    cfg = pnr_schema()
    cfg.merge({
        "DATA": {"NUM_FRAMES": 8, "SAMPLING_RATE": 8,
                 "MEAN": [0.45, 0.45, 0.45], "STD": [0.225, 0.225, 0.225],
                 "TRAIN_JITTER_SCALES": [256, 320], "TARGET_FPS": 30},
        "MODEL": {"ARCH": "slow", "MODEL_NAME": "ResNet",
                  "NUM_CLASSES": [400], "FREEZE_BACKBONE": True,
                  "TRANSLATION_INPUT_FEATURES": 2048,
                  "TRANSLATION_HEADS": 8, "TRANSLATION_DROPOUT": 0.1},
        "SOLVER": {"STEPS": [], "LRS": [], "WARMUP_FACTOR": 0.1,
                   "WARMUP_EPOCHS": 0.0, "WARMUP_STEPS": 1000,
                   "WARMUP_START_LR": 0.01},
        "SLOWFAST": {"BETA_INV": 8, "ALPHA": 8,
                     "FUSION_CONV_CHANNEL_RATIO": 2, "FUSION_KERNEL_SZ": 5},
        "MVIT": {"MODE": "conv", "CLS_EMBED_ON": True,
                 "PATCH_KERNEL": [3, 7, 7], "PATCH_STRIDE": [2, 4, 4],
                 "PATCH_PADDING": [1, 3, 3], "PATCH_2D": False,
                 "EMBED_DIM": 96, "NUM_HEADS": 1, "MLP_RATIO": 4.0,
                 "QKV_BIAS": True, "DROPPATH_RATE": 0.1, "DEPTH": 16,
                 "NORM": "layernorm", "DIM_MUL": [], "HEAD_MUL": [],
                 "POOL_KV_STRIDE": [], "POOL_Q_STRIDE": [],
                 "POOL_KVQ_KERNEL": None, "ZERO_DECAY_POS_CLS": True,
                 "NORM_STEM": False, "SEP_POS_EMBED": False,
                 "DROPOUT_RATE": 0.0, "USE_ABS_POS": True,
                 "REL_POS_SPATIAL": False, "REL_POS_TEMPORAL": False,
                 "POOL_FIRST": False},
        "FORECASTING": {"AGGREGATOR": "ConcatAggregator",
                        "DECODER": "MultiHeadDecoder",
                        "NUM_ACTIONS_TO_PREDICT": 1,
                        "NUM_SEQUENCES_TO_PREDICT": 5,
                        "NUM_INPUT_CLIPS": 1, "INPUT_OFFSET": 0},
        "CHECKPOINT_FILE_PATH": "", "CHECKPOINT_FILE_PATH_AR": "",
        "CHECKPOINT_FILE_PATH_LTA": "", "CHECKPOINT_VERSION": "",
        "CHECKPOINT_LOAD_MODEL_HEAD": False,
        "LOG_GRADIENT_PERIOD": -1,  # recognition defaults.py:526
    })
    return cfg


# dotted reference key -> flat egot2x knob
_COMMON_FLAT_MAP: Dict[str, str] = {
    "DATA.TASK": "task",
    "DATA.CROP_SIZE": "crop_size",
    "TRAIN.BATCH_SIZE": "batch_size",
    "DATA_LOADER.NUM_WORKERS": "num_workers",
    "MISC.FAST_DEV_RUN": "fast_dev_run",
    "MISC.LOG_DIR": "output_dir",
    "SOLVER.BASE_LR": "lr",
    "SOLVER.WEIGHT_DECAY": "wd",
    "SOLVER.OPTIMIZING_METHOD": "optimizer",
    "SOLVER.LR_POLICY": "lr_policy",
    "SOLVER.MAX_EPOCH": "epochs",
    "MODEL.MODEL_NAME": "model",
    "MODEL.ARCH": "arch",
    "MODEL.LOSS_FUNC": "loss_func",
    "MODEL.DROPOUT_RATE": "dropout",
    "MODEL.TRANSLATION_LAYERS": "translation_layers",
    "MODEL.TRANSLATION_INPUT_FEATURES": "translation_features",
    "MODEL.FEAT_DROPOUT_RATE": "feat_dropout",
}

PNR_FLAT_MAP: Dict[str, str] = {
    **_COMMON_FLAT_MAP,
    "DATA.SAMPLING_FPS": "sampling_fps",
    "DATA.CLIP_LEN_SEC": "clip_len_sec",
    "MODEL.LAMBDA_1": "lambda1",
    "MODEL.LAMBDA_2": "lambda2",
    "PRETRAIN.PNR_CFG": "pretrain_pnr_cfg",
    "PRETRAIN.OSCC_CFG": "pretrain_oscc_cfg",
    "PRETRAIN.ACTION_CFG": "pretrain_action_cfg",
}

RECOGNITION_FLAT_MAP: Dict[str, str] = {
    **_COMMON_FLAT_MAP,
    "DATA.NUM_FRAMES": "num_frames",
    "MODEL.NUM_CLASSES": "num_classes",
    "SLOWFAST.ALPHA": "alpha",
    "SLOWFAST.BETA_INV": "beta_inv",
    "RESNET.DEPTH": "resnet_depth",
    "FORECASTING.AGGREGATOR": "aggregator",
    "FORECASTING.NUM_INPUT_CLIPS": "num_input_clips",
    "FORECASTING.NUM_ACTIONS_TO_PREDICT": "num_actions",
    "FORECASTING.NUM_SEQUENCES_TO_PREDICT": "num_sequences_to_predict",
    "CHECKPOINT_FILE_PATH": "ckpt",
    "CHECKPOINT_FILE_PATH_AR": "ckpt_ar",
    "CHECKPOINT_FILE_PATH_LTA": "ckpt_lta",
    "LOG_GRADIENT_PERIOD": "log_gradient_period",
}


def propagate_reference_keys(cfg: Config, family: str = "pnr",
                             source: Config = None) -> Config:
    """Map dotted schema keys PRESENT in ``source`` (default: cfg
    itself) onto cfg's flat knobs.

    Presence decides propagation: the flat argparse namespace carries no
    schema groups, so a dotted key exists only if the user set it via
    YAML or dotlist opts. Must run BEFORE install_reference_defaults
    (installed defaults would otherwise look user-set). Pass the
    dotlist-only tree as ``source`` for the opts stage so it does not
    re-propagate YAML keys over reapplied CLI flags."""
    flat_map = PNR_FLAT_MAP if family == "pnr" else RECOGNITION_FLAT_MAP
    src = cfg if source is None else source
    for dotted, flat in flat_map.items():
        val = src.get_path(dotted, default=_MISSING)
        if val is not _MISSING:
            dict.__setitem__(cfg, flat, Config._wrap(val))
    return cfg


def install_reference_defaults(cfg: Config, family: str = "pnr") -> Config:
    """Give every reference knob a home (defaults under user values)."""
    schema = pnr_schema() if family == "pnr" else recognition_schema()
    for group, tree in schema.items():
        if group not in cfg:
            dict.__setitem__(cfg, group, tree)
        elif isinstance(tree, Config) and isinstance(cfg.get(group), Config):
            for k, v in tree.items():
                if k not in cfg[group]:
                    dict.__setitem__(cfg[group], k, v)
    return cfg


def reapply_cli_flags(cfg: Config, args, parser) -> Config:
    """Explicit command-line flags win over YAML schema keys.

    A flag counts as explicit when its parsed value differs from the
    parser default (a flag explicitly set TO its default is
    indistinguishable — the standard yacs/argparse limitation). Call
    after YAML propagation, before dotlist opts (reference precedence:
    opts > explicit flags > yaml > defaults)."""
    defaults = vars(parser.parse_args([]))
    for k, v in vars(args).items():
        if k in ("cfg", "opts"):
            continue
        if v != defaults.get(k):
            dict.__setitem__(cfg, k, Config._wrap(v))
    return cfg


def resolve_reference_cfg(cfg: Config, family: str = "pnr") -> Config:
    """propagate + install in one call (YAML/opts already merged and no
    explicit-flag precedence needed — e.g. programmatic configs)."""
    propagate_reference_keys(cfg, family)
    return install_reference_defaults(cfg, family)


class _Missing:
    pass


_MISSING = _Missing()

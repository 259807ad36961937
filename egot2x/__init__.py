"""egot2x — TPU-native egocentric video task translation framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
facebookresearch/EgoT2 (CVPR 2023): seven Ego4D tasks (LAM, TTM, ASD,
PNR, OSCC, AR, LTA), task-specific translation (EgoT2-s) and
task-general translation (EgoT2-g).

Layout (see SURVEY.md §7):
  core/       config, registry, mesh/sharding, PRNG, checkpointing
  audio/      log-mel / MFCC frontends in pure JAX
  nn/         flax modules: resnet18_2d, BiLSTM, ResNetSE, TalkNet,
              ResNet3D, SlowFast, MViT, transformer blocks
  ops/        Pallas TPU kernels + jnp fallbacks
  models/     task backbones assembled + MODEL registry
  translate/  EgoT2-s translators and EgoT2-g prompt models + vocab
  data/       host-side pipelines, static-shape bucketing, synthetic fixtures
  tasks/      per-task train/eval step definitions, losses, val aggregation
  train/      optax optimizers/schedules, trainer loop, train state
  metrics/    mAP, keyframe distance, top-k, edit distance / AUED
  cli/        entry points mirroring the reference's script surface
"""

__version__ = "0.1.0"

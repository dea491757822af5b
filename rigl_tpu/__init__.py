"""rigl_tpu: a TPU-native dynamic sparse training framework in JAX.

Re-designed from scratch with the capabilities of google-research/rigl
("Rigging the Lottery: Making All Tickets Winners", MLSys 2020): train neural
networks that are sparse throughout training, with the sparse topology
periodically updated by magnitude-based drop and gradient-based grow.

Architecture (bottom-up):
  sparsity/    — distributions (uniform/ER/ERK/STR), mask pytrees, schedules,
                 the drop/grow kernel as a pure function
  transforms/  — the sparse-training algorithms (SET, RigL, Static, SNFS,
                 SNIP, DNW, gradual magnitude pruning) as functional updates
  layers/      — flax modules with an explicit 'masks' collection
  models/      — MLP/LeNet/WideResNet/ResNet/MobileNet/VGG families
  ops/         — Pallas TPU kernels for the hot paths
  data/        — input pipelines
  train/       — jitted train loops, checkpointing, metrics
  parallel/    — jax.sharding mesh utilities
"""

__version__ = '0.1.0'

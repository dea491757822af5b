"""Sparse-training algorithms as functional transforms over optax optimizers."""

from rigl_tpu.transforms.algorithms import (
    DENSE,
    DNW,
    SCRATCH,
    SET,
    SNFS,
    SNIP,
    Algorithm,
    GradualPruning,
    RigL,
    RigLInverted,
    Static,
    get_algorithm,
)
from rigl_tpu.transforms.sparse_training import SparseState, SparseTraining

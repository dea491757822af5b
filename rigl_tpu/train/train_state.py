"""Train state for sparse training: params + BN stats + optimizer + masks."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from rigl_tpu.transforms.sparse_training import SparseState


class TrainState(flax.struct.PyTreeNode):
  params: Any
  batch_stats: Any
  opt_state: optax.OptState
  sparse: SparseState
  rng: jax.Array

  @property
  def step(self) -> jnp.ndarray:
    return self.sparse.step

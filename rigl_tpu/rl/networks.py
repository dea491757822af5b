"""Q/value networks for the RL workload — parity with rigl/rl/dqn_agents.py:
NatureDQNNetwork (width-scaled convs, :211-306), ImpalaNetwork (:103-208),
plus a small MLP Q-net for classic control.  All are standard flax modules;
sparsity comes from the functional mask overlay like everywhere else."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLPQNetwork(nn.Module):
  num_actions: int
  hidden: Sequence[int] = (256, 256)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = x.reshape((x.shape[0], -1)).astype(self.dtype)
    for i, h in enumerate(self.hidden):
      x = nn.relu(nn.Dense(h, dtype=self.dtype, name=f'dense{i + 1}')(x))
    return nn.Dense(self.num_actions, dtype=self.dtype, name='q')(x)


class NatureDQN(nn.Module):
  """Nature-DQN convnet with a width multiplier (dqn_agents.py:211-306)."""
  num_actions: int
  width: float = 1.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    w = self.width
    x = x.astype(self.dtype)
    x = nn.relu(nn.Conv(int(32 * w), (8, 8), strides=(4, 4),
                        dtype=self.dtype, name='conv1')(x))
    x = nn.relu(nn.Conv(int(64 * w), (4, 4), strides=(2, 2),
                        dtype=self.dtype, name='conv2')(x))
    x = nn.relu(nn.Conv(int(64 * w), (3, 3), strides=(1, 1),
                        dtype=self.dtype, name='conv3')(x))
    x = x.reshape((x.shape[0], -1))
    x = nn.relu(nn.Dense(int(512 * w), dtype=self.dtype, name='dense1')(x))
    return nn.Dense(self.num_actions, dtype=self.dtype, name='q')(x)


class _ImpalaBlock(nn.Module):
  features: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.features, (3, 3), dtype=self.dtype, name='conv')(x)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
    for i in range(2):
      y = nn.relu(x)
      y = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                  name=f'res{i}_conv1')(y)
      y = nn.relu(y)
      y = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                  name=f'res{i}_conv2')(y)
      x = x + y
    return x


class ImpalaNet(nn.Module):
  """IMPALA deep net (dqn_agents.py:103-208), width-scaled."""
  num_actions: int
  width: float = 1.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = x.astype(self.dtype)
    for i, feats in enumerate((16, 32, 32)):
      x = _ImpalaBlock(int(feats * self.width), dtype=self.dtype,
                       name=f'block{i}')(x)
    x = nn.relu(x)
    x = x.reshape((x.shape[0], -1))
    x = nn.relu(nn.Dense(int(256 * self.width), dtype=self.dtype,
                         name='dense1')(x))
    return nn.Dense(self.num_actions, dtype=self.dtype, name='q')(x)

"""Device-resident circular replay buffer.

Replaces the reference's Dopamine OutOfGraphReplayBuffer (host numpy) with a
fully on-device pytree: adds and uniform samples are pure functions, so the
whole collect/learn loop stays inside jit — no host<->device transfers in the
hot path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
  obs: jnp.ndarray         # (cap, *obs_shape)
  action: jnp.ndarray      # (cap,)
  reward: jnp.ndarray      # (cap,)
  next_obs: jnp.ndarray    # (cap, *obs_shape)
  done: jnp.ndarray        # (cap,)
  ptr: jnp.ndarray         # int32 write cursor
  size: jnp.ndarray        # int32 valid entries


def create(capacity: int, obs_shape: Tuple[int, ...],
           action_shape: Tuple[int, ...] = ()) -> ReplayBuffer:
  """Discrete actions by default; pass action_shape=(action_dim,) for
  continuous control (float actions)."""
  action = (jnp.zeros((capacity,), jnp.int32) if action_shape == ()
            else jnp.zeros((capacity,) + action_shape, jnp.float32))
  return ReplayBuffer(
      obs=jnp.zeros((capacity,) + obs_shape, jnp.float32),
      action=action,
      reward=jnp.zeros((capacity,), jnp.float32),
      next_obs=jnp.zeros((capacity,) + obs_shape, jnp.float32),
      done=jnp.zeros((capacity,), jnp.bool_),
      ptr=jnp.zeros((), jnp.int32),
      size=jnp.zeros((), jnp.int32),
  )


def add(buf: ReplayBuffer, obs, action, reward, next_obs, done
        ) -> ReplayBuffer:
  cap = buf.obs.shape[0]
  i = buf.ptr
  return ReplayBuffer(
      obs=buf.obs.at[i].set(obs),
      action=buf.action.at[i].set(action),
      reward=buf.reward.at[i].set(reward),
      next_obs=buf.next_obs.at[i].set(next_obs),
      done=buf.done.at[i].set(done),
      ptr=(i + 1) % cap,
      size=jnp.minimum(buf.size + 1, cap),
  )


def sample(buf: ReplayBuffer, key: jax.Array, batch_size: int):
  """Uniform sample over the valid prefix (with replacement)."""
  idx = jax.random.randint(key, (batch_size,), 0,
                           jnp.maximum(buf.size, 1))
  return {
      'obs': buf.obs[idx],
      'action': buf.action[idx],
      'reward': buf.reward[idx],
      'next_obs': buf.next_obs[idx],
      'done': buf.done[idx],
  }

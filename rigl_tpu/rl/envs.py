"""Pure-JAX environments for the RL workload.

The reference's RL stack (rigl/rl/) drives Atari/MuJoCo through Dopamine and
tf-agents — host-side simulators feeding a TF graph.  The TPU-native
re-design makes the environment itself a jittable pure function, so entire
rollout -> replay -> learn loops compile into single XLA programs
(lax.scan over env steps) with zero host crossings.

CartPole-v1 dynamics (classic control), the standard correctness benchmark
for DQN/PPO implementations.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EnvState(NamedTuple):
  obs: jnp.ndarray      # (4,) [x, x_dot, theta, theta_dot]
  done: jnp.ndarray     # bool
  t: jnp.ndarray        # int32 step count
  key: jax.Array


class Pendulum:
  """Pendulum-v1: continuous torque control, the standard SAC benchmark.

  obs = [cos(theta), sin(theta), theta_dot]; action = torque in [-2, 2];
  reward = -(angle^2 + 0.1*theta_dot^2 + 0.001*u^2); 200-step episodes.
  """

  action_dim: int = 1
  max_action: float = 2.0
  obs_shape: Tuple[int, ...] = (3,)
  max_steps: int = 200

  GRAVITY = 10.0
  MASS = 1.0
  LENGTH = 1.0
  DT = 0.05
  MAX_SPEED = 8.0

  def _obs(self, theta, theta_dot):
    return jnp.stack([jnp.cos(theta), jnp.sin(theta), theta_dot])

  def reset(self, key: jax.Array) -> EnvState:
    key, sub = jax.random.split(key)
    theta = jax.random.uniform(sub, (), minval=-jnp.pi, maxval=jnp.pi)
    key, sub = jax.random.split(key)
    theta_dot = jax.random.uniform(sub, (), minval=-1.0, maxval=1.0)
    return EnvState(obs=self._obs(theta, theta_dot),
                    done=jnp.asarray(False),
                    t=jnp.zeros((), jnp.int32), key=key)

  def step(self, state: EnvState, action: jnp.ndarray
           ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    cos_t, sin_t, theta_dot = state.obs
    theta = jnp.arctan2(sin_t, cos_t)
    u = jnp.clip(jnp.reshape(action, ()), -self.max_action, self.max_action)
    cost = (theta ** 2 + 0.1 * theta_dot ** 2 + 0.001 * u ** 2)
    theta_dot = theta_dot + self.DT * (
        3.0 * self.GRAVITY / (2.0 * self.LENGTH) * jnp.sin(theta)
        + 3.0 / (self.MASS * self.LENGTH ** 2) * u)
    theta_dot = jnp.clip(theta_dot, -self.MAX_SPEED, self.MAX_SPEED)
    theta = theta + self.DT * theta_dot
    t = state.t + 1
    done = t >= self.max_steps
    key, sub = jax.random.split(state.key)
    k1, k2 = jax.random.split(sub)
    reset_theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
    reset_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
    next_obs = jnp.where(done, self._obs(reset_theta, reset_dot),
                         self._obs(theta, theta_dot))
    next_t = jnp.where(done, 0, t)
    return (EnvState(obs=next_obs, done=done, t=next_t, key=key),
            -cost, done)


class CartPole:
  """CartPole-v1: force +-10N, dt 0.02, fail at |x|>2.4 or |theta|>12deg,
  500-step limit, reward 1 per step."""

  num_actions: int = 2
  obs_shape: Tuple[int, ...] = (4,)
  max_steps: int = 500

  GRAVITY = 9.8
  CART_MASS = 1.0
  POLE_MASS = 0.1
  TOTAL_MASS = CART_MASS + POLE_MASS
  LENGTH = 0.5
  POLEMASS_LENGTH = POLE_MASS * LENGTH
  FORCE_MAG = 10.0
  DT = 0.02
  X_LIMIT = 2.4
  THETA_LIMIT = 12 * 2 * jnp.pi / 360

  def reset(self, key: jax.Array) -> EnvState:
    key, sub = jax.random.split(key)
    obs = jax.random.uniform(sub, (4,), minval=-0.05, maxval=0.05)
    return EnvState(obs=obs, done=jnp.asarray(False),
                    t=jnp.zeros((), jnp.int32), key=key)

  def step(self, state: EnvState, action: jnp.ndarray
           ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    """Returns (next_state, reward, done). Auto-resets when done."""
    x, x_dot, theta, theta_dot = state.obs
    force = jnp.where(action == 1, self.FORCE_MAG, -self.FORCE_MAG)
    costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
    temp = (force + self.POLEMASS_LENGTH * theta_dot ** 2 * sintheta
            ) / self.TOTAL_MASS
    theta_acc = (self.GRAVITY * sintheta - costheta * temp) / (
        self.LENGTH * (4.0 / 3.0 - self.POLE_MASS * costheta ** 2
                       / self.TOTAL_MASS))
    x_acc = temp - self.POLEMASS_LENGTH * theta_acc * costheta \
        / self.TOTAL_MASS
    x = x + self.DT * x_dot
    x_dot = x_dot + self.DT * x_acc
    theta = theta + self.DT * theta_dot
    theta_dot = theta_dot + self.DT * theta_acc
    obs = jnp.stack([x, x_dot, theta, theta_dot])
    t = state.t + 1
    done = ((jnp.abs(x) > self.X_LIMIT)
            | (jnp.abs(theta) > self.THETA_LIMIT)
            | (t >= self.max_steps))
    reward = jnp.asarray(1.0)

    # Auto-reset on termination (episode boundary visible via `done`).
    key, sub = jax.random.split(state.key)
    reset_obs = jax.random.uniform(sub, (4,), minval=-0.05, maxval=0.05)
    next_obs = jnp.where(done, reset_obs, obs)
    next_t = jnp.where(done, 0, t)
    return EnvState(obs=next_obs, done=done, t=next_t, key=key), reward, done

"""Pure-JAX environments for the RL workload.

The reference's RL stack (rigl/rl/) drives Atari/MuJoCo through Dopamine and
tf-agents — host-side simulators feeding a TF graph.  The TPU-native
re-design makes the environment itself a jittable pure function, so entire
rollout -> replay -> learn loops compile into single XLA programs
(lax.scan over env steps) with zero host crossings.

Env zoo: CartPole (discrete, DQN/PPO correctness benchmark), Pendulum
(continuous, SAC), Breakout (MinAtar-style 10x10 image obs for the
NatureDQN/Impala conv networks).
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


class Breakout:
  """MinAtar-style Breakout on a 10x10 grid — the conv-net workload.

  The reference exercises NatureDQN/Impala nets on Atari through Dopamine
  (rl/dqn_agents.py:211-306); this pure-JAX miniature keeps the whole
  rollout+learn loop on-device while presenting an image observation that
  drives the same conv Q-networks.

  Observation (10, 10, 4) float32 channels: 0=paddle (bottom row), 1=ball,
  2=direction code at the ball cell (value k/4, k in 1..4 encoding the four
  diagonal velocities — MinAtar uses a trail channel for the same
  Markov-ness; an explicit code avoids trail clipping artifacts at walls),
  3=bricks (three rows).  Actions: 0=noop, 1=left, 2=right.  Reward +1 per
  brick; episode ends when the ball passes the paddle or at `max_steps`;
  bricks replenish when cleared.  The observation is the full state, so
  EnvState stays the shared (obs, done, t, key) tuple.
  """

  num_actions: int = 3
  obs_shape: Tuple[int, ...] = (10, 10, 4)
  max_steps: int = 1000
  SIZE = 10
  BRICK_ROWS = (1, 2, 3)

  def _bricks_full(self):
    b = jnp.zeros((self.SIZE, self.SIZE), jnp.float32)
    for r in self.BRICK_ROWS:
      b = b.at[r].set(1.0)
    return b

  def _pack(self, paddle_x, ball, dy, dx, bricks):
    code = ((dy > 0) * 2 + (dx > 0) + 1).astype(jnp.float32) / 4.0
    obs = jnp.zeros(self.obs_shape, jnp.float32)
    obs = obs.at[self.SIZE - 1, paddle_x, 0].set(1.0)
    obs = obs.at[ball[0], ball[1], 1].set(1.0)
    obs = obs.at[ball[0], ball[1], 2].set(code)
    return obs.at[:, :, 3].set(bricks)

  def _unpack(self, obs):
    paddle_x = jnp.argmax(obs[self.SIZE - 1, :, 0]).astype(jnp.int32)
    ball = jnp.stack(jnp.unravel_index(jnp.argmax(obs[:, :, 1]),
                                       (self.SIZE, self.SIZE))
                     ).astype(jnp.int32)
    k = jnp.round(jnp.max(obs[:, :, 2]) * 4.0).astype(jnp.int32)
    dy = jnp.where(k >= 3, 1, -1).astype(jnp.int32)
    dx = jnp.where(k % 2 == 0, 1, -1).astype(jnp.int32)
    return paddle_x, ball, dy, dx, obs[:, :, 3]

  def _reset_obs(self, key):
    k1, k2 = jax.random.split(key)
    col = jax.random.randint(k1, (), 0, self.SIZE)
    dx = jnp.where(jax.random.bernoulli(k2), 1, -1).astype(jnp.int32)
    ball = jnp.stack([jnp.asarray(4, jnp.int32), col])
    return self._pack(jnp.asarray(self.SIZE // 2, jnp.int32), ball,
                      jnp.asarray(1, jnp.int32), dx, self._bricks_full())

  def reset(self, key: jax.Array) -> EnvState:
    key, sub = jax.random.split(key)
    return EnvState(obs=self._reset_obs(sub), done=jnp.asarray(False),
                    t=jnp.zeros((), jnp.int32), key=key)

  def step(self, state: EnvState, action: jnp.ndarray
           ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    size = self.SIZE
    paddle_x, ball, dy, dx, bricks = self._unpack(state.obs)

    paddle_x = jnp.clip(
        paddle_x + jnp.where(action == 2, 1, 0) - jnp.where(action == 1, 1, 0),
        0, size - 1)

    # Wall bounces (sides + top), then advance one cell.
    dx = jnp.where((ball[1] + dx < 0) | (ball[1] + dx > size - 1), -dx, dx)
    dy = jnp.where(ball[0] + dy < 0, -dy, dy)
    new_ball = ball + jnp.stack([dy, dx])

    # Brick hit: clear it, score, bounce vertically (ball occupies the
    # brick cell this step, reverses next step via the direction code).
    hit = bricks[new_ball[0], new_ball[1]] > 0
    reward = hit.astype(jnp.float32)
    bricks = bricks.at[new_ball[0], new_ball[1]].set(
        jnp.where(hit, 0.0, bricks[new_ball[0], new_ball[1]]))
    # Replenish when cleared.
    bricks = jnp.where(bricks.sum() == 0, self._bricks_full(), bricks)
    # Vertical bounce off the brick: trail below/above accordingly.
    dy_after = jnp.where(hit, -dy, dy)

    # Bottom row: paddle catch bounces, miss ends the episode.
    at_bottom = new_ball[0] == size - 1
    caught = at_bottom & (new_ball[1] == paddle_x)
    missed = at_bottom & ~caught
    dy_after = jnp.where(caught, -1, dy_after)

    t = state.t + 1
    done = missed | (t >= self.max_steps)
    obs = self._pack(paddle_x, new_ball, dy_after, dx, bricks)

    key, sub = jax.random.split(state.key)
    next_obs = jnp.where(done, self._reset_obs(sub), obs)
    next_t = jnp.where(done, 0, t)
    return (EnvState(obs=next_obs, done=done, t=next_t, key=key),
            reward, done)


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

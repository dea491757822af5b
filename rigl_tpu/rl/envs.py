"""Pure-JAX environments for the RL workload.

The reference's RL stack (rigl/rl/) drives Atari/MuJoCo through Dopamine and
tf-agents — host-side simulators feeding a TF graph.  The TPU-native
re-design makes the environment itself a jittable pure function, so entire
rollout -> replay -> learn loops compile into single XLA programs
(lax.scan over env steps) with zero host crossings.

Env zoo: CartPole (discrete, DQN/PPO correctness benchmark), Pendulum
(continuous, SAC), and a MinAtar-style set — Breakout, Freeway, Asterix,
SpaceInvaders — 10x10 image obs for the NatureDQN/Impala conv networks
(the reference's Atari workload, rl/dqn_agents.py:211-306).  Every env is
fully observable: the observation channels carry the complete state, so
EnvState stays the shared (obs, done, t, key) tuple and whole episodes
compile into lax.scan.
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


class Freeway:
  """MinAtar-style Freeway: the player climbs from the bottom row to the
  top through 8 lanes of crossing cars.

  Observation (10, 10, 2): 0=player (fixed column 4), 1=cars (one per lane,
  rows 1..8; lane direction alternates, lane speed is the fixed period
  table).  Actions: 0=noop, 1=up, 2=down.  Reward +1 on reaching row 0
  (player returns to the bottom); collision sends the player back to the
  bottom (MinAtar semantics: no terminal on hit); `max_steps` bounds the
  episode.
  """

  num_actions: int = 3
  obs_shape: Tuple[int, ...] = (10, 10, 2)
  max_steps: int = 500
  SIZE = 10
  COL = 4
  # Lane l (rows 1..8) moves every PERIODS[l-1] steps; odd lanes left.
  PERIODS = (1, 2, 3, 4, 4, 3, 2, 1)

  def _pack(self, player_row, car_cols):
    obs = jnp.zeros(self.obs_shape, jnp.float32)
    obs = obs.at[player_row, self.COL, 0].set(1.0)
    lanes = jnp.arange(1, 9)
    return obs.at[lanes, car_cols, 1].set(1.0)

  def _unpack(self, obs):
    player_row = jnp.argmax(obs[:, self.COL, 0]).astype(jnp.int32)
    car_cols = jnp.argmax(obs[1:9, :, 1], axis=1).astype(jnp.int32)
    return player_row, car_cols

  def _reset_obs(self, key):
    cols = jax.random.randint(key, (8,), 0, self.SIZE)
    return self._pack(jnp.asarray(self.SIZE - 1, jnp.int32), cols)

  def reset(self, key: jax.Array) -> EnvState:
    key, sub = jax.random.split(key)
    return EnvState(obs=self._reset_obs(sub), done=jnp.asarray(False),
                    t=jnp.zeros((), jnp.int32), key=key)

  def step(self, state: EnvState, action: jnp.ndarray
           ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    player_row, car_cols = self._unpack(state.obs)
    t = state.t + 1

    player_row = jnp.clip(
        player_row - jnp.where(action == 1, 1, 0)
        + jnp.where(action == 2, 1, 0), 0, self.SIZE - 1)

    periods = jnp.asarray(self.PERIODS, jnp.int32)
    dirs = jnp.where(jnp.arange(8) % 2 == 0, 1, -1)
    moves = (t % periods == 0).astype(jnp.int32)
    car_cols = (car_cols + dirs * moves) % self.SIZE

    # Collision: a car occupies (lane, COL) while the player is in it.
    lanes = jnp.arange(1, 9)
    hit = jnp.any((car_cols == self.COL) & (lanes == player_row))
    scored = player_row == 0
    reward = scored.astype(jnp.float32)
    player_row = jnp.where(hit | scored,
                           jnp.asarray(self.SIZE - 1, jnp.int32), player_row)

    done = t >= self.max_steps
    obs = self._pack(player_row, car_cols)
    key, sub = jax.random.split(state.key)
    next_obs = jnp.where(done, self._reset_obs(sub), obs)
    next_t = jnp.where(done, 0, t)
    return (EnvState(obs=next_obs, done=done, t=next_t, key=key),
            reward, done)


class Asterix:
  """MinAtar-style Asterix: collect gold, dodge enemies, 4-way movement.

  Observation (10, 10, 3): 0=player, 1=entities (one per lane, rows 1..8,
  direction alternating by lane), 2=gold flag at the entity cell (1=gold,
  0=enemy).  Actions: 0=noop, 1=left, 2=right, 3=up, 4=down.  Touching
  gold: +1 and the entity respawns at its lane edge; touching an enemy
  ends the episode.
  """

  num_actions: int = 5
  obs_shape: Tuple[int, ...] = (10, 10, 3)
  max_steps: int = 500
  SIZE = 10

  def _pack(self, player, cols, golds):
    obs = jnp.zeros(self.obs_shape, jnp.float32)
    obs = obs.at[player[0], player[1], 0].set(1.0)
    lanes = jnp.arange(1, 9)
    obs = obs.at[lanes, cols, 1].set(1.0)
    return obs.at[lanes, cols, 2].set(golds.astype(jnp.float32))

  def _unpack(self, obs):
    player = jnp.stack(jnp.unravel_index(jnp.argmax(obs[:, :, 0]),
                                         (self.SIZE, self.SIZE))
                       ).astype(jnp.int32)
    cols = jnp.argmax(obs[1:9, :, 1], axis=1).astype(jnp.int32)
    lanes = jnp.arange(1, 9)
    golds = obs[lanes, cols, 2] > 0.5
    return player, cols, golds

  def _reset_obs(self, key):
    k1, k2 = jax.random.split(key)
    cols = jax.random.randint(k1, (8,), 0, self.SIZE)
    golds = jax.random.bernoulli(k2, 0.5, (8,))
    player = jnp.asarray([self.SIZE // 2, self.SIZE // 2], jnp.int32)
    return self._pack(player, cols, golds)

  def reset(self, key: jax.Array) -> EnvState:
    key, sub = jax.random.split(key)
    return EnvState(obs=self._reset_obs(sub), done=jnp.asarray(False),
                    t=jnp.zeros((), jnp.int32), key=key)

  def step(self, state: EnvState, action: jnp.ndarray
           ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    player, cols, golds = self._unpack(state.obs)
    t = state.t + 1
    key, k_gold = jax.random.split(state.key)

    dr = jnp.where(action == 3, -1, 0) + jnp.where(action == 4, 1, 0)
    dc = jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0)
    player = jnp.clip(player + jnp.stack([dr, dc]), 0, self.SIZE - 1)

    dirs = jnp.where(jnp.arange(8) % 2 == 0, 1, -1)
    cols = (cols + dirs) % self.SIZE
    # Re-roll the type when an entity wraps around (a fresh spawn).
    wrapped = jnp.where(dirs > 0, cols == 0, cols == self.SIZE - 1)
    fresh = jax.random.bernoulli(k_gold, 0.5, (8,))
    golds = jnp.where(wrapped, fresh, golds)

    lanes = jnp.arange(1, 9)
    touching = (lanes == player[0]) & (cols == player[1])
    got_gold = jnp.any(touching & golds)
    hit_enemy = jnp.any(touching & ~golds)
    reward = got_gold.astype(jnp.float32)
    # Collected gold turns into an enemy-free respawn at the lane edge.
    cols = jnp.where(touching & golds,
                     jnp.where(dirs > 0, 0, self.SIZE - 1), cols)

    done = hit_enemy | (t >= self.max_steps)
    obs = self._pack(player, cols, golds)
    key, sub = jax.random.split(key)
    next_obs = jnp.where(done, self._reset_obs(sub), obs)
    next_t = jnp.where(done, 0, t)
    return (EnvState(obs=next_obs, done=done, t=next_t, key=key),
            reward, done)


class SpaceInvaders:
  """MinAtar-style Space Invaders: a descending alien block, one friendly
  bullet, one enemy bullet.

  Observation (10, 10, 4): 0=player cannon (bottom row), 1=aliens bitmap,
  2=friendly bullet (moving up), 3=enemy bullet (moving down); the alien
  march direction rides channel 2's corner cell (0,0) as a +-code (the
  Breakout direction-code trick; (0,0) is unreachable by the bullet, which
  despawns above row 1).  Actions: 0=noop, 1=left, 2=right, 3=fire.
  Reward +1 per alien destroyed; aliens reaching the bottom or an enemy
  bullet hitting the player ends the episode; a cleared wave respawns.
  """

  num_actions: int = 4
  obs_shape: Tuple[int, ...] = (10, 10, 4)
  max_steps: int = 1000
  SIZE = 10
  MARCH_EVERY = 4   # aliens advance every 4th step
  SHOOT_EVERY = 8   # enemy bullet respawns every 8th step when absent

  def _aliens_full(self):
    a = jnp.zeros((self.SIZE, self.SIZE), jnp.float32)
    return a.at[1:5, 2:8].set(1.0)

  def _pack(self, player_x, aliens, fb, eb, adir):
    obs = jnp.zeros(self.obs_shape, jnp.float32)
    obs = obs.at[self.SIZE - 1, player_x, 0].set(1.0)
    obs = obs.at[:, :, 1].set(aliens)
    # fb/eb are (row, col) with row < 0 meaning "absent".
    ch2 = jnp.zeros((self.SIZE, self.SIZE), jnp.float32)
    ch2 = jnp.where(fb[0] >= 0, ch2.at[fb[0], fb[1]].set(1.0), ch2)
    ch2 = ch2.at[0, 0].set(jnp.where(adir > 0, 0.25, 0.75))
    obs = obs.at[:, :, 2].set(ch2)
    ch3 = jnp.zeros((self.SIZE, self.SIZE), jnp.float32)
    ch3 = jnp.where(eb[0] >= 0, ch3.at[eb[0], eb[1]].set(1.0), ch3)
    return obs.at[:, :, 3].set(ch3)

  def _unpack(self, obs):
    player_x = jnp.argmax(obs[self.SIZE - 1, :, 0]).astype(jnp.int32)
    aliens = obs[:, :, 1]
    corner = obs[0, 0, 2]
    adir = jnp.where(corner < 0.5, 1, -1).astype(jnp.int32)
    ch2 = obs[:, :, 2].at[0, 0].set(0.0)
    has_fb = jnp.max(ch2) > 0.5
    fb = jnp.stack(jnp.unravel_index(jnp.argmax(ch2),
                                     (self.SIZE, self.SIZE))
                   ).astype(jnp.int32)
    fb = jnp.where(has_fb, fb, jnp.asarray([-1, 0], jnp.int32))
    has_eb = jnp.max(obs[:, :, 3]) > 0.5
    eb = jnp.stack(jnp.unravel_index(jnp.argmax(obs[:, :, 3]),
                                     (self.SIZE, self.SIZE))
                   ).astype(jnp.int32)
    eb = jnp.where(has_eb, eb, jnp.asarray([-1, 0], jnp.int32))
    return player_x, aliens, fb, eb, adir

  def _reset_obs(self, key):
    col = jax.random.randint(key, (), 0, self.SIZE)
    return self._pack(col, self._aliens_full(),
                      jnp.asarray([-1, 0], jnp.int32),
                      jnp.asarray([-1, 0], jnp.int32),
                      jnp.asarray(1, jnp.int32))

  def reset(self, key: jax.Array) -> EnvState:
    key, sub = jax.random.split(key)
    return EnvState(obs=self._reset_obs(sub), done=jnp.asarray(False),
                    t=jnp.zeros((), jnp.int32), key=key)

  def step(self, state: EnvState, action: jnp.ndarray
           ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray]:
    size = self.SIZE
    player_x, aliens, fb, eb, adir = self._unpack(state.obs)
    t = state.t + 1
    key, k_shoot = jax.random.split(state.key)

    player_x = jnp.clip(
        player_x + jnp.where(action == 2, 1, 0)
        - jnp.where(action == 1, 1, 0), 0, size - 1)

    # Fire: one friendly bullet at a time, spawned just above the cannon.
    can_fire = (action == 3) & (fb[0] < 0)
    fb = jnp.where(can_fire, jnp.stack([size - 2, player_x]), fb)

    # Friendly bullet moves up; despawns above row 1 (so (0,0) stays free
    # for the direction code).
    fb = jnp.where(fb[0] >= 0, fb - jnp.asarray([1, 0]), fb)
    fb = jnp.where(fb[0] < 1, jnp.asarray([-1, 0], jnp.int32), fb)
    # Hit check.
    fb_valid = fb[0] >= 0
    hit = fb_valid & (aliens[fb[0], fb[1]] > 0)
    reward = hit.astype(jnp.float32)
    aliens = jnp.where(hit, aliens.at[fb[0], fb[1]].set(0.0), aliens)
    fb = jnp.where(hit, jnp.asarray([-1, 0], jnp.int32), fb)

    # Alien march: shift every MARCH_EVERY steps; drop + reverse at walls.
    def march(args):
      a, d = args
      occupied = jnp.any(a, axis=0)
      at_left = occupied[0] & (d < 0)
      at_right = occupied[size - 1] & (d > 0)
      turn = at_left | at_right
      a2 = jnp.where(turn, jnp.roll(a, 1, axis=0), jnp.roll(a, d, axis=1))
      d2 = jnp.where(turn, -d, d)
      return a2, d2

    aliens, adir = jax.lax.cond(
        t % self.MARCH_EVERY == 0, march, lambda args: args, (aliens, adir))

    # Enemy bullet: spawns under the lowest alien in the player's nearest
    # occupied column every SHOOT_EVERY steps; moves down 1/step.
    eb = jnp.where(eb[0] >= 0, eb + jnp.asarray([1, 0]), eb)
    eb = jnp.where(eb[0] > size - 1, jnp.asarray([-1, 0], jnp.int32), eb)
    occupied_cols = jnp.any(aliens > 0, axis=0)
    dist = jnp.where(occupied_cols,
                     jnp.abs(jnp.arange(size) - player_x), size + 1)
    shoot_col = jnp.argmin(dist).astype(jnp.int32)
    lowest = (size - 1 - jnp.argmax(aliens[::-1, shoot_col]).astype(
        jnp.int32))
    spawn = (t % self.SHOOT_EVERY == 0) & (eb[0] < 0) & jnp.any(aliens > 0)
    eb = jnp.where(spawn, jnp.stack([lowest + 1, shoot_col]), eb)

    player_hit = (eb[0] == size - 1) & (eb[1] == player_x)
    aliens_landed = jnp.any(aliens[size - 1] > 0)
    # Cleared wave respawns.
    aliens = jnp.where(jnp.any(aliens > 0), aliens, self._aliens_full())

    done = player_hit | aliens_landed | (t >= self.max_steps)
    obs = self._pack(player_x, aliens, fb, eb, adir)
    key, sub = jax.random.split(key)
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

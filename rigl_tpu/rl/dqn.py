"""Sparse DQN — capability parity with rigl/rl/dqn_agents.py (SparseDQNAgent,
:309-494): modes {dense, prune, rigl, static, set, snip, dnw}, the mask
update wired into the optimizer step, and target-network syncs that copy
masks along with weights (:459-472).

TPU-native design: the environment, replay buffer, epsilon-greedy policy,
Q-learning update, and the sparse mask update all live in one jitted
``collect_and_learn`` program (lax.scan over env steps, lax.cond for the
learn/target-sync cadence) — the host only orchestrates chunk boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from rigl_tpu.rl import replay
from rigl_tpu.rl.envs import CartPole, EnvState
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.transforms import algorithms
from rigl_tpu.transforms.sparse_training import SparseState, SparseTraining


@dataclasses.dataclass
class DQNConfig:
  training_method: str = 'rigl'
  sparsity: float = 0.9
  mask_init_method: str = 'erdos_renyi_kernel'
  maskupdate_frequency: int = 500
  maskupdate_begin_step: int = 200
  maskupdate_end_step: int = -1
  drop_fraction: float = 0.3
  learning_rate: float = 1e-3
  gamma: float = 0.99
  buffer_capacity: int = 10000
  batch_size: int = 64
  learn_every: int = 4          # env steps between learn steps
  min_replay: int = 500
  target_update_period: int = 100   # in learn steps
  epsilon_start: float = 1.0
  epsilon_end: float = 0.05
  epsilon_decay_steps: int = 5000
  # L2 on the online network's weights, added to the TD loss
  # (dqn_agents.py:391-394; tfagents kernel_regularizer parity).
  weight_decay: float = 0.0
  seed: int = 0
  # Pre-masked parameter storage (transforms/sparse_training.py): skips
  # the apply_masks multiply in BOTH the per-env-step action selection and
  # the learn step.  Drop/grow family only.
  premask_params: bool = False


class DQNState(flax.struct.PyTreeNode):
  params: Any
  target_params: Any
  target_masks: Any
  opt_state: Any
  sparse: SparseState
  buffer: replay.ReplayBuffer
  env_state: EnvState
  key: jax.Array
  env_steps: jnp.ndarray
  # episode-return bookkeeping
  episode_return: jnp.ndarray
  completed_returns_sum: jnp.ndarray
  completed_episodes: jnp.ndarray


class SparseDQN:
  """DQN with dynamic sparse Q-networks."""

  def __init__(self, network, env: CartPole,
               config: Optional[DQNConfig] = None):
    self.net = network
    self.env = env
    self.config = config or DQNConfig()
    cfg = self.config
    from rigl_tpu.train.trainer import TrainConfig, build_algorithm
    algo_cfg = TrainConfig(
        training_method=cfg.training_method,
        sparsity=cfg.sparsity,
        maskupdate_begin_step=cfg.maskupdate_begin_step,
        maskupdate_end_step=cfg.maskupdate_end_step,
        maskupdate_frequency=cfg.maskupdate_frequency,
        drop_fraction=cfg.drop_fraction,
        drop_fraction_anneal='cosine'
        if cfg.maskupdate_end_step > 0 else 'constant',
    )
    self.algo = build_algorithm(algo_cfg)
    self.st = SparseTraining(
        optax.adam(cfg.learning_rate), self.algo,
        distribution=cfg.mask_init_method,
        default_sparsity=cfg.sparsity,
        seed=cfg.seed,
        premask_params=cfg.premask_params)

  # ------------------------------------------------------------------------
  def init(self, key: jax.Array) -> DQNState:
    cfg = self.config
    k_param, k_mask, k_env, k_run = jax.random.split(key, 4)
    obs0 = jnp.zeros((1,) + self.env.obs_shape)
    params = {'params': self.net.init(k_param, obs0)['params']}
    opt_state, sstate = self.st.init(k_mask, params)
    if cfg.premask_params:
      params = masks_lib.apply_masks(params, sstate.masks)
    return DQNState(
        params=params,
        # Distinct buffers: the jitted step donates its input state, and
        # aliased params/target_params would be donated twice.
        target_params=jax.tree.map(jnp.copy, params),
        target_masks=jax.tree.map(jnp.copy, sstate.masks),
        opt_state=opt_state,
        sparse=sstate,
        buffer=replay.create(cfg.buffer_capacity, self.env.obs_shape),
        env_state=self.env.reset(k_env),
        key=k_run,
        env_steps=jnp.zeros((), jnp.int32),
        episode_return=jnp.zeros(()),
        completed_returns_sum=jnp.zeros(()),
        completed_episodes=jnp.zeros((), jnp.int32),
    )

  def _q(self, params, masks, obs):
    eff = (params if self.config.premask_params
           else masks_lib.apply_masks(params, masks))
    return self.net.apply({'params': eff['params']}, obs)

  def _epsilon(self, env_steps):
    cfg = self.config
    frac = jnp.clip(env_steps / cfg.epsilon_decay_steps, 0.0, 1.0)
    return cfg.epsilon_start + frac * (cfg.epsilon_end - cfg.epsilon_start)

  def _loss(self, eff_params, target_params, target_masks, batch):
    cfg = self.config
    q = self.net.apply({'params': eff_params['params']}, batch['obs'])
    q_sa = jnp.take_along_axis(q, batch['action'][:, None], axis=1)[:, 0]
    q_next = self._q(target_params, target_masks, batch['next_obs'])
    target = batch['reward'] + cfg.gamma * (
        1.0 - batch['done'].astype(jnp.float32)) * jnp.max(q_next, axis=1)
    target = jax.lax.stop_gradient(target)
    loss = optax.huber_loss(q_sa, target).mean()
    if cfg.weight_decay:
      # tf.nn.l2_loss convention: sum(w^2)/2 per tensor
      # (dqn_agents.py:391-394).
      l2 = sum(jnp.sum(jnp.square(w)) / 2
               for w in jax.tree.leaves(eff_params))
      loss = loss + cfg.weight_decay * l2
    return loss

  # ------------------------------------------------------------------------
  def _env_step(self, carry, _):
    state = carry
    key, k_eps, k_act, k_sample = jax.random.split(state.key, 4)
    obs = state.env_state.obs
    q = self._q(state.params, state.sparse.masks, obs[None])[0]
    greedy = jnp.argmax(q).astype(jnp.int32)
    rand_a = jax.random.randint(k_act, (), 0, self.env.num_actions)
    eps = self._epsilon(state.env_steps)
    action = jnp.where(jax.random.uniform(k_eps) < eps, rand_a, greedy)
    next_env, reward, done = self.env.step(state.env_state, action)
    buf = replay.add(state.buffer, obs, action, reward, next_env.obs, done)
    ep_ret = state.episode_return + reward
    state = state.replace(
        env_state=next_env,
        buffer=buf,
        key=key,
        env_steps=state.env_steps + 1,
        episode_return=jnp.where(done, 0.0, ep_ret),
        completed_returns_sum=state.completed_returns_sum
        + jnp.where(done, ep_ret, 0.0),
        completed_episodes=state.completed_episodes + done.astype(jnp.int32),
    )
    return state, None

  def _learn(self, state: DQNState) -> DQNState:
    cfg = self.config
    key, k_sample = jax.random.split(state.key)
    batch = replay.sample(state.buffer, k_sample, cfg.batch_size)
    eff = (state.params if cfg.premask_params
           else masks_lib.apply_masks(state.params, state.sparse.masks))
    grads = jax.grad(self._loss)(eff, state.target_params,
                                 state.target_masks, batch)
    params, opt_state, sstate, _ = self.st.step(
        state.params, state.opt_state, state.sparse, grads)

    # Target sync every target_update_period learn steps — copies weights
    # AND masks (dqn_agents.py:459-472).
    do_sync = (sstate.step % cfg.target_update_period) == 0
    target_params = jax.tree.map(
        lambda t, o: jnp.where(do_sync, o, t), state.target_params, params)
    target_masks = jax.tree.map(
        lambda t, o: jnp.where(do_sync, o, t), state.target_masks,
        sstate.masks)
    return state.replace(params=params, opt_state=opt_state, sparse=sstate,
                         target_params=target_params,
                         target_masks=target_masks, key=key)

  def collect_and_learn(self, state: DQNState) -> Tuple[DQNState,
                                                        Dict[str, Any]]:
    """`learn_every` env steps + one (replay-gated) learn step; jittable."""
    cfg = self.config
    state, _ = jax.lax.scan(self._env_step, state, None,
                            length=cfg.learn_every)
    state = jax.lax.cond(state.buffer.size >= cfg.min_replay, self._learn,
                         lambda s: s, state)
    metrics = {
        'env_steps': state.env_steps,
        'learn_steps': state.sparse.step,
        'avg_return': state.completed_returns_sum
        / jnp.maximum(state.completed_episodes, 1),
        'episodes': state.completed_episodes,
    }
    return state, metrics

  # ------------------------------------------------------------------------
  def train(self, total_env_steps: int, log_every: int = 1000,
            progress_fn=None) -> Dict[str, Any]:
    state = self.init(jax.random.key(self.config.seed))
    step_fn = jax.jit(self.collect_and_learn, donate_argnums=0)
    metrics = {}
    n_chunks = total_env_steps // self.config.learn_every
    for i in range(n_chunks):
      state, metrics = step_fn(state)
      if progress_fn and log_every and (
          (i + 1) % max(log_every // self.config.learn_every, 1) == 0):
        progress_fn({k: float(v) for k, v in metrics.items()})
    self.state = state
    result = {k: float(v) for k, v in metrics.items()}
    if state.sparse.masks:
      result['global_sparsity'] = float(
          masks_lib.calculate_sparsity(state.sparse.masks))
    return result

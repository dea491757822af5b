"""Sparse SAC — capability parity with rigl/rl/tfagents/sac_train_eval.py:
sparse actor and twin-critic networks (the tf-agents wrappers become the
functional mask overlay), mask updaters inside the train step
(sac_train_eval.py:378-421), soft target updates, tanh-squashed Gaussian
policy with learned temperature.

Same TPU-native shape as the DQN/PPO agents: pure-JAX env, device-resident
replay, collect+learn in one jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from rigl_tpu.rl import replay
from rigl_tpu.rl.envs import EnvState, Pendulum
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.transforms.sparse_training import SparseState, SparseTraining

LOG_STD_MIN, LOG_STD_MAX = -10.0, 2.0


class GaussianActor(nn.Module):
  action_dim: int
  max_action: float
  hidden: Tuple[int, ...] = (64, 64)

  @nn.compact
  def __call__(self, x, train: bool = False):
    for i, h in enumerate(self.hidden):
      x = nn.relu(nn.Dense(h, name=f'dense{i + 1}')(x))
    mean = nn.Dense(self.action_dim, name='mean')(x)
    log_std = jnp.clip(nn.Dense(self.action_dim, name='log_std')(x),
                       LOG_STD_MIN, LOG_STD_MAX)
    return mean, log_std

  def sample(self, variables, obs, key):
    mean, log_std = self.apply(variables, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    pre_tanh = mean + std * eps
    action = jnp.tanh(pre_tanh)
    # log-prob with tanh correction.
    logp = (-0.5 * (eps ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))).sum(-1)
    logp -= jnp.log(1 - action ** 2 + 1e-6).sum(-1)
    return action * self.max_action, logp


class TwinCritic(nn.Module):
  hidden: Tuple[int, ...] = (64, 64)

  @nn.compact
  def __call__(self, obs, action, train: bool = False):
    x = jnp.concatenate([obs, action], axis=-1)
    qs = []
    for head in ('q1', 'q2'):
      h = x
      for i, w in enumerate(self.hidden):
        h = nn.relu(nn.Dense(w, name=f'{head}_dense{i + 1}')(h))
      qs.append(nn.Dense(1, name=f'{head}_out')(h)[:, 0])
    return qs[0], qs[1]


@dataclasses.dataclass
class SACConfig:
  training_method: str = 'rigl'
  sparsity: float = 0.8
  mask_init_method: str = 'erdos_renyi_kernel'
  maskupdate_frequency: int = 500
  maskupdate_begin_step: int = 200
  maskupdate_end_step: int = -1
  drop_fraction: float = 0.3
  learning_rate: float = 3e-4
  gamma: float = 0.99
  tau: float = 0.005            # soft target update rate
  buffer_capacity: int = 20000
  batch_size: int = 128
  learn_every: int = 1
  min_replay: int = 500
  target_entropy_scale: float = 1.0  # target entropy = -scale * action_dim
  # L2 on actor/critic weights, added to their losses (tfagents
  # sac_train_eval.py train_eval.weight_decay parity).
  weight_decay: float = 0.0
  seed: int = 0
  # Pre-masked parameter storage for the ONLINE actor/critic
  # (transforms/sparse_training.py).  The polyak-blended target critic
  # always keeps its mask multiply: blended weights at recently-dropped
  # positions are nonzero until the mask removes them.
  premask_params: bool = False


class SACState(flax.struct.PyTreeNode):
  actor_params: Any
  critic_params: Any
  target_critic_params: Any
  target_critic_masks: Any
  log_alpha: jnp.ndarray
  actor_opt: Any
  critic_opt: Any
  alpha_opt: Any
  actor_sparse: SparseState
  critic_sparse: SparseState
  buffer: replay.ReplayBuffer
  env_state: EnvState
  key: jax.Array
  env_steps: jnp.ndarray
  episode_return: jnp.ndarray
  completed_returns_sum: jnp.ndarray
  completed_episodes: jnp.ndarray


class SparseSAC:
  """Soft actor-critic with dynamic sparse actor/critic networks.

  Per the reference, actor and critic each get their own mask updater
  (sac_train_eval.py:309-313); here: two SparseTraining instances.
  """

  def __init__(self, env: Pendulum, config: Optional[SACConfig] = None,
               hidden: Tuple[int, ...] = (64, 64)):
    self.env = env
    self.config = config or SACConfig()
    cfg = self.config
    self.actor = GaussianActor(env.action_dim, env.max_action, hidden)
    self.critic = TwinCritic(hidden)
    from rigl_tpu.train.trainer import TrainConfig, build_algorithm
    algo_cfg = TrainConfig(
        training_method=cfg.training_method, sparsity=cfg.sparsity,
        maskupdate_begin_step=cfg.maskupdate_begin_step,
        maskupdate_end_step=cfg.maskupdate_end_step,
        maskupdate_frequency=cfg.maskupdate_frequency,
        drop_fraction=cfg.drop_fraction, drop_fraction_anneal='constant')
    self.actor_st = SparseTraining(
        optax.adam(cfg.learning_rate), build_algorithm(algo_cfg),
        distribution=cfg.mask_init_method, default_sparsity=cfg.sparsity,
        seed=cfg.seed, premask_params=cfg.premask_params)
    self.critic_st = SparseTraining(
        optax.adam(cfg.learning_rate), build_algorithm(algo_cfg),
        distribution=cfg.mask_init_method, default_sparsity=cfg.sparsity,
        seed=cfg.seed + 1, premask_params=cfg.premask_params)
    self.alpha_tx = optax.adam(cfg.learning_rate)
    self.target_entropy = -cfg.target_entropy_scale * env.action_dim

  def init(self, key: jax.Array) -> SACState:
    cfg = self.config
    ka, kc, kma, kmc, kenv, krun = jax.random.split(key, 6)
    obs0 = jnp.zeros((1,) + self.env.obs_shape)
    act0 = jnp.zeros((1, self.env.action_dim))
    actor_params = {'params': self.actor.init(ka, obs0)['params']}
    critic_params = {'params': self.critic.init(kc, obs0, act0)['params']}
    actor_opt, actor_sparse = self.actor_st.init(kma, actor_params)
    critic_opt, critic_sparse = self.critic_st.init(kmc, critic_params)
    if cfg.premask_params:
      actor_params = masks_lib.apply_masks(actor_params, actor_sparse.masks)
      critic_params = masks_lib.apply_masks(critic_params,
                                            critic_sparse.masks)
    log_alpha = jnp.zeros(())
    return SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        target_critic_masks=jax.tree.map(jnp.copy, critic_sparse.masks),
        log_alpha=log_alpha,
        actor_opt=actor_opt, critic_opt=critic_opt,
        alpha_opt=self.alpha_tx.init(log_alpha),
        actor_sparse=actor_sparse, critic_sparse=critic_sparse,
        buffer=replay.create(cfg.buffer_capacity, self.env.obs_shape,
                             action_shape=(self.env.action_dim,)),
        env_state=self.env.reset(kenv), key=krun,
        env_steps=jnp.zeros((), jnp.int32),
        episode_return=jnp.zeros(()),
        completed_returns_sum=jnp.zeros(()),
        completed_episodes=jnp.zeros((), jnp.int32))

  def _actor_vars(self, params, masks, online: bool = True):
    if online and self.config.premask_params:
      return {'params': params['params']}
    eff = masks_lib.apply_masks(params, masks)
    return {'params': eff['params']}

  # ------------------------------------------------------------------------
  def _env_step(self, state: SACState, _):
    key, k_act = jax.random.split(state.key)
    obs = state.env_state.obs
    action, _ = self.actor.sample(
        self._actor_vars(state.actor_params, state.actor_sparse.masks),
        obs[None], k_act)
    action = action[0]
    next_env, reward, done = self.env.step(state.env_state, action)
    buf = replay.add(state.buffer, obs, action, reward, next_env.obs, done)
    ep_ret = state.episode_return + reward
    state = state.replace(
        env_state=next_env, buffer=buf, key=key,
        env_steps=state.env_steps + 1,
        episode_return=jnp.where(done, 0.0, ep_ret),
        completed_returns_sum=state.completed_returns_sum
        + jnp.where(done, ep_ret, 0.0),
        completed_episodes=state.completed_episodes + done.astype(jnp.int32))
    return state, None

  def _learn(self, state: SACState) -> SACState:
    cfg = self.config
    key, k_samp, k_next, k_pi = jax.random.split(state.key, 4)
    batch = replay.sample(state.buffer, k_samp, cfg.batch_size)
    alpha = jnp.exp(state.log_alpha)

    # Critic update: soft Bellman target from target critic.
    next_a, next_logp = self.actor.sample(
        self._actor_vars(state.actor_params, state.actor_sparse.masks),
        batch['next_obs'], k_next)
    tq1, tq2 = self.critic.apply(
        self._actor_vars(state.target_critic_params,
                         state.target_critic_masks, online=False),
        batch['next_obs'], next_a)
    target_q = batch['reward'] + cfg.gamma * (
        1.0 - batch['done'].astype(jnp.float32)) * (
            jnp.minimum(tq1, tq2) - alpha * next_logp)
    target_q = jax.lax.stop_gradient(target_q)

    def critic_loss(eff):
      q1, q2 = self.critic.apply({'params': eff['params']}, batch['obs'],
                                 batch['action'])
      loss = ((q1 - target_q) ** 2 + (q2 - target_q) ** 2).mean()
      if cfg.weight_decay:
        loss = loss + cfg.weight_decay * sum(
            jnp.sum(jnp.square(w)) / 2 for w in jax.tree.leaves(eff))
      return loss

    eff_c = (state.critic_params if cfg.premask_params
             else masks_lib.apply_masks(state.critic_params,
                                        state.critic_sparse.masks))
    c_grads = jax.grad(critic_loss)(eff_c)
    critic_params, critic_opt, critic_sparse, _ = self.critic_st.step(
        state.critic_params, state.critic_opt, state.critic_sparse, c_grads)

    # Actor update.
    def actor_loss(eff):
      a, logp = self.actor.sample({'params': eff['params']}, batch['obs'],
                                  k_pi)
      q1, q2 = self.critic.apply(
          self._actor_vars(critic_params, critic_sparse.masks),
          batch['obs'], a)
      loss = (alpha * logp - jnp.minimum(q1, q2)).mean()
      if cfg.weight_decay:
        loss = loss + cfg.weight_decay * sum(
            jnp.sum(jnp.square(w)) / 2 for w in jax.tree.leaves(eff))
      return loss, logp

    eff_a = (state.actor_params if cfg.premask_params
             else masks_lib.apply_masks(state.actor_params,
                                        state.actor_sparse.masks))
    a_grads, logp = jax.grad(lambda e: actor_loss(e), has_aux=True)(eff_a)
    actor_params, actor_opt, actor_sparse, _ = self.actor_st.step(
        state.actor_params, state.actor_opt, state.actor_sparse, a_grads)

    # Temperature update toward the entropy target.
    def alpha_loss(log_alpha):
      return (-jnp.exp(log_alpha)
              * jax.lax.stop_gradient(logp + self.target_entropy)).mean()

    al_grad = jax.grad(alpha_loss)(state.log_alpha)
    al_updates, alpha_opt = self.alpha_tx.update(al_grad, state.alpha_opt)
    log_alpha = optax.apply_updates(state.log_alpha, al_updates)

    # Soft (polyak) target update; masks copied with weights, as in the
    # reference's target sync (dqn_agents.py:459-472 convention).
    tau = cfg.tau
    target_critic_params = jax.tree.map(
        lambda t, o: (1 - tau) * t + tau * o,
        state.target_critic_params, critic_params)
    target_critic_masks = critic_sparse.masks

    return state.replace(
        actor_params=actor_params, critic_params=critic_params,
        target_critic_params=target_critic_params,
        target_critic_masks=target_critic_masks,
        log_alpha=log_alpha, actor_opt=actor_opt, critic_opt=critic_opt,
        alpha_opt=alpha_opt, actor_sparse=actor_sparse,
        critic_sparse=critic_sparse, key=key)

  def collect_and_learn(self, state: SACState
                        ) -> Tuple[SACState, Dict[str, Any]]:
    cfg = self.config
    state, _ = jax.lax.scan(self._env_step, state, None,
                            length=cfg.learn_every)
    state = jax.lax.cond(state.buffer.size >= cfg.min_replay, self._learn,
                         lambda s: s, state)
    metrics = {
        'env_steps': state.env_steps,
        'learn_steps': state.critic_sparse.step,
        'avg_return': state.completed_returns_sum
        / jnp.maximum(state.completed_episodes, 1),
        'episodes': state.completed_episodes,
        'alpha': jnp.exp(state.log_alpha),
    }
    return state, metrics

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
    if state.critic_sparse.masks:
      result['global_sparsity'] = float(masks_lib.calculate_sparsity(
          {**state.critic_sparse.masks,
           **{f'a/{k}': v for k, v in state.actor_sparse.masks.items()}}))
    return result

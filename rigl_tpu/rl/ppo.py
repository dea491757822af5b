"""Sparse PPO — capability parity with rigl/rl/tfagents/ppo_train_eval.py:
sparse actor/value networks (wrap_all_layers), mask updaters driven inside
the train step (ppo_train_eval.py:289-330), clipped-surrogate PPO with GAE.

TPU-native shape: rollout (lax.scan over the pure-JAX env), GAE (reverse
scan), and the K-epoch minibatch update (nested scans) all compile into one
XLA program per iteration; sparse mask updates ride the same SparseTraining
state machine as supervised training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from rigl_tpu.rl.envs import CartPole, EnvState
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.transforms.sparse_training import SparseState, SparseTraining


class ActorCritic(nn.Module):
  """Separate policy/value MLP towers (tf-agents actor + value networks)."""
  num_actions: int
  hidden: Tuple[int, ...] = (64, 64)

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = x.reshape((x.shape[0], -1))
    a = x
    for i, h in enumerate(self.hidden):
      a = jnp.tanh(nn.Dense(h, name=f'actor{i + 1}')(a))
    logits = nn.Dense(self.num_actions, name='actor_head')(a)
    v = x
    for i, h in enumerate(self.hidden):
      v = jnp.tanh(nn.Dense(h, name=f'value{i + 1}')(v))
    value = nn.Dense(1, name='value_head')(v)[:, 0]
    return logits, value


@dataclasses.dataclass
class PPOConfig:
  training_method: str = 'rigl'
  sparsity: float = 0.8
  mask_init_method: str = 'erdos_renyi_kernel'
  maskupdate_frequency: int = 20      # in PPO update steps
  maskupdate_begin_step: int = 10
  maskupdate_end_step: int = -1
  drop_fraction: float = 0.3
  learning_rate: float = 3e-4
  rollout_length: int = 256
  num_epochs: int = 4
  num_minibatches: int = 4
  gamma: float = 0.99
  gae_lambda: float = 0.95
  clip_eps: float = 0.2
  value_coef: float = 0.5
  entropy_coef: float = 0.01
  # L2 on actor/critic weights, added to the clipped objective
  # (tfagents ppo_train_eval.py weight_decay / kernel_regularizer parity).
  weight_decay: float = 0.0
  seed: int = 0
  # Pre-masked parameter storage (transforms/sparse_training.py): skips
  # the apply_masks multiply in rollout forwards and minibatch steps.
  premask_params: bool = False


class PPOTrainState(flax.struct.PyTreeNode):
  params: Any
  opt_state: Any
  sparse: SparseState
  env_state: EnvState
  key: jax.Array
  env_steps: jnp.ndarray
  episode_return: jnp.ndarray
  completed_returns_sum: jnp.ndarray
  completed_episodes: jnp.ndarray


class SparsePPO:
  def __init__(self, env: CartPole, config: Optional[PPOConfig] = None,
               hidden: Tuple[int, ...] = (64, 64)):
    self.env = env
    self.config = config or PPOConfig()
    cfg = self.config
    self.net = ActorCritic(env.num_actions, hidden)
    from rigl_tpu.train.trainer import TrainConfig, build_algorithm
    self.algo = build_algorithm(TrainConfig(
        training_method=cfg.training_method,
        sparsity=cfg.sparsity,
        maskupdate_begin_step=cfg.maskupdate_begin_step,
        maskupdate_end_step=cfg.maskupdate_end_step,
        maskupdate_frequency=cfg.maskupdate_frequency,
        drop_fraction=cfg.drop_fraction,
        drop_fraction_anneal='constant',
    ))
    self.st = SparseTraining(
        optax.adam(cfg.learning_rate), self.algo,
        distribution=cfg.mask_init_method, default_sparsity=cfg.sparsity,
        seed=cfg.seed,
        premask_params=cfg.premask_params)

  def init(self, key: jax.Array) -> PPOTrainState:
    cfg = self.config
    k_param, k_mask, k_env, k_run = jax.random.split(key, 4)
    obs0 = jnp.zeros((1,) + self.env.obs_shape)
    params = {'params': self.net.init(k_param, obs0)['params']}
    opt_state, sstate = self.st.init(k_mask, params)
    if cfg.premask_params:
      params = masks_lib.apply_masks(params, sstate.masks)
    return PPOTrainState(
        params=params, opt_state=opt_state, sparse=sstate,
        env_state=self.env.reset(k_env), key=k_run,
        env_steps=jnp.zeros((), jnp.int32),
        episode_return=jnp.zeros(()),
        completed_returns_sum=jnp.zeros(()),
        completed_episodes=jnp.zeros((), jnp.int32))

  def _forward(self, params, masks, obs):
    eff = (params if self.config.premask_params
           else masks_lib.apply_masks(params, masks))
    return self.net.apply({'params': eff['params']}, obs)

  # ---------------------------------------------------------------- rollout
  def _rollout(self, state: PPOTrainState):
    cfg = self.config

    def step(carry, _):
      st = carry
      key, k_act = jax.random.split(st.key)
      obs = st.env_state.obs
      logits, value = self._forward(st.params, st.sparse.masks, obs[None])
      logits, value = logits[0], value[0]
      action = jax.random.categorical(k_act, logits)
      logp = jax.nn.log_softmax(logits)[action]
      next_env, reward, done = self.env.step(st.env_state, action)
      ep_ret = st.episode_return + reward
      st = st.replace(
          env_state=next_env, key=key, env_steps=st.env_steps + 1,
          episode_return=jnp.where(done, 0.0, ep_ret),
          completed_returns_sum=st.completed_returns_sum
          + jnp.where(done, ep_ret, 0.0),
          completed_episodes=st.completed_episodes + done.astype(jnp.int32))
      traj = {'obs': obs, 'action': action, 'logp': logp, 'value': value,
              'reward': reward, 'done': done}
      return st, traj

    state, traj = jax.lax.scan(step, state, None, length=cfg.rollout_length)
    _, last_value = self._forward(state.params, state.sparse.masks,
                                  state.env_state.obs[None])
    return state, traj, last_value[0]

  def _gae(self, traj, last_value):
    cfg = self.config

    def back(carry, t):
      gae, next_value = carry
      nonterminal = 1.0 - t['done'].astype(jnp.float32)
      delta = t['reward'] + cfg.gamma * next_value * nonterminal - t['value']
      gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
      return (gae, t['value']), gae

    (_, _), advantages = jax.lax.scan(back, (jnp.zeros(()), last_value),
                                      traj, reverse=True)
    returns = advantages + traj['value']
    return advantages, returns

  # ----------------------------------------------------------------- update
  def _loss(self, eff_params, batch):
    cfg = self.config
    logits, value = self.net.apply({'params': eff_params['params']},
                                   batch['obs'])
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, batch['action'][:, None], 1)[:, 0]
    ratio = jnp.exp(logp - batch['logp'])
    adv = batch['adv']
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv).mean()
    v_loss = jnp.mean((value - batch['ret']) ** 2)
    entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1).mean()
    loss = pg + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
    if cfg.weight_decay:
      loss = loss + cfg.weight_decay * sum(
          jnp.sum(jnp.square(w)) / 2 for w in jax.tree.leaves(eff_params))
    return loss

  def train_iteration(self, state: PPOTrainState
                      ) -> Tuple[PPOTrainState, Dict[str, Any]]:
    cfg = self.config
    state, traj, last_value = self._rollout(state)
    adv, ret = self._gae(traj, last_value)
    data = {'obs': traj['obs'], 'action': traj['action'],
            'logp': traj['logp'], 'adv': adv, 'ret': ret}
    n = cfg.rollout_length
    mb = n // cfg.num_minibatches

    def epoch(carry, _):
      params, opt_state, sstate, key = carry
      key, k_perm = jax.random.split(key)
      perm = jax.random.permutation(k_perm, n)

      def minibatch(carry, idx):
        params, opt_state, sstate = carry
        batch = jax.tree.map(lambda x: x[idx], data)
        eff = (params if cfg.premask_params
               else masks_lib.apply_masks(params, sstate.masks))
        grads = jax.grad(self._loss)(eff, batch)
        params, opt_state, sstate, _ = self.st.step(params, opt_state,
                                                    sstate, grads)
        return (params, opt_state, sstate), None

      (params, opt_state, sstate), _ = jax.lax.scan(
          minibatch, (params, opt_state, sstate),
          perm.reshape(cfg.num_minibatches, mb))
      return (params, opt_state, sstate, key), None

    (params, opt_state, sstate, key), _ = jax.lax.scan(
        epoch, (state.params, state.opt_state, state.sparse, state.key),
        None, length=cfg.num_epochs)
    state = state.replace(params=params, opt_state=opt_state, sparse=sstate,
                          key=key)
    metrics = {
        'env_steps': state.env_steps,
        'update_steps': sstate.step,
        'avg_return': state.completed_returns_sum
        / jnp.maximum(state.completed_episodes, 1),
        'episodes': state.completed_episodes,
    }
    return state, metrics

  def train(self, total_env_steps: int, progress_fn=None) -> Dict[str, Any]:
    state = self.init(jax.random.key(self.config.seed))
    it = jax.jit(self.train_iteration, donate_argnums=0)
    n_iters = total_env_steps // self.config.rollout_length
    metrics = {}
    for i in range(n_iters):
      state, metrics = it(state)
      if progress_fn:
        progress_fn({k: float(v) for k, v in metrics.items()})
    self.state = state
    result = {k: float(v) for k, v in metrics.items()}
    if state.sparse.masks:
      result['global_sparsity'] = float(
          masks_lib.calculate_sparsity(state.sparse.masks))
    return result

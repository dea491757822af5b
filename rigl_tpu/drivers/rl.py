"""Sparse RL driver — parity with rigl/rl/train.py and the tfagents
entry points: DQN, PPO, or SAC with any sparse training method, on the
pure-JAX envs (CartPole for MLP nets, MinAtar-style Breakout for the conv
Nature-DQN/Impala nets, Pendulum for SAC's continuous control, matching
the reference's network zoo rl/dqn_agents.py:103-306 and
rl/tfagents/sac_train_eval.py).

Presets in configs/rl_*.json mirror the reference's 19 gin files
(rl/sparsetrain_configs/*.gin + rl/tfagents/configs/*.gin) with the env
substitutions documented in each file's "_substitutions" key.

  python -m rigl_tpu.drivers.rl --config=configs/rl_dqn_atari_rigl.json
  python -m rigl_tpu.drivers.rl --agent=dqn --training_method=rigl \
      --end_sparsity=0.9 --total_env_steps=20000
  python -m rigl_tpu.drivers.rl --agent=sac --env=pendulum \
      --training_method=rigl --end_sparsity=0.8
"""

from __future__ import annotations

import json

from absl import app, flags

from rigl_tpu.drivers.common import safe_flags

FLAGS = flags.FLAGS
safe_flags.DEFINE_string('config', None,
                    'path to an rl_*.json preset (configs/); keys mirror '
                    'these flags, plus "agent_kwargs" passed through to the '
                    'agent config dataclass.  Keys starting with "_" are '
                    'documentation.  Explicit CLI flags override the preset.')
safe_flags.DEFINE_string('agent', 'dqn', 'dqn | ppo | sac')
safe_flags.DEFINE_string('env', 'cartpole',
                    'cartpole | breakout | freeway | asterix | '
                    'space_invaders | pendulum')
safe_flags.DEFINE_string('network', 'auto',
                    'auto | mlp | nature | impala (conv nets need an '
                    'image env, i.e. breakout)')
safe_flags.DEFINE_float('width', 1.0, 'network width multiplier '
                   '(dqn_agents.py:211-306)')
safe_flags.DEFINE_string('training_method', 'rigl',
                    'rigl|set|static|momentum|prune|snip|dnw|none')
safe_flags.DEFINE_float('end_sparsity', 0.9, '')
safe_flags.DEFINE_string('mask_init_method', 'erdos_renyi_kernel', '')
safe_flags.DEFINE_integer('total_env_steps', 20000, '')
safe_flags.DEFINE_integer('maskupdate_frequency', 500, 'in learn steps')
safe_flags.DEFINE_integer('maskupdate_begin_step', 200, '')
safe_flags.DEFINE_integer('maskupdate_end_step', -1, 'in learn steps; -1 forever')
safe_flags.DEFINE_float('drop_fraction', 0.3, '')
safe_flags.DEFINE_float('learning_rate', 1e-3, '')
safe_flags.DEFINE_float('weight_decay', 0.0, 'L2 added to the loss '
                   '(dqn_agents.py:391-394)')
safe_flags.DEFINE_integer('seed', 0, '')
safe_flags.DEFINE_integer('log_every', 1000, '')
safe_flags.DEFINE_string('output_dir', None, '')

# Driver option keys a preset may set (everything in run()'s signature).
_OPTION_KEYS = ('agent', 'env', 'network', 'width', 'training_method',
                'end_sparsity', 'mask_init_method', 'total_env_steps',
                'maskupdate_frequency', 'maskupdate_begin_step',
                'maskupdate_end_step', 'drop_fraction', 'learning_rate',
                'weight_decay', 'seed', 'log_every')


def load_preset(path: str):
  """Reads an rl_*.json preset -> (driver options, agent kwargs)."""
  with open(path) as f:
    raw = {k: v for k, v in json.load(f).items() if not k.startswith('_')}
  agent_kwargs = raw.pop('agent_kwargs', {})
  unknown = set(raw) - set(_OPTION_KEYS)
  if unknown:
    raise ValueError(f'unknown preset keys {sorted(unknown)} in {path}')
  return raw, agent_kwargs


def run(agent='dqn', env='cartpole', network='auto', width=1.0,
        training_method='rigl', end_sparsity=0.9,
        mask_init_method='erdos_renyi_kernel', total_env_steps=20000,
        maskupdate_frequency=500, maskupdate_begin_step=200,
        maskupdate_end_step=-1, drop_fraction=0.3, learning_rate=1e-3,
        weight_decay=0.0, seed=0, log_every=1000, agent_kwargs=None,
        progress_fn=print):
  """Builds the requested agent and trains it; returns the result dict."""
  from rigl_tpu.rl import CartPole, MLPQNetwork
  from rigl_tpu.rl.envs import (Asterix, Breakout, Freeway, Pendulum,
                                SpaceInvaders)
  from rigl_tpu.rl.networks import ImpalaNet, NatureDQN
  env_obj = {'cartpole': CartPole, 'breakout': Breakout,
             'freeway': Freeway, 'asterix': Asterix,
             'space_invaders': SpaceInvaders, 'pendulum': Pendulum}[env]()
  method = 'none' if training_method in ('none', 'dense') else training_method

  common = dict(
      training_method=method,
      sparsity=end_sparsity,
      mask_init_method=mask_init_method,
      maskupdate_frequency=maskupdate_frequency,
      maskupdate_begin_step=maskupdate_begin_step,
      maskupdate_end_step=maskupdate_end_step,
      drop_fraction=drop_fraction,
      learning_rate=learning_rate,
      weight_decay=weight_decay,
      seed=seed)
  common.update(agent_kwargs or {})

  if agent == 'sac':
    # SAC builds its own actor/twin-critic towers (rl/sac.py, mirroring the
    # tfagents sac_train_eval.py wiring); continuous control only.
    from rigl_tpu.rl.sac import SACConfig, SparseSAC
    if env != 'pendulum':
      raise ValueError('SAC needs a continuous-action env (pendulum)')
    sac_agent = SparseSAC(env_obj, SACConfig(**common))
    return sac_agent.train(total_env_steps, log_every=log_every,
                           progress_fn=progress_fn)

  net_kind = network
  if net_kind == 'auto':
    image_envs = ('breakout', 'freeway', 'asterix', 'space_invaders')
    net_kind = 'nature' if env in image_envs and agent == 'dqn' else 'mlp'
  if agent == 'ppo' and net_kind != 'mlp':
    raise ValueError('PPO uses the MLP actor-critic towers '
                     '(rl/ppo.py); conv networks are DQN-only')
  if net_kind == 'mlp':
    net = MLPQNetwork(env_obj.num_actions)
  elif net_kind == 'nature':
    net = NatureDQN(num_actions=env_obj.num_actions, width=width)
  elif net_kind == 'impala':
    net = ImpalaNet(num_actions=env_obj.num_actions, width=width)
  else:
    raise ValueError(f'unknown network {net_kind!r}')

  if agent == 'dqn':
    from rigl_tpu.rl import DQNConfig, SparseDQN
    dqn_agent = SparseDQN(net, env_obj, DQNConfig(**common))
    return dqn_agent.train(total_env_steps, log_every=log_every,
                           progress_fn=progress_fn)
  if agent == 'ppo':
    from rigl_tpu.rl.ppo import PPOConfig, SparsePPO
    ppo_agent = SparsePPO(env_obj, PPOConfig(**common))
    return ppo_agent.train(total_env_steps, progress_fn=progress_fn)
  raise ValueError(f'unknown agent {agent!r}')


def main(argv):
  del argv
  agent_kwargs = {}
  if FLAGS.config:
    preset, agent_kwargs = load_preset(FLAGS.config)
    for key, value in preset.items():
      if FLAGS[key].using_default_value:
        setattr(FLAGS, key, value)

  opts = {k: getattr(FLAGS, k) for k in _OPTION_KEYS}
  result = run(agent_kwargs=agent_kwargs, **opts)

  print(json.dumps(result, indent=2))
  if FLAGS.output_dir:
    import os
    os.makedirs(FLAGS.output_dir, exist_ok=True)
    with open(os.path.join(FLAGS.output_dir, 'results.json'), 'w') as f:
      json.dump(result, f, indent=2)
  return result


if __name__ == '__main__':
  app.run(main)

"""Sparse RL driver — parity with rigl/rl/train.py and the tfagents
entry points: DQN, PPO, or SAC with any sparse training method, on the
pure-JAX envs (CartPole for MLP nets, MinAtar-style Breakout for the conv
Nature-DQN/Impala nets, Pendulum for SAC's continuous control, matching
the reference's network zoo rl/dqn_agents.py:103-306 and
rl/tfagents/sac_train_eval.py).

  python -m rigl_tpu.drivers.rl --agent=dqn --training_method=rigl \
      --end_sparsity=0.9 --total_env_steps=20000
  python -m rigl_tpu.drivers.rl --agent=dqn --env=breakout \
      --network=nature --width=0.5 --training_method=set
  python -m rigl_tpu.drivers.rl --agent=sac --env=pendulum \
      --training_method=rigl --end_sparsity=0.8
"""

from __future__ import annotations

import json

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string('agent', 'dqn', 'dqn | ppo | sac')
flags.DEFINE_string('env', 'cartpole', 'cartpole | breakout | pendulum')
flags.DEFINE_string('network', 'auto',
                    'auto | mlp | nature | impala (conv nets need an '
                    'image env, i.e. breakout)')
flags.DEFINE_float('width', 1.0, 'network width multiplier '
                   '(dqn_agents.py:211-306)')
flags.DEFINE_string('training_method', 'rigl',
                    'rigl|set|static|momentum|snip|dnw|none')
flags.DEFINE_float('end_sparsity', 0.9, '')
flags.DEFINE_string('mask_init_method', 'erdos_renyi_kernel', '')
flags.DEFINE_integer('total_env_steps', 20000, '')
flags.DEFINE_integer('maskupdate_frequency', 500, 'in learn steps')
flags.DEFINE_integer('maskupdate_begin_step', 200, '')
flags.DEFINE_float('drop_fraction', 0.3, '')
flags.DEFINE_float('learning_rate', 1e-3, '')
flags.DEFINE_integer('seed', 0, '')
flags.DEFINE_integer('log_every', 1000, '')
flags.DEFINE_string('output_dir', None, '')


def main(argv):
  del argv
  from rigl_tpu.rl import CartPole, MLPQNetwork
  from rigl_tpu.rl.envs import Breakout, Pendulum
  from rigl_tpu.rl.networks import ImpalaNet, NatureDQN
  env = {'cartpole': CartPole, 'breakout': Breakout,
         'pendulum': Pendulum}[FLAGS.env]()
  method = FLAGS.training_method
  if method in ('none', 'dense'):
    method = 'none'

  if FLAGS.agent == 'sac':
    # SAC builds its own actor/twin-critic towers (rl/sac.py, mirroring the
    # tfagents sac_train_eval.py wiring); continuous control only.
    from rigl_tpu.rl.sac import SACConfig, SparseSAC
    if FLAGS.env != 'pendulum':
      raise ValueError('SAC needs a continuous-action env (pendulum)')
    cfg = SACConfig(
        training_method=method,
        sparsity=FLAGS.end_sparsity,
        mask_init_method=FLAGS.mask_init_method,
        maskupdate_frequency=FLAGS.maskupdate_frequency,
        maskupdate_begin_step=FLAGS.maskupdate_begin_step,
        drop_fraction=FLAGS.drop_fraction,
        learning_rate=FLAGS.learning_rate,
        seed=FLAGS.seed)
    agent = SparseSAC(env, cfg)
    result = agent.train(FLAGS.total_env_steps, log_every=FLAGS.log_every,
                         progress_fn=print)
    return _emit(result)

  net_kind = FLAGS.network
  if net_kind == 'auto':
    net_kind = ('nature' if FLAGS.env == 'breakout'
                and FLAGS.agent == 'dqn' else 'mlp')
  if FLAGS.agent == 'ppo' and net_kind != 'mlp':
    raise ValueError('PPO uses the MLP actor-critic towers '
                     '(rl/ppo.py); conv networks are DQN-only')
  if net_kind == 'mlp':
    network = MLPQNetwork(env.num_actions)
  elif net_kind == 'nature':
    network = NatureDQN(num_actions=env.num_actions, width=FLAGS.width)
  elif net_kind == 'impala':
    network = ImpalaNet(num_actions=env.num_actions, width=FLAGS.width)
  else:
    raise ValueError(f'unknown network {net_kind!r}')
  if FLAGS.agent == 'dqn':
    from rigl_tpu.rl import DQNConfig, SparseDQN
    cfg = DQNConfig(
        training_method=method,
        sparsity=FLAGS.end_sparsity,
        mask_init_method=FLAGS.mask_init_method,
        maskupdate_frequency=FLAGS.maskupdate_frequency,
        maskupdate_begin_step=FLAGS.maskupdate_begin_step,
        drop_fraction=FLAGS.drop_fraction,
        learning_rate=FLAGS.learning_rate,
        seed=FLAGS.seed)
    agent = SparseDQN(network, env, cfg)
    result = agent.train(FLAGS.total_env_steps, log_every=FLAGS.log_every,
                         progress_fn=print)
  elif FLAGS.agent == 'ppo':
    from rigl_tpu.rl.ppo import PPOConfig, SparsePPO
    cfg = PPOConfig(
        training_method=method,
        sparsity=FLAGS.end_sparsity,
        mask_init_method=FLAGS.mask_init_method,
        maskupdate_frequency=FLAGS.maskupdate_frequency,
        maskupdate_begin_step=FLAGS.maskupdate_begin_step,
        drop_fraction=FLAGS.drop_fraction,
        learning_rate=FLAGS.learning_rate,
        seed=FLAGS.seed)
    agent = SparsePPO(env, cfg)
    result = agent.train(FLAGS.total_env_steps, progress_fn=print)
  else:
    raise ValueError(f'unknown agent {FLAGS.agent!r}')
  return _emit(result)


def _emit(result):
  print(json.dumps(result, indent=2))
  if FLAGS.output_dir:
    import os
    os.makedirs(FLAGS.output_dir, exist_ok=True)
    with open(os.path.join(FLAGS.output_dir, 'results.json'), 'w') as f:
      json.dump(result, f, indent=2)
  return result


if __name__ == '__main__':
  app.run(main)

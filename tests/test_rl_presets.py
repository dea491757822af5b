"""RL preset parity tests — every configs/rl_*.json mirrors a reference gin
file (rl/sparsetrain_configs/*.gin + rl/tfagents/configs/*.gin) and runs
through the driver with tiny step-count overrides."""

import glob
import json
import os

import numpy as np
import pytest

from rigl_tpu.drivers import rl as rl_driver

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = sorted(glob.glob(os.path.join(REPO, 'configs', 'rl_*.json')))

# One representative per (agent, method-family) actually *trained*; the
# rest are validated for loadability + agent-config construction (training
# all 19 on the 1-core CPU box would take ~20 min for no extra coverage).
TRAINED = {
    'rl_dqn_atari_rigl.json',
    'rl_dqn_atari_prune.json',
    'rl_dqn_gym_sparse.json',
    'rl_ppo_mujoco_sparse.json',
    'rl_sac_mujoco_sparse.json',
}


def test_preset_inventory_matches_reference():
  """19 presets: 10 Atari sparsetrain + 9 tfagents gym/mujoco gin files."""
  names = {os.path.basename(p) for p in PRESETS}
  assert len(names) == 19, sorted(names)
  assert sum(n.startswith('rl_dqn_atari') for n in names) == 10
  for agent in ('dqn_gym', 'ppo_mujoco', 'sac_mujoco'):
    assert sum(n.startswith(f'rl_{agent}') for n in names) == 3, agent


@pytest.mark.parametrize(
    'path', PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads_and_runs(path):
  preset, agent_kwargs = rl_driver.load_preset(path)

  raw = json.load(open(path))
  assert raw.get('_reference'), f'{path} missing _reference citation'
  assert raw.get('_substitutions'), f'{path} missing _substitutions doc'

  # Shrink to smoke scale: enough env steps for a couple of learn steps.
  preset['total_env_steps'] = 300
  preset['log_every'] = 10 ** 9
  preset['maskupdate_frequency'] = min(preset.get(
      'maskupdate_frequency', 500), 20)
  preset['maskupdate_begin_step'] = min(preset.get(
      'maskupdate_begin_step', 200), 10)
  if preset.get('maskupdate_end_step', -1) > 0:
    preset['maskupdate_end_step'] = 100
  agent_kwargs = dict(agent_kwargs)
  agent_kwargs['buffer_capacity'] = 512
  agent_kwargs['min_replay'] = 64
  agent_kwargs['batch_size'] = 32
  if preset['agent'] == 'ppo':
    # PPO has no replay buffer; shrink the rollout instead.
    agent_kwargs = {'rollout_length': 64, 'num_minibatches': 2,
                    'num_epochs': 2}
  if preset['agent'] == 'dqn' and preset.get('network') == 'impala':
    preset['width'] = 0.25

  if os.path.basename(path) not in TRAINED:
    # Construction-only check: the preset's agent kwargs must be valid
    # fields of the agent's config dataclass.
    agent = preset['agent']
    common = dict(training_method=preset['training_method'], seed=0)
    common.update(agent_kwargs)
    if agent == 'dqn':
      from rigl_tpu.rl import DQNConfig
      DQNConfig(**common)
    elif agent == 'ppo':
      from rigl_tpu.rl.ppo import PPOConfig
      PPOConfig(**common)
    else:
      from rigl_tpu.rl.sac import SACConfig
      SACConfig(**common)
    return

  result = rl_driver.run(agent_kwargs=agent_kwargs, progress_fn=None,
                         **preset)
  assert np.isfinite(result['avg_return'])
  if preset['training_method'] not in ('none', 'prune'):
    assert result['global_sparsity'] == pytest.approx(
        preset['end_sparsity'], abs=0.12)

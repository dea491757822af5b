"""Sparse RL workload: pure-JAX envs, device-resident replay, sparse DQN."""

from rigl_tpu.rl.dqn import DQNConfig, SparseDQN
from rigl_tpu.rl.envs import CartPole
from rigl_tpu.rl.networks import ImpalaNet, MLPQNetwork, NatureDQN
from rigl_tpu.rl.envs import Pendulum
from rigl_tpu.rl.ppo import PPOConfig, SparsePPO
from rigl_tpu.rl.sac import SACConfig, SparseSAC
from rigl_tpu.rl.runner import PhaseRunner

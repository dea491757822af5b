"""Learning-rate schedules — parity with the reference trainers.

  * ImageNet piecewise with linear warmup over the first phase
    (imagenet_train_eval.py:280-330): per-architecture (multiplier,
    start_epoch) tables, scaled by batch/256, optional SGDR cosine restarts.
  * CIFAR piecewise /5 at 30k/60k/90k steps (resnet_train_eval.py:185-200).
  * `training_steps_multiplier` rescales every boundary (the reference's
    extended 5x-100x training runs, imagenet_train_eval.py:290-297).

All schedules are step -> lr functions built on optax, traced-input safe.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]

# (multiplier, start_epoch) tables, imagenet_train_eval.py:283-288.
LR_SCHEDULES = {
    'resnet': [(1.0, 0), (0.1, 30), (0.01, 70), (0.001, 90), (0.0001, 120)],
    'vgg': [(1.0, 0), (0.1, 30), (0.01, 70), (0.001, 90), (0.0001, 120)],
    'mobilenet': [(1.0, 8), (0.1, 40), (0.01, 75), (0.001, 95),
                  (0.0003, 120)],
}


def imagenet_lr_schedule(
    base_learning_rate: float,
    batch_size: int,
    steps_per_epoch: float,
    schedule: Sequence[Tuple[float, float]] = None,
    training_steps_multiplier: float = 1.0,
) -> Schedule:
  """Piecewise-constant with linear warmup over the first phase.

  The warmup ramps linearly from 0 to scaled_lr across the first phase's
  epochs (lr_schedule at imagenet_train_eval.py:317-330); multipliers apply
  afterwards.
  """
  table = [(m, e * training_steps_multiplier)
           for m, e in (schedule or LR_SCHEDULES['resnet'])]
  scaled_lr = base_learning_rate * (batch_size / 256.0)

  def fn(step):
    epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
    first_mult, first_epoch = table[0]
    if first_epoch > 0:
      lr = scaled_lr * first_mult * epoch / first_epoch
    else:
      lr = jnp.full_like(epoch, scaled_lr * first_mult)
    for mult, start_epoch in table:
      lr = jnp.where(epoch < start_epoch, lr, scaled_lr * mult)
    return lr

  return fn


def sgdr_schedule(base_learning_rate: float, batch_size: int,
                  steps_per_epoch: float, decay_epochs: float,
                  t_mul: float = 2.0, m_mul: float = 1.0) -> Schedule:
  """SGDR cosine decay with warm restarts (tf.train.cosine_decay_restarts
  semantics; imagenet_train_eval.py:320-323 use_sgdr path)."""
  scaled_lr = base_learning_rate * (batch_size / 256.0)

  def fn(step):
    epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
    frac = epoch / decay_epochs
    if t_mul == 1.0:
      i_restart = jnp.floor(frac)
      t = frac - i_restart
    else:
      # Number of completed restart periods.
      i_restart = jnp.floor(
          jnp.log(jnp.maximum(1.0 - frac * (1.0 - t_mul), 1e-12))
          / jnp.log(t_mul))
      sum_r = (1.0 - t_mul ** i_restart) / (1.0 - t_mul)
      t = (frac - sum_r) / (t_mul ** i_restart)
    m_fac = m_mul ** i_restart
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(t, 0.0, 1.0)))
    return scaled_lr * m_fac * cosine

  return fn


def cifar_lr_schedule(training_steps_multiplier: float = 1.0) -> Schedule:
  """0.1 divided by 5 at 30k/60k/90k steps (resnet_train_eval.py:189-200)."""
  boundaries = [int(b * training_steps_multiplier)
                for b in (30000, 60000, 90000)]
  values = [0.1 / (5.0 ** i) for i in range(len(boundaries) + 1)]

  def fn(step):
    step = jnp.asarray(step, jnp.int32)
    lr = jnp.full((), values[0], jnp.float32)
    for b, v in zip(boundaries, values[1:]):
      lr = jnp.where(step < b, lr, v)
    return lr

  return fn


def constant_lr(lr: float) -> Schedule:
  return lambda step: jnp.full((), lr, jnp.float32)


def mnist_lr_schedule(lr: float = 0.2, decay_steps: int = 25000,
                      decay_rate: float = 0.1) -> Schedule:
  """Staircase exponential decay used by the MNIST trainer
  (mnist_train_eval.py optimizer block)."""

  def fn(step):
    k = jnp.floor(jnp.asarray(step, jnp.float32) / decay_steps)
    return lr * (decay_rate ** k)

  return fn

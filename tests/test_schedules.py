"""Tests for update gating + drop-fraction anneals — contract from
rigl/sparse_optimizers_base.py:198-258 and its tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import schedules


def _fires(sched, steps):
  """Simulates the last_update_step state machine over `steps` iterations."""
  last = sched.initial_last_update_step
  fired = []
  for step in range(steps):
    if bool(sched.is_update_iter(step, last)):
      fired.append(step)
      last = step
  return fired


def test_extract_number():
  assert schedules.extract_number('exponential_2.5') == 2.5
  assert schedules.extract_number('exponential_4') == 4.0
  assert schedules.extract_number('exponential') == 1.0
  assert schedules.extract_number('foo_.5') == 0.5


def test_basic_frequency_gating():
  s = schedules.UpdateSchedule(begin_step=0, end_step=-1, frequency=100,
                               drop_fraction=0.3)
  assert _fires(s, 350) == [0, 100, 200, 300]


def test_begin_end_window():
  s = schedules.UpdateSchedule(begin_step=50, end_step=250, frequency=100)
  assert _fires(s, 500) == [50, 150, 250]


def test_end_step_zero_means_never():
  s = schedules.UpdateSchedule(begin_step=0, end_step=0, frequency=10)
  assert _fires(s, 100) == []


def test_negative_end_step_means_forever():
  s = schedules.UpdateSchedule(begin_step=0, end_step=-1, frequency=40)
  fired = _fires(s, 200)
  assert fired == [0, 40, 80, 120, 160]


def test_initial_last_update_enables_step_zero():
  s = schedules.UpdateSchedule(begin_step=0, end_step=-1, frequency=100)
  assert s.initial_last_update_step == -100
  assert bool(s.is_update_iter(0, s.initial_last_update_step))


def test_constant_drop_fraction():
  s = schedules.UpdateSchedule(drop_fraction=0.3,
                               drop_fraction_anneal='constant')
  assert float(s.get_drop_fraction(0)) == pytest.approx(0.3)
  assert float(s.get_drop_fraction(10**6)) == pytest.approx(0.3)


def test_cosine_drop_fraction():
  s = schedules.UpdateSchedule(begin_step=0, end_step=1000, frequency=100,
                               drop_fraction=0.3,
                               drop_fraction_anneal='cosine')
  assert float(s.get_drop_fraction(0)) == pytest.approx(0.3)
  assert float(s.get_drop_fraction(500)) == pytest.approx(0.15, abs=1e-6)
  assert float(s.get_drop_fraction(1000)) == pytest.approx(0.0, abs=1e-6)
  # Clipped beyond end (TF cosine_decay semantics).
  assert float(s.get_drop_fraction(2000)) == pytest.approx(0.0, abs=1e-6)


def test_exponential_drop_fraction():
  s = schedules.UpdateSchedule(begin_step=0, end_step=100, frequency=10,
                               drop_fraction=0.4,
                               drop_fraction_anneal='exponential_2')
  assert float(s.get_drop_fraction(0)) == pytest.approx(0.4)
  assert float(s.get_drop_fraction(50)) == pytest.approx(0.4 * 0.25)
  assert float(s.get_drop_fraction(100)) == pytest.approx(0.0, abs=1e-7)


def test_lr_scaled_drop_fraction():
  lr_fn = lambda step: 0.1 * jnp.where(jnp.asarray(step) < 50, 1.0, 0.5)
  s = schedules.lr_schedule(0, -1, 10, 0.3, lr_fn)
  assert float(s.get_drop_fraction(0)) == pytest.approx(0.3)
  assert float(s.get_drop_fraction(60)) == pytest.approx(0.15)


def test_invalid_anneal_raises():
  with pytest.raises(ValueError, match='not valid'):
    schedules.UpdateSchedule(drop_fraction_anneal='bogus')
  with pytest.raises(ValueError, match='lr_fn'):
    schedules.UpdateSchedule(drop_fraction_anneal='lr')


def test_traced_inputs():
  import jax
  s = schedules.UpdateSchedule(begin_step=0, end_step=-1, frequency=100)

  @jax.jit
  def f(step, last):
    return s.is_update_iter(step, last), s.get_drop_fraction(step)

  is_it, df = f(jnp.int32(100), jnp.int32(0))
  assert bool(is_it)
  assert float(df) == pytest.approx(0.3)
  assert not bool(f(jnp.int32(99), jnp.int32(0))[0])


def test_annealed_schedules_require_positive_end():
  """Cosine/exponential with end<=begin would silently zero the drop
  fraction (code-review finding); must raise instead."""
  with pytest.raises(ValueError, match='end_step > begin_step'):
    schedules.UpdateSchedule(begin_step=0, end_step=-1,
                             drop_fraction_anneal='cosine')
  with pytest.raises(ValueError, match='end_step > begin_step'):
    schedules.UpdateSchedule(begin_step=100, end_step=100,
                             drop_fraction_anneal='exponential_2')
  # constant is fine with end=-1 (update forever).
  schedules.UpdateSchedule(begin_step=0, end_step=-1,
                           drop_fraction_anneal='constant')

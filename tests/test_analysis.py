"""Tests for the research harness: sparse Hessian spectrum, interpolation,
MetaInit (rigl_tf2 train.py hessian mode / interpolate.py / metainit.py
parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.analysis import (
    gradient_quotient,
    interpolate_losses,
    lanczos_spectrum,
    meta_init,
    sparse_hessian,
    sparse_hessian_spectrum,
)


def _quadratic_setup():
  """Loss = 0.5 * w^T A w over a masked kernel -> Hessian restricted to
  active coords is A's active submatrix."""
  n = 6
  rs = np.random.RandomState(0)
  a = rs.randn(n, n)
  a = a @ a.T + np.eye(n)
  mask = np.ones(n, np.float32)
  mask[[1, 4]] = 0.0
  params = {'layer': {'kernel': jnp.asarray(rs.randn(n, 1), jnp.float32)}}
  masks = {'layer/kernel': jnp.asarray(mask.reshape(n, 1))}

  def loss_fn(p):
    w = p['layer']['kernel'][:, 0]
    return 0.5 * w @ jnp.asarray(a, jnp.float32) @ w

  active = np.flatnonzero(mask)
  a_active = a[np.ix_(active, active)]
  return loss_fn, params, masks, a_active


def test_sparse_hessian_exact():
  loss_fn, params, masks, a_active = _quadratic_setup()
  h = np.asarray(sparse_hessian(loss_fn, params, masks))
  np.testing.assert_allclose(h, a_active, rtol=1e-5)


def test_sparse_hessian_spectrum():
  loss_fn, params, masks, a_active = _quadratic_setup()
  evals = sparse_hessian_spectrum(loss_fn, params, masks)
  np.testing.assert_allclose(evals, np.linalg.eigvalsh(a_active), rtol=1e-4)


def test_lanczos_matches_exact_for_quadratic():
  loss_fn, params, masks, a_active = _quadratic_setup()
  ritz, weights = lanczos_spectrum(loss_fn, params, masks, order=4)
  exact = np.linalg.eigvalsh(a_active)
  # Full-order Lanczos on a 4-dim active space recovers the spectrum.
  np.testing.assert_allclose(np.sort(ritz), exact, rtol=1e-3)
  assert weights.sum() == pytest.approx(1.0, abs=1e-6)


def test_interpolate_losses():
  loss_fn = lambda p: jnp.sum((p['w'] - 2.0) ** 2)
  pa = {'w': jnp.zeros(3)}
  pb = {'w': jnp.full((3,), 4.0)}
  out = interpolate_losses(loss_fn, pa, pb, ts=[0.0, 0.5, 1.0])
  assert [o['loss'] for o in out] == [12.0, 0.0, 12.0]
  assert out[1]['t'] == 0.5


def test_gradient_quotient_finite():
  def loss_fn(p):
    return jnp.sum(jnp.tanh(p['w'] @ p['w'].T))

  gq = gradient_quotient(loss_fn, {'w': jnp.ones((3, 3)) * 0.5})
  assert np.isfinite(float(gq))


def test_meta_init_reduces_gq():
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(16, 8), jnp.float32)
  y = jnp.asarray(rs.randint(0, 2, 16), jnp.int32)

  def loss_fn(p):
    h = jnp.tanh(x @ p['l1']['kernel'])
    logits = h @ p['l2']['kernel']
    import optax
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

  params = {
      'l1': {'kernel': jnp.asarray(rs.randn(8, 8) * 3.0, jnp.float32)},
      'l2': {'kernel': jnp.asarray(rs.randn(8, 2) * 3.0, jnp.float32)},
  }
  tuned, history = meta_init(loss_fn, params, steps=20, lr=0.05)
  assert history[-1] < history[0]
  # Norms changed, directions preserved.
  w0 = np.asarray(params['l1']['kernel'])
  w1 = np.asarray(tuned['l1']['kernel'])
  ratio = w1 / w0
  assert np.allclose(ratio, ratio.flat[0], rtol=1e-5)


def test_visualize_connection_counts():
  from rigl_tpu.analysis.visualize import connection_counts
  mask = np.zeros((16, 4))
  mask[0, :] = 1
  img = connection_counts(mask)
  assert img.shape == (4, 4)
  assert img[0, 0] == 4
  assert img.sum() == 4

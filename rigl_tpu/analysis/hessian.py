"""Sparse Hessian spectrum of the training loss.

Capability parity with rigl_tf2/train.py:58-166 ('hessian' mode): the
spectrum of the loss Hessian restricted to the *active* (unmasked)
parameters.  Where the reference builds per-row Jacobians-of-gradients and
eigendecomposes on CPU, here:

  * small models: exact dense Hessian over the active-coordinate vector via
    ``jax.hessian`` (one XLA program), host eigvalsh.
  * large models: stochastic Lanczos quadrature with Hessian-vector products
    (jvp-of-grad, TPU-resident; only the tridiagonal matrix leaves the
    device), the standard scalable estimator.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.sparsity import masks as masks_lib


def _active_coords(params, masks: Mapping[str, jnp.ndarray]):
  """Flattens active (mask==1) masked-kernel entries into one vector, with
  functions to rebuild the full param tree."""
  sel = masks_lib.select_masked(params, masks)
  idx = {p: np.flatnonzero(np.asarray(masks[p]).reshape(-1) == 1)
         for p in sel}

  def to_vec(tree):
    s = masks_lib.select_masked(tree, masks)
    return jnp.concatenate([
        s[p].reshape(-1)[idx[p]] for p in sel
    ])

  def from_vec(vec, base_tree):
    out = {}
    off = 0
    base_sel = masks_lib.select_masked(base_tree, masks)
    for p in sel:
      n = len(idx[p])
      flat = base_sel[p].reshape(-1).at[idx[p]].set(vec[off:off + n])
      out[p] = flat.reshape(base_sel[p].shape)
      off += n
    return masks_lib.update_masked(base_tree, out)

  return to_vec, from_vec, sum(len(v) for v in idx.values())


def sparse_hessian(loss_fn: Callable, params, masks) -> jnp.ndarray:
  """Exact Hessian over active coordinates (small models only)."""
  to_vec, from_vec, n = _active_coords(params, masks)

  def f(vec):
    return loss_fn(from_vec(vec, params))

  return jax.hessian(f)(to_vec(params))


def sparse_hessian_spectrum(loss_fn: Callable, params, masks) -> np.ndarray:
  """Eigenvalues of the active-coordinate Hessian (ascending)."""
  h = np.asarray(sparse_hessian(loss_fn, params, masks), np.float64)
  return np.linalg.eigvalsh(h)


def lanczos_spectrum(loss_fn: Callable, params, masks, order: int = 32,
                     seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
  """Stochastic Lanczos estimate of the Hessian spectrum.

  Returns (ritz_values, ritz_weights) from `order` Lanczos steps with a
  random start vector; HVPs run on device via jvp-of-grad.
  """
  to_vec, from_vec, n = _active_coords(params, masks)
  x0 = to_vec(params)

  def f(vec):
    return loss_fn(from_vec(vec, params))

  grad_f = jax.grad(f)

  @jax.jit
  def hvp(v):
    return jax.jvp(grad_f, (x0,), (v,))[1]

  rng = np.random.default_rng(seed)
  v = rng.normal(size=n)
  v /= np.linalg.norm(v)
  vs = [jnp.asarray(v, x0.dtype)]
  alphas, betas = [], []
  for i in range(order):
    w = np.asarray(hvp(vs[-1]), np.float64)
    alpha = float(np.dot(w, np.asarray(vs[-1], np.float64)))
    w = w - alpha * np.asarray(vs[-1], np.float64)
    if i > 0:
      w = w - betas[-1] * np.asarray(vs[-2], np.float64)
    # Full reorthogonalization for numerical stability at small orders.
    for u in vs:
      w = w - np.dot(w, np.asarray(u, np.float64)) * np.asarray(u, np.float64)
    beta = float(np.linalg.norm(w))
    alphas.append(alpha)
    if beta < 1e-10 or i == order - 1:
      break
    betas.append(beta)
    vs.append(jnp.asarray(w / beta, x0.dtype))

  t = np.diag(alphas)
  for i, b in enumerate(betas[:len(alphas) - 1]):
    t[i, i + 1] = t[i + 1, i] = b
  evals, evecs = np.linalg.eigh(t)
  weights = evecs[0, :] ** 2
  return evals, weights

"""MetaInit: learning-free initialization tuning by gradient-quotient descent.

Capability parity with rigl_tf2/metainit.py:23-120 (masked variant included):
optimizes only the *norms* of each weight tensor so that the gradient
quotient

    GQ = mean(| Hg / (g + eps * sign(g)) - 1 |)

is minimized (Hg = Hessian-vector product with the gradient itself, computed
as a jvp of the gradient — no explicit Hessian).  Directions are frozen;
each step rescales every tensor toward the norm that lowers GQ, using signSGD
with momentum as in the original MetaInit algorithm.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from rigl_tpu.sparsity import masks as masks_lib


def gradient_quotient(loss_fn: Callable, params, eps: float = 1e-5
                      ) -> jnp.ndarray:
  grad_fn = jax.grad(loss_fn)
  g = grad_fn(params)
  hg = jax.jvp(grad_fn, (params,), (g,))[1]
  leaves_g = jax.tree.leaves(g)
  leaves_hg = jax.tree.leaves(hg)
  total = 0.0
  count = 0
  for gl, hl in zip(leaves_g, leaves_hg):
    denom = gl + eps * (2.0 * (gl >= 0).astype(gl.dtype) - 1.0)
    q = jnp.abs(hl / denom - 1.0)
    total = total + jnp.sum(q)
    count += gl.size
  return total / count


def meta_init(loss_fn: Callable, params,
              masks: Optional[Mapping[str, jnp.ndarray]] = None,
              lr: float = 0.1, momentum: float = 0.9, steps: int = 100,
              eps: float = 1e-5,
              ) -> Tuple[Dict, list]:
  """Tunes per-tensor norms of (optionally masked) params to minimize GQ.

  Returns (tuned params, gq history).  Only >=2D tensors are rescaled
  (biases/BN left alone), matching the reference's choice of trainable
  norms.
  """
  if masks is not None:
    params = masks_lib.apply_masks(params, masks)

  flat, treedef = jax.tree_util.tree_flatten(params)
  rescalable = [i for i, leaf in enumerate(flat) if jnp.ndim(leaf) >= 2]

  def with_scales(scales):
    new = list(flat)
    for j, i in enumerate(rescalable):
      new[i] = flat[i] * scales[j]
    return jax.tree_util.tree_unflatten(treedef, new)

  def gq_of_scales(scales):
    return gradient_quotient(loss_fn, with_scales(scales), eps)

  grad_gq = jax.jit(jax.value_and_grad(gq_of_scales))
  scales = jnp.ones(len(rescalable))
  vel = jnp.zeros_like(scales)
  history = []
  for _ in range(steps):
    gq, g = grad_gq(scales)
    history.append(float(gq))
    vel = momentum * vel + jnp.sign(g)      # signSGD w/ momentum (MetaInit)
    scales = jnp.maximum(scales - lr * vel, 1e-3)
  return with_scales(scales), history

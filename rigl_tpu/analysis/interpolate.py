"""Loss-landscape interpolation between two parameter sets.

Capability parity with rigl_tf2/interpolate.py:80-96: evaluate the loss (and
any metric fn) along the linear path (1-t)*A + t*B, e.g. between the
pre-mask-update and post-mask-update checkpoints the trainer snapshots.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def interpolate_params(params_a, params_b, t: float):
  return jax.tree.map(lambda a, b: (1.0 - t) * a + t * b, params_a, params_b)


def interpolate_losses(loss_fn: Callable, params_a, params_b,
                       ts: Sequence[float] = tuple(np.linspace(0, 1, 11)),
                       ) -> List[Dict[str, float]]:
  """Evaluates `loss_fn(params)` along the interpolation path."""
  eval_jit = jax.jit(lambda p: loss_fn(p))
  out = []
  for t in ts:
    val = eval_jit(interpolate_params(params_a, params_b, float(t)))
    if isinstance(val, dict):
      out.append({'t': float(t), **{k: float(v) for k, v in val.items()}})
    else:
      out.append({'t': float(t), 'loss': float(val)})
  return out

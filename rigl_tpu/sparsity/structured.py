"""N:M structured sparsity — research hook beyond the reference.

The reference's masks are unstructured (element) or, in this rebuild,
block-granular.  N:M masks (exactly n active weights in every contiguous
group of m along the contraction axis) are the middle point: near-
unstructured accuracy with hardware-executable regularity.  TPUs have no
N:M MXU mode, so here N:M is an ACCURACY-side research axis (mask-structure
ablations vs the block masks the Pallas kernels execute); the projection is
exact-count and jit-traceable.

Conventions: for a kernel (..., cin, cout) the group axis is the flattened
contraction dim (all leading axes), matching the usual weight layout where
m consecutive reduction elements share a group.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def project_n_m(scores: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
  """Exact-count N:M mask from |scores|: in every group of m consecutive
  elements along the flattened contraction axis, keep the n largest.

  Ties broken by position (stable argsort) so the count is exactly n per
  group.  Requires prod(shape[:-1]) % m == 0.
  """
  if not 0 < n <= m:
    raise ValueError(f'need 0 < n <= m, got {n}:{m}')
  shape = scores.shape
  cout = shape[-1]
  lead = 1
  for d in shape[:-1]:
    lead *= d
  if lead % m:
    raise ValueError(f'contraction dim {lead} not divisible by m={m} '
                     f'for shape {shape}')
  # (groups, m, cout): rank within each group by descending |score|.
  s = jnp.abs(scores).reshape(lead // m, m, cout)
  order = jnp.argsort(-s, axis=1, stable=True)
  ranks = jnp.argsort(order, axis=1, stable=True)
  mask = (ranks < n).astype(scores.dtype)
  return mask.reshape(shape)


def n_m_mask_dict(key: jax.Array, shapes: Dict[str, tuple], n: int, m: int,
                  dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
  """Random N:M masks for every entry in a {path: shape} dict (the
  generator-style API; sparsity = 1 - n/m by construction)."""
  out = {}
  for i, (path, shape) in enumerate(sorted(shapes.items())):
    scores = jax.random.normal(jax.random.fold_in(key, i), shape)
    out[path] = project_n_m(scores, n, m).astype(dtype)
  return out


def make_n_m_generator(n: int, m: int):
  """Adapter to the MASK_GENERATORS signature (key, shapes, sparsity,
  dtype); `sparsity` must equal 1 - n/m (or be 0/None-ish) to catch
  misconfigured presets."""
  def gen(key, shapes, sparsity, dtype=jnp.float32):
    implied = 1.0 - n / m
    if sparsity and abs(sparsity - implied) > 1e-6:
      raise ValueError(
          f'{n}:{m} implies sparsity {implied:.4f}, preset says {sparsity}')
    return n_m_mask_dict(key, shapes, n, m, dtype)
  gen.__name__ = f'n_m_{n}_{m}_mask'
  return gen


def parse_n_m(mask_type: str):
  """'nm_2_4' -> (2, 4); None if not an N:M spec."""
  parts = mask_type.split('_')
  if len(parts) == 3 and parts[0] == 'nm':
    return int(parts[1]), int(parts[2])
  return None

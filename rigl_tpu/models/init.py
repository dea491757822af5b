"""Sparse-aware weight initializers.

Capability parity, vectorized TPU-first (no per-connection python loops):

  * sparse_variance_scaling — variance scaling with the *expected nnz*
    fan-in (2/(fan_in*(1-sparsity))); the reference's
    SparseConvVarianceScalingInitializer / SparseFCVarianceScalingInitializer
    (imagenet_resnet/resnet_model.py:139-211).
  * random_sparse_init — dense init with a random fraction zeroed, the
    'random_zeros' dense-baseline control (resnet_model.py:111-136).
  * layer_scaled_init — dense variance-scaling init divided by
    sqrt(density(mask)) (rigl_tf2/init_utils.py:70-79).
  * unit_scaled_init — per-connection variance from each unit's *actual*
    masked fan-in/fan-out (rigl_tf2/init_utils.py:23-66).  The reference
    samples scalar-by-scalar in a python loop; here the per-(input, output)
    scale matrix is computed once and a full-shape sample is scaled
    elementwise — identical distribution, one fused kernel.
  * sparse_init / xavier_sparse_normal / kaiming_sparse_normal — per-neuron
    corrected fan-in with fan-out = #non-ablated neurons
    (experimental/jax/pruning/init.py:25-88).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sample(key, shape, scale: jnp.ndarray, distribution: str, dtype):
  """Samples with per-element variance `scale` (broadcastable)."""
  if distribution == 'normal':
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(scale)
  if distribution == 'truncated_normal':
    # Match TF VarianceScaling: truncated at 2 sigma, corrected std.
    std = jnp.sqrt(scale) / 0.87962566103423978
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std
  if distribution == 'uniform':
    limit = jnp.sqrt(3.0 * scale)
    return jax.random.uniform(key, shape, dtype, -1.0, 1.0) * limit
  raise ValueError(f'Unknown distribution {distribution!r}')


def sparse_variance_scaling(sparsity: float, scale: float = 2.0,
                            mode: str = 'fan_in',
                            distribution: str = 'truncated_normal'):
  """Flax-style initializer whose fan counts are discounted by sparsity."""

  def init(key, shape, dtype=jnp.float32):
    fan_in = float(np.prod(shape[:-1]))
    fan_out = float(shape[-1])
    density = max(1.0 - sparsity, 1e-6)
    if mode == 'fan_in':
      denom = max(1.0, fan_in * density)
    elif mode == 'fan_out':
      denom = max(1.0, fan_out * density)
    else:
      denom = max(1.0, (fan_in + fan_out) * density / 2.0)
    return _sample(key, shape, jnp.asarray(scale / denom), distribution,
                   dtype)

  return init


def random_sparse_init(sparsity: float,
                       base_init: Optional[Callable] = None):
  """Dense init with floor(sparsity*size) random entries zeroed — the
  'sparse-shaped dense baseline' control."""
  import flax.linen as nn
  base_init = base_init or nn.initializers.variance_scaling(
      2.0, 'fan_in', 'truncated_normal')

  def init(key, shape, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    w = base_init(k1, shape, dtype)
    size = int(np.prod(shape))
    n_zeros = int(np.floor(sparsity * size))
    keep = jnp.concatenate([jnp.zeros((n_zeros,), dtype),
                            jnp.ones((size - n_zeros,), dtype)])
    keep = jax.random.permutation(k2, keep).reshape(shape)
    return w * keep

  return init


def _mask_2d_fans(mask: jnp.ndarray):
  """Per-unit fans from a mask: conv masks reduce over spatial dims first."""
  if mask.ndim == 4:
    m2d = jnp.sum(mask, axis=(0, 1))
  elif mask.ndim == 2:
    m2d = mask
  else:
    raise ValueError(f'mask.shape: {mask.shape} must be 4 or 2 dimensional.')
  fan_ins = jnp.sum(m2d, axis=-2)   # per output unit
  fan_outs = jnp.sum(m2d, axis=-1)  # per input unit
  return fan_ins, fan_outs


def unit_scaled_init(key, mask: jnp.ndarray, method: str = 'fanavg_uniform',
                     scale: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
  """Per-connection variance-scaled init from the mask's actual fans."""
  mode, distribution = method.strip().split('_')
  fan_ins, fan_outs = _mask_2d_fans(mask)
  fi = jnp.maximum(fan_ins[None, :], 1.0)    # indexed by output (last dim)
  fo = jnp.maximum(fan_outs[:, None], 1.0)   # indexed by input (dim -2)
  if mode == 'fanin':
    s2d = scale / fi + 0.0 * fo
  elif mode == 'fanout':
    s2d = scale / fo + 0.0 * fi
  elif mode == 'fanavg':
    s2d = scale / jnp.maximum((fi + fo) / 2.0, 1.0)
  else:
    raise ValueError(f'mode: {mode} must be fanin, fanout or fanavg.')
  # Broadcast the (in, out) scale across any leading spatial dims.
  s = jnp.broadcast_to(s2d, mask.shape[-2:])
  s = jnp.broadcast_to(s, mask.shape)
  w = _sample(key, mask.shape, s, distribution, dtype)
  return w * mask.astype(dtype)


def layer_scaled_init(key, mask: jnp.ndarray, method: str = 'fanavg_uniform',
                      scale: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
  """Dense variance-scaling init divided by sqrt(layer density)."""
  mode, distribution = method.strip().split('_')
  fan_in = float(np.prod(mask.shape[:-1]))
  fan_out = float(mask.shape[-1])
  denom = {'fanin': fan_in, 'fanout': fan_out,
           'fanavg': (fan_in + fan_out) / 2.0}[mode]
  dense = _sample(key, mask.shape, jnp.asarray(scale / max(denom, 1.0)),
                  distribution, dtype)
  density = jnp.sum(mask) / mask.size
  return dense / jnp.sqrt(jnp.maximum(density, 1e-12))


def sparse_init(key, mask: jnp.ndarray, scale: float = 1.0,
                mode: str = 'fan_avg', distribution: str = 'normal',
                dtype=jnp.float32) -> jnp.ndarray:
  """Per-neuron corrected init: each output neuron's fan-in is its surviving
  input count; fan-out is the number of non-ablated neurons in the layer."""
  m2d = mask.reshape(-1, mask.shape[-1])
  neuron_fan_in = jnp.sum(m2d, axis=0)                # per output neuron
  non_zero_neurons = jnp.sum(neuron_fan_in != 0)
  fi = jnp.maximum(neuron_fan_in, 1.0)
  fo = jnp.maximum(non_zero_neurons.astype(jnp.float32), 1.0)
  if mode == 'fan_in':
    s = scale / fi
  elif mode == 'fan_out':
    s = scale / fo
  else:
    s = scale / ((fi + fo) / 2.0)
  w = _sample(key, mask.shape, jnp.broadcast_to(s, mask.shape), distribution,
              dtype)
  return w * mask.astype(dtype)


def xavier_sparse_normal(key, mask, dtype=jnp.float32):
  return sparse_init(key, mask, scale=1.0, mode='fan_avg',
                     distribution='normal', dtype=dtype)


def kaiming_sparse_normal(key, mask, dtype=jnp.float32):
  return sparse_init(key, mask, scale=2.0, mode='fan_in',
                     distribution='normal', dtype=dtype)


def reinit_masked_params(key, params_sel, masks, method: str = 'unit_scaled',
                         **kwargs):
  """Re-initializes a dict of masked kernels with a sparse-aware scheme —
  the reference's fixed_sparse_init hook (rl/sparse_utils.py:244-277,
  rigl_tf2/utils.py:146-167)."""
  fns = {
      'unit_scaled': unit_scaled_init,
      'layer_scaled': layer_scaled_init,
      'sparse': sparse_init,
  }
  if method not in fns:
    raise ValueError(f'Unknown sparse re-init {method!r}')
  fn = fns[method]
  out = {}
  for i, (path, mask) in enumerate(masks.items()):
    out[path] = fn(jax.random.fold_in(key, i), mask, **kwargs)
  return out

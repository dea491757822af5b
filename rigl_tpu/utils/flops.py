"""FLOPs / model-size accounting for sparse models.

Replaces the reference's dependency on the external MicroNet-challenge
counting library (sparse_utils.get_stats, sparse_utils.py:376-454).  Instead
of hand-maintained per-layer formulas, we trace the model's jaxpr and count
`conv_general_dilated` / `dot_general` primitives with their actual shapes —
exact for every model in the zoo (and any future one), then scale each op by
its layer's density.

Conventions (matching the README tables the reference publishes):
  * FLOPs = multiplies + adds (2 * MACs), inference, batch 1.
  * sparse FLOPs scale linearly with layer density.
  * size bytes = nnz * param_bytes + total_params / 8 (bitmask overhead),
    reproducing e.g. 23.68MB for ResNet-50 @ 80% ERK.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.sparsity import masks as masks_lib


def _collect_compute_eqns(closed_jaxpr) -> List[Tuple[str, tuple, tuple, tuple]]:
  """Walks the jaxpr (incl. sub-jaxprs) collecting matmul/conv ops as
  (kind, lhs_shape, rhs_shape, out_shape)."""
  out = []

  def walk(jaxpr):
    for eqn in jaxpr.eqns:
      name = eqn.primitive.name
      if name in ('conv_general_dilated', 'dot_general'):
        lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
        res = eqn.outvars[0].aval.shape
        out.append((name, lhs, rhs, res))
      for param in eqn.params.values():
        if isinstance(param, jax.extend.core.ClosedJaxpr):
          walk(param.jaxpr)
        elif isinstance(param, (tuple, list)):
          for p in param:
            if isinstance(p, jax.extend.core.ClosedJaxpr):
              walk(p.jaxpr)

  walk(closed_jaxpr.jaxpr)
  return out


def _macs(kind: str, lhs, rhs, res) -> int:
  if kind == 'conv_general_dilated':
    # MACs = output positions * kernel volume * cin / groups * cout...
    # output elements * (prod(kernel spatial) * cin_per_group)
    kernel_volume = int(np.prod(rhs[:-1]))  # kh*kw*cin_per_group (NHWC HWIO)
    return int(np.prod(res)) * kernel_volume
  # dot_general: contracted dim = shared dim.
  m = int(np.prod(res))
  k = int(rhs[0]) if len(rhs) >= 1 else 1
  return m * k


def count_model(model, input_shape: Tuple[int, ...],
                sparsities: Optional[Mapping[str, float]] = None,
                param_bits: int = 32,
                train: bool = False) -> Dict[str, Any]:
  """Counts inference FLOPs + size of `model` under per-layer sparsities.

  Args:
    model: flax module with __call__(x, train=...).
    input_shape: including batch (use batch 1 for the README convention).
    sparsities: {param_path: sparsity} (e.g. from
      distributions.get_sparsities over mask_shapes); None = dense.
    param_bits: bits per stored parameter.

  Returns dict with dense_flops, sparse_flops, param_bytes, sparsity, and
  per-layer detail.
  """
  x = jnp.zeros(input_shape, jnp.float32)
  variables = model.init(jax.random.key(0), x, train=False)
  params = variables['params']

  closed = jax.make_jaxpr(
      lambda v, x: model.apply(v, x, train=train))(variables, x)
  eqns = _collect_compute_eqns(closed)

  # Maskable layers in definition order — matches execution order for the
  # sequential models in the zoo; ops are matched greedily by kernel shape.
  shapes = masks_lib.mask_shapes(params)
  sparsities = dict(sparsities or {})
  remaining = list(shapes.items())

  dense_flops = 0
  sparse_flops = 0
  per_layer = []
  for kind, lhs, rhs, res in eqns:
    macs = _macs(kind, lhs, rhs, res)
    flops = 2 * macs
    dense_flops += flops
    # Match this op to a masked layer by kernel shape.
    matched = None
    for i, (path, kshape) in enumerate(remaining):
      if tuple(kshape) == tuple(rhs):
        matched = (i, path)
        break
    if matched is not None:
      i, path = matched
      remaining.pop(i)
      s = float(sparsities.get(path, 0.0))
      sparse_flops += int(flops * (1.0 - s))
      per_layer.append({'path': path, 'kind': kind, 'dense_flops': flops,
                        'sparsity': s})
    else:
      sparse_flops += flops
      per_layer.append({'path': None, 'kind': kind, 'dense_flops': flops,
                        'sparsity': 0.0})

  total_params = sum(int(np.prod(np.shape(p)))
                     for p in jax.tree.leaves(params))
  masked_params = sum(int(np.prod(s)) for s in shapes.values())
  nnz = total_params - sum(
      int(np.prod(shapes[p]) * sparsities.get(p, 0.0)) for p in shapes)
  param_bytes = nnz * param_bits // 8
  if sparsities:
    param_bytes += masked_params // 8  # 1-bit mask per maskable param
  return {
      'dense_flops': dense_flops,
      'sparse_flops': sparse_flops,
      'flops_ratio': sparse_flops / max(dense_flops, 1),
      'total_params': total_params,
      'nnz_params': nnz,
      'param_bytes': param_bytes,
      'sparsity': 1.0 - nnz / max(total_params, 1),
      'per_layer': per_layer,
  }


def get_stats(model, input_shape, method: str = 'erdos_renyi_kernel',
              default_sparsity: float = 0.8,
              custom_sparsities: Optional[Mapping[str, float]] = None,
              erk_power_scale: float = 1.0,
              param_bits: int = 32) -> Tuple[int, int, float]:
  """Reference-shaped API (sparse_utils.get_stats): returns
  (total_flops, total_param_bits, real_sparsity) for the given distribution."""
  from rigl_tpu.sparsity import distributions
  x = jnp.zeros(input_shape, jnp.float32)
  variables = model.init(jax.random.key(0), x, train=False)
  shapes = masks_lib.mask_shapes(variables['params'])
  sparsities = distributions.get_sparsities(
      shapes, method, default_sparsity, custom_sparsities or {},
      erk_power_scale=erk_power_scale)
  stats = count_model(model, input_shape, sparsities, param_bits)
  return stats['sparse_flops'], stats['param_bytes'] * 8, stats['sparsity']

"""Per-layer sparsity distributions: uniform, Erdos-Renyi(-Kernel), STR tables.

Capability parity with the reference's ``rigl/sparse_utils.py`` (see
``get_sparsities`` at sparse_utils.py:258-316 and the ERK epsilon solver at
sparse_utils.py:90-207), re-designed around plain ``{name: shape}`` dicts so the
solver is independent of any graph framework.  Everything here is pure
numpy/python executed once at setup time on the host; nothing is traced.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

DEFAULT_ERK_SCALE = 1.0

ShapeDict = Mapping[str, Tuple[int, ...]]


def get_n_zeros(size: int, sparsity: float) -> int:
  """Number of zeros for a layer of `size` params at `sparsity`.

  Uses floor, matching the deterministic-count convention of the reference
  (sparse_utils.py:35-36) so mask population counts are exact integers.
  """
  return int(np.floor(sparsity * size))


def get_n_ones(size: int, sparsity: float) -> int:
  return size - get_n_zeros(size, sparsity)


def _validate_sparsity(sparsity: float, what: str = 'sparsity'):
  if not 0.0 <= sparsity <= 1.0:
    raise ValueError(f'{what} must be in [0, 1], got {sparsity}')


def _validate_custom_map(shapes: ShapeDict, custom_sparsity_map: Mapping[str, float]):
  missing = set(custom_sparsity_map) - set(shapes)
  if missing:
    raise ValueError(
        'No masks are found for the following names: %s' % sorted(missing))
  for name, s in custom_sparsity_map.items():
    _validate_sparsity(s, f'custom sparsity for {name!r}')


def sparsities_uniform(
    shapes: ShapeDict,
    default_sparsity: float,
    custom_sparsity_map: Optional[Mapping[str, float]] = None,
) -> Dict[str, float]:
  """Every layer gets `default_sparsity` unless overridden.

  Mirrors sparse_utils.py:210-235.
  """
  _validate_sparsity(default_sparsity, 'default_sparsity')
  custom_sparsity_map = custom_sparsity_map or {}
  _validate_custom_map(shapes, custom_sparsity_map)
  return {
      name: custom_sparsity_map.get(name, default_sparsity) for name in shapes
  }


def sparsities_erdos_renyi(
    shapes: ShapeDict,
    default_sparsity: float,
    custom_sparsity_map: Optional[Mapping[str, float]] = None,
    include_kernel: bool = True,
    erk_power_scale: float = DEFAULT_ERK_SCALE,
) -> Dict[str, float]:
  """Erdos-Renyi(-Kernel) per-layer sparsities preserving the global budget.

  Solves for the scaling factor ``eps`` such that layers scale by their
  ER probability while the *total* number of surviving parameters equals the
  uniform-sparsity total:

      eps * sum_i p_i * N_i  (+ dense layers' N)  ==  (1 - s) * sum_i N_i

  Layers whose scaled density would exceed 1 are forced fully dense and the
  solve is repeated without them.  Re-derivation of the iterative solver in
  the reference (sparse_utils.py:118-207); with ``include_kernel=True`` the
  raw probability is ``(sum(shape)/prod(shape)) ** erk_power_scale`` (ERK),
  otherwise ``(n_in + n_out) / (n_in * n_out)`` over the last two dims (ER).

  Args:
    shapes: dict mapping layer name -> kernel shape tuple.
    default_sparsity: overall target sparsity in [0, 1).
    custom_sparsity_map: per-layer overrides; those layers are excluded from
      the ER scaling (their budget is not redistributed).
    include_kernel: True for ERK (kernel spatial dims participate).
    erk_power_scale: exponent <1 softens the distribution.

  Returns:
    dict name -> sparsity.
  """
  _validate_sparsity(default_sparsity, 'default_sparsity')
  custom_sparsity_map = custom_sparsity_map or {}
  _validate_custom_map(shapes, custom_sparsity_map)

  dense_layers: set = set()
  while True:
    divisor = 0.0
    rhs = 0.0
    raw_probabilities: Dict[str, float] = {}
    for name, shape in shapes.items():
      n_param = int(np.prod(shape))
      n_zeros = get_n_zeros(n_param, default_sparsity)
      if name in dense_layers:
        # Budget spent making this layer dense comes out of the others.
        rhs -= n_zeros
      elif name in custom_sparsity_map:
        # Custom layers do not participate in the ER solve at all.
        continue
      else:
        rhs += n_param - n_zeros
        if include_kernel:
          prob = (np.sum(shape) / np.prod(shape)) ** erk_power_scale
        else:
          if len(shape) < 2:
            raise ValueError(
                f'ER (include_kernel=False) needs >=2D kernels; {name} has '
                f'shape {shape}')
          n_in, n_out = shape[-2], shape[-1]
          prob = (n_in + n_out) / (n_in * n_out)
        raw_probabilities[name] = prob
        divisor += prob * n_param
    if not raw_probabilities:
      break
    eps = rhs / divisor
    max_prob = max(raw_probabilities.values())
    if max_prob * eps > 1.0:
      # Any layer that would exceed density 1 becomes dense; re-solve.
      for name, prob in raw_probabilities.items():
        if prob == max_prob:
          dense_layers.add(name)
    else:
      break

  sparsities: Dict[str, float] = {}
  for name, shape in shapes.items():
    if name in custom_sparsity_map:
      sparsities[name] = float(custom_sparsity_map[name])
    elif name in dense_layers:
      sparsities[name] = 0.0
    else:
      sparsities[name] = 1.0 - eps * raw_probabilities[name]
  return sparsities


def sparsities_str(shapes: ShapeDict, default_sparsity: float) -> Dict[str, float]:
  """Looks up published STR per-layer ResNet-50 sparsities.

  Parity with sparse_utils.py:238-255; tables live in str_sparsities.py.
  """
  from rigl_tpu.sparsity import str_sparsities
  tables = str_sparsities.read_all()
  if default_sparsity not in tables:
    raise ValueError('sparsity: %f is not defined' % default_sparsity)
  table = tables[default_sparsity]
  try:
    return {name: table[name] for name in shapes}
  except KeyError as e:
    raise ValueError(f'Layer {e} not present in STR table') from e


def get_sparsities(
    shapes: ShapeDict,
    method: str,
    default_sparsity: float,
    custom_sparsity_map: Optional[Mapping[str, float]] = None,
    erk_power_scale: float = DEFAULT_ERK_SCALE,
) -> Dict[str, float]:
  """Dispatch over distribution methods, mirroring sparse_utils.py:258-316.

  Args:
    shapes: dict layer name -> kernel shape.
    method: 'random' (uniform), 'uniform', 'erdos_renyi', 'erdos_renyi_kernel',
      or 'str'.
    default_sparsity: overall sparsity target.
    custom_sparsity_map: per-layer overrides.
    erk_power_scale: ERK softening exponent.
  """
  custom_sparsity_map = custom_sparsity_map or {}
  if method in ('erdos_renyi', 'erdos_renyi_kernel'):
    return sparsities_erdos_renyi(
        shapes,
        default_sparsity,
        custom_sparsity_map,
        include_kernel=(method == 'erdos_renyi_kernel'),
        erk_power_scale=erk_power_scale)
  elif method in ('random', 'uniform'):
    return sparsities_uniform(shapes, default_sparsity, custom_sparsity_map)
  elif method == 'str':
    return sparsities_str(shapes, default_sparsity)
  raise ValueError(
      'Method: %s is not a valid mask initialization method' % method)


def total_density(shapes: ShapeDict, sparsities: Mapping[str, float]) -> float:
  """Fraction of parameters that survive under the given per-layer sparsities."""
  total = 0
  ones = 0
  for name, shape in shapes.items():
    n = int(np.prod(shape))
    total += n
    ones += n - get_n_zeros(n, sparsities[name])
  return ones / total

"""Per-layer sparsity specs for PACKED models: SparsityMap + resolution.

The reference's flagship recipe is per-layer ERK sparsity (solver at
sparse_utils.py:90-207, wired per-layer into the masked layers at
imagenet_train_eval.py:308-316).  The dense-latent path here has always
supported it (sparsity/distributions.py feeding MaskDicts); this module
carries the same per-layer capability onto the packed-storage surface:
every packed layer (PackedDense / PackedConv1x1 / PackedConv /
_PackedExperts) accepts a `sparsity` that is either a plain float
(uniform) or a SparsityMap, and resolves its own value by its flax module
path at trace time.  n_active stays a per-layer static constant, so
nothing else in the packed machinery (drop/grow, checkpointing, TP/EP
stacking) changes.

Lookup semantics: exact path match first, then UNIQUE suffix match
('attn/qkv/kernel' matches 'block3/attn/qkv/kernel').  Suffix matching is
what lets one canonical map serve every apply context the same kernel can
appear in — the full model ('block3/attn/qkv/kernel'), the pipeline
stage's per-block apply ('attn/qkv/kernel'), the decode twin — without
prefix surgery.  For uniform-depth transformer stacks the collapsed
(blockless) keys are EXACT for the ERK solve: every layer type appears
once per block, so the epsilon solve over one block's shapes yields the
same eps (both sides of eps = rhs/divisor scale by the depth L).
Ambiguous or missing paths raise, loudly, at model-init trace time.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from rigl_tpu.sparsity import distributions


class SparsityMap:
  """Frozen, hashable {layer_path: sparsity} table.

  Hashability matters because instances ride as flax Module attributes
  (dataclass fields), which must never break module equality/hashing.
  Keys are '/'-joined param paths (the MaskDict convention, e.g.
  'block0/attn/qkv/kernel'); values are floats in [0, 1].
  """

  __slots__ = ('_items', '_lookup')

  def __init__(self, mapping: Mapping[str, float]):
    items = []
    for k, v in mapping.items():
      v = float(v)
      if not 0.0 <= v <= 1.0:
        raise ValueError(f'sparsity for {k!r} must be in [0, 1], got {v}')
      items.append((str(k), v))
    self._items = tuple(sorted(items))
    self._lookup = dict(self._items)

  def items(self):
    return self._items

  def as_dict(self) -> Dict[str, float]:
    return dict(self._items)

  def __hash__(self):
    return hash(self._items)

  def __eq__(self, other):
    return isinstance(other, SparsityMap) and self._items == other._items

  def __repr__(self):
    return f'SparsityMap({dict(self._items)!r})'

  def lookup(self, path: str) -> float:
    """Exact match, else unique suffix match, else KeyError."""
    if path in self._lookup:
      return self._lookup[path]
    hits = [k for k, _ in self._items
            if path.endswith('/' + k)]
    if len(hits) == 1:
      return self._lookup[hits[0]]
    if len(hits) > 1:
      raise KeyError(f'sparsity map is ambiguous for {path!r}: '
                     f'suffix-matches {hits}')
    raise KeyError(f'no sparsity entry for layer {path!r}; map keys: '
                   f'{[k for k, _ in self._items]}')


SparsitySpec = Union[float, int, SparsityMap, Mapping[str, float]]


def resolve_sparsity(spec: SparsitySpec,
                     path: Union[str, Sequence[str]]) -> float:
  """Resolve a layer's sparsity from a float-or-map spec.

  `path`: the layer's flax module path tuple (Module.path) or a
  '/'-joined string; the map key convention appends '/kernel' for you if
  a tuple is given (packed kernels are always the 'kernel' param).
  """
  if isinstance(spec, (float, int)):
    return float(spec)
  if not isinstance(path, str):
    path = '/'.join(tuple(path) + ('kernel',))
  if isinstance(spec, SparsityMap):
    return spec.lookup(path)
  return SparsityMap(spec).lookup(path)


def make_sparsity_map(
    shapes: Mapping[str, Tuple[int, ...]],
    method: str,
    default_sparsity: float,
    custom_sparsity_map: Optional[Mapping[str, float]] = None,
    erk_power_scale: float = distributions.DEFAULT_ERK_SCALE,
) -> SparsityMap:
  """Solve a per-layer distribution over a packed model's layer shapes.

  shapes: {path: DENSE kernel shape} from the model family's
  layer_shapes helper (conv layers use the 4D (kh, kw, cin, cout) shape,
  so the ERK probability matches the reference's conv treatment —
  sparse_utils.py:163-169).  method: 'uniform'/'random',
  'erdos_renyi', or 'erdos_renyi_kernel'.
  """
  return SparsityMap(distributions.get_sparsities(
      dict(shapes), method, default_sparsity,
      custom_sparsity_map=custom_sparsity_map,
      erk_power_scale=erk_power_scale))


def spec_for_model(
    shapes: Mapping[str, Tuple[int, ...]],
    method: str,
    default_sparsity: float,
    custom_sparsity_map: Optional[Mapping[str, float]] = None,
    erk_power_scale: float = distributions.DEFAULT_ERK_SCALE,
) -> SparsitySpec:
  """Like make_sparsity_map, but returns the plain float for uniform
  distributions (keeps uniform configs bit-identical to the historic
  float path, including its floor arithmetic on the global block grid)."""
  if method in ('uniform', 'random') and not custom_sparsity_map:
    return float(default_sparsity)
  return make_sparsity_map(shapes, method, default_sparsity,
                           custom_sparsity_map, erk_power_scale)


def achieved_block_sparsity(
    shapes: Mapping[str, Tuple[int, ...]],
    spec: SparsitySpec,
    block: Tuple[int, int],
) -> float:
  """Global parameter sparsity actually realized at block granularity:
  per layer, n_active = n_blocks - floor(s * n_blocks) blocks of
  bk*bn params each.  Diagnostic for tests/reports."""
  bk, bn = block
  total = 0
  active = 0
  for path, shape in shapes.items():
    k2d = int(np.prod(shape[:-1]))
    n = int(shape[-1])
    if k2d % bk or n % bn:
      raise ValueError(f'{path}: shape {shape} not divisible by {block}')
    n_blocks = (k2d // bk) * (n // bn)
    s = resolve_sparsity(spec, path)
    n_act = n_blocks - distributions.get_n_zeros(n_blocks, s)
    total += n_blocks
    active += n_act
  return 1.0 - active / total

"""Device mesh + sharding helpers: the TPU-native distribution layer.

Replaces the reference's TPUEstimator/CrossShardOptimizer machinery
(imagenet_train_eval.py:363-365,737-755) with jax.sharding: one `Mesh`, a
batch sharded over the 'data' axis, replicated params/masks, and XLA (GSPMD)
inserting all collectives over ICI.  The two collective patterns RigL needs —
per-step gradient reduction and grow-score reduction at update steps
(sparse_optimizers_base.py:471-476) — both fall out of the same automatic
gradient psum, since grow scores are computed from the reduced gradient.

An optional 'model' axis shards large kernels (the final dense layer of
ResNet-50 and any kernel whose output dim divides the axis) for Megatron-
style tensor parallelism — beyond the reference's capabilities (DP only).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
  """Creates a ('data', 'model') mesh over the available devices."""
  devices = devices if devices is not None else jax.devices()
  n_total = len(devices)
  if n_data is None:
    n_data = n_total // n_model
  if n_data * n_model != n_total:
    raise ValueError(
        f'mesh {n_data}x{n_model} != {n_total} devices')
  dev_array = mesh_utils.create_device_mesh((n_data, n_model),
                                            devices=devices)
  return Mesh(dev_array, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Batch dim sharded over 'data'; feature dims replicated."""
  return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params: Any,
                   shard_model_axis: bool = False,
                   min_shard_size: int = 2 ** 16) -> Any:
  """Sharding tree for params: replicated by default; with
  `shard_model_axis`, large >=2D kernels shard their output dim over
  'model' when divisible (simple tensor parallelism for wide layers)."""
  n_model = mesh.shape['model']

  def spec_for(leaf):
    if (shard_model_axis and n_model > 1 and np.ndim(leaf) >= 2
        and np.size(leaf) >= min_shard_size
        and np.shape(leaf)[-1] % n_model == 0):
      return NamedSharding(
          mesh, P(*([None] * (np.ndim(leaf) - 1) + ['model'])))
    return NamedSharding(mesh, P())

  return jax.tree.map(spec_for, params)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh):
  return jax.device_put(batch, batch_sharding(mesh))

"""Model export for serving.

Capability parity with the reference's periodic SavedModel export
(ExportModelHook, imagenet_train_eval.py:668-700): package the trained
sparse model into a single self-contained artifact that an inference service
can load without the training framework state.

The export bakes masks into the weights (w * m — inference needs no mask
multiply), stores flax-serialized variables + a JSON manifest (model name,
kwargs, sparsity stats), and round-trips through `load_for_inference`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp

from rigl_tpu.sparsity import masks as masks_lib


def export_model(directory: str, model_name: str, model_kwargs: Dict[str, Any],
                 params, masks, batch_stats=None,
                 extra_manifest: Optional[Dict[str, Any]] = None) -> str:
  """Writes <dir>/model.msgpack + manifest.json; returns the directory."""
  os.makedirs(directory, exist_ok=True)
  eff = masks_lib.apply_masks(params, masks)
  payload = {
      'params': eff.get('params', eff),
      'batch_stats': batch_stats or {},
      # Masks ship alongside for sparse-aware runtimes / re-training.
      'masks': dict(masks),
  }
  with open(os.path.join(directory, 'model.msgpack'), 'wb') as f:
    f.write(flax.serialization.msgpack_serialize(
        jax.tree.map(lambda x: jax.device_get(x), payload)))
  manifest = {
      'model': model_name,
      'model_kwargs': {k: v for k, v in model_kwargs.items()
                       if isinstance(v, (int, float, str, bool, list))},
      'global_sparsity': float(masks_lib.calculate_sparsity(masks))
      if masks else 0.0,
      'per_layer_sparsity': {
          k: float(v)
          for k, v in masks_lib.per_layer_sparsity(masks).items()},
      **(extra_manifest or {}),
  }
  with open(os.path.join(directory, 'manifest.json'), 'w') as f:
    json.dump(manifest, f, indent=2)
  return directory


def load_for_inference(directory: str) -> Tuple[Any, Dict[str, Any]]:
  """Returns (apply_fn(x) -> logits, manifest)."""
  with open(os.path.join(directory, 'manifest.json')) as f:
    manifest = json.load(f)
  with open(os.path.join(directory, 'model.msgpack'), 'rb') as f:
    payload = flax.serialization.msgpack_restore(f.read())
  from rigl_tpu.models import create_model
  model = create_model(manifest['model'], **manifest.get('model_kwargs', {}))
  variables = {'params': payload['params']}
  if payload.get('batch_stats'):
    variables['batch_stats'] = payload['batch_stats']

  def apply_fn(x):
    return model.apply(variables, x, train=False)

  return apply_fn, manifest

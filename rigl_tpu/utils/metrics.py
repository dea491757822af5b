"""Metrics writing + profiling hooks.

Observability parity (SURVEY.md §5): the reference logs TF summaries through
the TPU host_call outfeed (imagenet_resnet/utils.py:59-80) — scalars for
losses, lr, per-layer mask sparsities, grad/param norms, drop_fraction, plus
JSON metric dumps in the JAX branch (experimental/jax/utils/utils.py:86-97).
Here: a JSONL metrics writer (one line per log step, trivially greppable and
plottable), standard metric builders, and jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Mapping, Optional

import jax
import jax.numpy as jnp

from rigl_tpu.sparsity import masks as masks_lib


class MetricsWriter:
  """Appends one JSON object per call to <dir>/metrics.jsonl."""

  def __init__(self, directory: str, filename: str = 'metrics.jsonl'):
    os.makedirs(directory, exist_ok=True)
    self.path = os.path.join(directory, filename)
    self._f = open(self.path, 'a')

  def write(self, step: int, metrics: Mapping[str, Any]):
    rec = {'step': int(step), 'time': time.time()}
    for k, v in metrics.items():
      try:
        rec[k] = float(v)
      except (TypeError, ValueError):
        rec[k] = v
    self._f.write(json.dumps(rec) + '\n')
    self._f.flush()

  def close(self):
    self._f.close()


def read_metrics(directory: str, filename: str = 'metrics.jsonl'):
  path = os.path.join(directory, filename)
  with open(path) as f:
    return [json.loads(line) for line in f if line.strip()]


def sparsity_summaries(masks: Mapping[str, jnp.ndarray]) -> Dict[str, Any]:
  """Global + per-layer mask sparsity scalars (utils.py:83-90 parity)."""
  if not masks:
    return {}
  out: Dict[str, Any] = {
      'global_sparsity': float(masks_lib.calculate_sparsity(masks))
  }
  for p, s in masks_lib.per_layer_sparsity(masks).items():
    out[f'sparsity/{p}'] = float(s)
  return out


def mask_images(masks: Mapping[str, jnp.ndarray]) -> Dict[str, Any]:
  """Per-layer mask *images* (imagenet_resnet/utils.py:83-90 with_img=True):
  each mask reshaped to 2D (rows = all-but-last dims), as uint8 0/255
  arrays ready for PNG/GIF encoding or npy dumps."""
  import numpy as np
  out = {}
  for p, m in masks.items():
    a = np.asarray(m)
    img = a.reshape(-1, a.shape[-1]) if a.ndim > 1 else a.reshape(1, -1)
    out[p] = (img > 0).astype(np.uint8) * 255
  return out


def write_mask_images(directory: str, step: int,
                      masks: Mapping[str, jnp.ndarray]) -> str:
  """Dumps mask images to <dir>/mask_images/step_<n>.npz (the host_call
  image-summary equivalent; analysis/visualize.py animates these)."""
  import numpy as np
  img_dir = os.path.join(directory, 'mask_images')
  os.makedirs(img_dir, exist_ok=True)
  path = os.path.join(img_dir, f'step_{step:08d}.npz')
  np.savez_compressed(path,
                      **{p.replace('/', '__'): v
                         for p, v in mask_images(masks).items()})
  return path


def norm_summaries(tree, prefix: str) -> Dict[str, float]:
  """Global L2 norm of a pytree (grad/param norm scalars)."""
  sq = sum(float(jnp.sum(jnp.square(x.astype(jnp.float32))))
           for x in jax.tree.leaves(tree))
  return {f'{prefix}_norm': sq ** 0.5}


def distance_to_init(params, init_params) -> Dict[str, float]:
  """L2 distance and cosine similarity to the initial params
  (rigl_tf2/train.py:347-390, experimental/jax utils :119-148)."""
  import numpy as np
  a = jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                       for x in jax.tree.leaves(params)])
  b = jnp.concatenate([x.reshape(-1).astype(jnp.float32)
                       for x in jax.tree.leaves(init_params)])
  dist = float(jnp.linalg.norm(a - b))
  cos = float(jnp.dot(a, b)
              / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12))
  return {'distance_to_init': dist, 'cosine_to_init': cos}


def snr_summaries(loss_fn, params, batch) -> Dict[str, float]:
  """Gradient signal-to-noise ratio over a batch.

  Parity with rl/tfagents/tf_sparse_utils.py:186-206 (log_snr): per-sample
  gradients (vmap of per-example grad), SNR = |mean / (std + 1e-10)| per
  parameter, summarized by mean and std.  Expensive — call sparingly.
  """
  def one_example(p, x, y):
    return loss_fn(p, jax.tree.map(lambda v: v[None], {'x': x, 'y': y}))

  per_sample = jax.vmap(jax.grad(one_example), in_axes=(None, 0, 0))(
      params, batch['x'], batch['y'])
  snrs = []
  for g in jax.tree.leaves(per_sample):
    g = g.astype(jnp.float32)
    mean = jnp.mean(g, axis=0)
    std = jnp.std(g, axis=0)
    snrs.append(jnp.abs(mean / (std + 1e-10)).reshape(-1))
  flat = jnp.concatenate(snrs)
  return {'snr_mean': float(jnp.mean(flat)), 'snr_std': float(jnp.std(flat))}


def per_class_metrics(logits, labels, num_classes: int) -> Dict[str, float]:
  """Per-class precision/recall (cifar_resnet/resnet_train_eval.py:141-168)."""
  preds = jnp.argmax(logits, axis=-1)
  out: Dict[str, float] = {}
  for c in range(num_classes):
    tp = jnp.sum((preds == c) & (labels == c)).astype(jnp.float32)
    fp = jnp.sum((preds == c) & (labels != c)).astype(jnp.float32)
    fn = jnp.sum((preds != c) & (labels == c)).astype(jnp.float32)
    out[f'precision/class_{c}'] = float(tp / jnp.maximum(tp + fp, 1.0))
    out[f'recall/class_{c}'] = float(tp / jnp.maximum(tp + fn, 1.0))
  return out


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
  """jax.profiler trace capture around a training region (view in
  TensorBoard/xprof).  No-op when log_dir is None."""
  if not log_dir:
    yield
    return
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTimer:
  """Steps/sec and examples/sec over a rolling window."""

  def __init__(self, batch_size: int):
    self.batch_size = batch_size
    self._last_t = time.time()
    self._last_step = 0

  def update(self, step: int) -> Dict[str, float]:
    now = time.time()
    dsteps = step - self._last_step
    dt = max(now - self._last_t, 1e-9)
    out = {
        'steps_per_sec': dsteps / dt,
        'examples_per_sec': dsteps * self.batch_size / dt,
    }
    self._last_t, self._last_step = now, step
    return out

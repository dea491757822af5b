"""Capture a TPU trace of the ResNet-50 sparse train step and print per-op
device times, using TF's xplane converter (no tensorboard UI needed).

Env knobs mirror bench.py: PROF_BLOCK="128,128", PROF_MIN_SPARSITY,
PROF_BATCH/PROF_IMAGE, PROF_METHOD (rigl|dense).

Usage (TPU): python - < scripts/profile_block_step.py
"""

import glob
import gzip
import json
import os
import time


def capture(trace_dir):
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax
  from rigl_tpu.models import registry
  from rigl_tpu.sparsity.schedules import UpdateSchedule
  from rigl_tpu.train import steps
  from rigl_tpu.transforms import algorithms
  from rigl_tpu.transforms.sparse_training import SparseTraining

  batch = int(os.environ.get('PROF_BATCH', 128))
  image = int(os.environ.get('PROF_IMAGE', 224))
  method = os.environ.get('PROF_METHOD', 'rigl')
  block_env = os.environ.get('PROF_BLOCK', '128,128')
  block = (tuple(int(v) for v in block_env.split(','))
           if block_env and method == 'rigl' else None)
  min_sp = float(os.environ.get('PROF_MIN_SPARSITY', '0.6'))
  conv3x3 = bool(int(os.environ.get('PROF_CONV3X3', '0')))

  model = registry.create_model('resnet', depth=50, num_classes=1000,
                                dtype=jnp.bfloat16, block=block)
  algo = (algorithms.RigL(schedule=UpdateSchedule(
      begin_step=0, end_step=25000, frequency=100, drop_fraction=0.3))
          if method == 'rigl' else algorithms.DENSE)
  st = SparseTraining(optax.sgd(0.1, momentum=0.9, nesterov=True), algo,
                      distribution='erdos_renyi_kernel', default_sparsity=0.8,
                      block=block)
  state = steps.init_train_state(jax.random.key(0), model, st,
                                 (batch, image, image, 3))
  fn = jax.jit(steps.make_train_step(
      model, st, weight_decay=1e-4, label_smoothing=0.1, block=block,
      block_conv3x3=conv3x3, block_min_sparsity=min_sp), donate_argnums=0)
  rng = np.random.default_rng(0)
  data = jax.device_put({
      'image': rng.normal(0, 1, (batch, image, image, 3)).astype(np.float32),
      'label': rng.integers(0, 1000, (batch,)).astype(np.int32)})
  for _ in range(3):
    state, metrics = fn(state, data)
  _ = float(metrics['loss'])
  import jax.profiler
  with jax.profiler.trace(trace_dir):
    for _ in range(3):
      state, metrics = fn(state, data)
    _ = float(metrics['loss'])


def report(trace_dir, top=60):
  from tensorflow.python.profiler.internal import _pywrap_profiler_plugin as p
  paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                    recursive=True)
  print('xplane files:', paths)
  if not paths:
    return
  try:
    data, _ = p.xspace_to_tools_data([paths[0]], 'framework_op_stats', {})
    rows = json.loads(data if isinstance(data, str) else data.decode())
    print(json.dumps(rows, indent=1)[:4000])
  except Exception as e:  # noqa: BLE001
    print('framework_op_stats failed:', e)
    data, _ = p.xspace_to_tools_data([paths[0]], 'trace_viewer', {})
    blob = data if isinstance(data, (bytes, bytearray)) else data.encode()
    try:
      blob = gzip.decompress(blob)
    except OSError:
      pass
    tr = json.loads(blob.decode())
    events = [e for e in tr.get('traceEvents', [])
              if e.get('ph') == 'X' and e.get('dur')]
    agg = {}
    for e in events:
      name = e['name']
      agg[name] = agg.get(name, 0) + e['dur']
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
      print(f'{dur / 1000.0:10.3f} ms  {name[:120]}')


if __name__ == '__main__':
  d = os.environ.get('PROF_DIR', '/tmp/prof_block')
  os.makedirs(d, exist_ok=True)
  capture(d)
  report(d)

"""PackedMobileNetV1: HBM state accounting + small-batch inference timing.

The MBv1 twin of scripts/rn50_packed_hbm.py — the reference's second
published model family (mobilenetv1_model.py:223-343; README.md:52-58
MBv1 RigL 75%/89% rows) on packed storage:

1. Peak-HBM accounting of the train step via XLA memory_analysis(),
   packed storage vs the dense-latent twin (the reference keeps full
   dense weights + dense optimizer slots at any sparsity).
2. Small-batch (1 / 8) inference step time, packed vs dense — the
   weight-HBM-bound regime (chained jitted forwards, final readback
   sync; bench.py _bench_step rationale).

  python scripts/mbv1_packed_hbm.py                        # TPU
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu MBV1_IMAGE=64 MBV1_WIDTH=0.25 \
      MBV1_ITERS=3 MBV1_BLOCK=16,16 python scripts/mbv1_packed_hbm.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTH = float(os.environ.get('MBV1_WIDTH', 1.0))
TRAIN_BATCH = int(os.environ.get('MBV1_TRAIN_BATCH', 128))
INFER_BATCHES = [int(b) for b in
                 os.environ.get('MBV1_INFER_BATCHES', '1,8').split(',')]
IMAGE = int(os.environ.get('MBV1_IMAGE', 224))
SPARSITIES = [float(s) for s in
              os.environ.get('MBV1_SPARSITIES', '0.75,0.89').split(',')]
BLOCK = tuple(int(b) for b in
              os.environ.get('MBV1_BLOCK', '128,128').split(','))
BM = int(os.environ.get('MBV1_BM', 512))
DTYPE = os.environ.get('MBV1_DTYPE', 'bfloat16')
ITERS = int(os.environ.get('MBV1_ITERS', 20))
WARMUP = int(os.environ.get('MBV1_WARMUP', 3))

from scripts.rn50_packed_hbm import (analyze, make_train_step,  # noqa: E402
                                     time_inference_with, tree_bytes)


def time_inference(model, variables, batch, dtype):
  return time_inference_with(model, variables, batch, dtype,
                             image=IMAGE, warmup=WARMUP, iters=ITERS)


def main():
  import jax
  import jax.numpy as jnp
  import optax

  from rigl_tpu.models.packed_convnet import (DenseMobileNetV1Twin,
                                              PackedMobileNetV1)

  dtype = jnp.dtype(DTYPE)
  rs = np.random.RandomState(0)
  xt = jnp.asarray(rs.randn(TRAIN_BATCH, IMAGE, IMAGE, 3), dtype)
  yt = jnp.asarray(rs.randint(0, 1000, TRAIN_BATCH), jnp.int32)
  tx = optax.sgd(0.05, momentum=0.9, nesterov=True)
  kw = dict(num_classes=1000, width_mult=WIDTH)
  out = {'width_mult': WIDTH, 'train_batch': TRAIN_BATCH, 'image': IMAGE,
         'block': list(BLOCK), 'dtype': DTYPE,
         'backend': jax.default_backend()}

  twin = DenseMobileNetV1Twin(block=BLOCK, dtype=dtype, **kw)
  tv = jax.jit(twin.init)(jax.random.key(0), xt[:1])
  opt_d = tx.init(tv['params'])
  rec = analyze(make_train_step(twin, tv, tx),
                (tv['params'], opt_d, xt, yt))
  rec['state_mb'] = round(
      (tree_bytes(tv['params']) + tree_bytes(opt_d)) / 2**20, 1)
  for b in INFER_BATCHES:
    rec[f'infer_b{b}_ms'] = round(time_inference(twin, tv, b, dtype) * 1e3,
                                  3)
  out['dense_latent'] = rec
  print(json.dumps({'dense_latent': rec}), flush=True)

  for sp in SPARSITIES:
    model = PackedMobileNetV1(sparsity=sp, block=BLOCK, bm=BM, dtype=dtype,
                              **kw)
    variables = jax.jit(model.init)(jax.random.key(0), xt[:1])
    opt_p = tx.init(variables['params'])
    rec = analyze(make_train_step(model, variables, tx),
                  (variables['params'], opt_p, xt, yt))
    rec['state_mb'] = round(
        (tree_bytes(variables['params']) + tree_bytes(opt_p)) / 2**20, 1)
    for b in INFER_BATCHES:
      rec[f'infer_b{b}_ms'] = round(
          time_inference(model, variables, b, dtype) * 1e3, 3)
    out[f'packed@{sp}'] = rec
    print(json.dumps({f'packed@{sp}': rec}), flush=True)
  print(json.dumps(out, indent=2))


if __name__ == '__main__':
  main()

"""PackedResNet-50: HBM state accounting + small-batch inference timing.

Two measurements on the full packed RN50 (models/packed_convnet.PackedResNet
— the reference's flagship family, resnet_model.py:577-731):

1. Peak-HBM accounting of the train step via the XLA compiler's own
   memory_analysis(), packed storage vs the dense-latent twin (the
   reference's representation: full dense weights + dense optimizer slots
   at any sparsity) — the RN50-scale version of the WRN table
   (scripts/wrn_packed_hbm.py, PERF.md round-3).

2. Small-batch (1 / 8) INFERENCE step time, packed vs dense.  At batch 1-8
   the forward is weight-HBM-bound (the decode regime, PERF.md round-3
   serving section), so packed storage's (1-s) weight-byte footprint should
   convert directly to latency — the regime where packed WINS on the
   reference's own flagship model.  Timing: chained jitted forwards with a
   final-value readback (bench.py _bench_step rationale; block_until_ready
   on donated outputs returns early over the axon tunnel).

  python scripts/rn50_packed_hbm.py                        # TPU
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu RN50_IMAGE=64 RN50_WIDTH=0.25 \
      RN50_ITERS=3 python scripts/rn50_packed_hbm.py       # CPU smoke
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTH = float(os.environ.get('RN50_WIDTH', 1.0))
TRAIN_BATCH = int(os.environ.get('RN50_TRAIN_BATCH', 128))
INFER_BATCHES = [int(b) for b in
                 os.environ.get('RN50_INFER_BATCHES', '1,8').split(',')]
IMAGE = int(os.environ.get('RN50_IMAGE', 224))
SPARSITIES = [float(s) for s in
              os.environ.get('RN50_SPARSITIES', '0.8,0.9').split(',')]
BLOCK = tuple(int(b) for b in
              os.environ.get('RN50_BLOCK', '128,128').split(','))
BM = int(os.environ.get('RN50_BM', 512))
DTYPE = os.environ.get('RN50_DTYPE', 'bfloat16')
ITERS = int(os.environ.get('RN50_ITERS', 20))
WARMUP = int(os.environ.get('RN50_WARMUP', 3))


def tree_bytes(tree):
  import jax
  return sum(int(np.prod(x.shape)) * x.dtype.itemsize
             for x in jax.tree.leaves(tree) if hasattr(x, 'shape'))


def analyze(step_fn, args):
  import jax
  compiled = jax.jit(step_fn).lower(*args).compile()
  ma = compiled.memory_analysis()
  return {
      'argument_mb': round(ma.argument_size_in_bytes / 2**20, 1),
      'output_mb': round(ma.output_size_in_bytes / 2**20, 1),
      'temp_mb': round(ma.temp_size_in_bytes / 2**20, 1),
      'total_mb': round((ma.argument_size_in_bytes + ma.output_size_in_bytes
                         + ma.temp_size_in_bytes) / 2**20, 1),
  }


def make_train_step(model, variables, tx):
  import jax
  import jax.numpy as jnp
  import optax
  packings = variables.get('packing', {})

  def loss_fn(params, xb, yb):
    lg = model.apply({'params': params, 'packing': packings} if packings
                     else {'params': params}, xb)
    ll = jax.nn.log_softmax(lg.astype(jnp.float32))
    return -jnp.mean(ll[jnp.arange(yb.shape[0]), yb])

  def step(params, opt_state, xb, yb):
    loss, g = jax.value_and_grad(loss_fn)(params, xb, yb)
    updates, opt_state = tx.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

  return step


def time_inference_with(model, variables, batch, dtype, *, image,
                        warmup, iters):
  """Chained jitted forwards: each consumes a summary of the previous
  output so the chain is sequential; sync on a final readback.  Shared
  by the MBv1 twin script (scripts/mbv1_packed_hbm.py) — the chaining +
  final-readback discipline is the load-bearing part (CLAUDE.md TPU
  timing notes), so it lives in exactly one place."""
  import jax
  import jax.numpy as jnp
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(batch, image, image, 3), dtype)
  packings = variables.get('packing', {})

  @jax.jit
  def fwd(x, bias):
    lg = model.apply({'params': variables['params'], 'packing': packings}
                     if packings else {'params': variables['params']}, x)
    # Chain seed: a scalar from the logits perturbs the next input.
    return lg, jnp.sum(lg.astype(jnp.float32)) * 1e-12 + bias

  bias = jnp.zeros((), jnp.float32)
  for _ in range(warmup):
    lg, bias = fwd(x + bias, bias)
  _ = float(bias)
  t0 = time.perf_counter()
  for _ in range(iters):
    lg, bias = fwd(x + bias, bias)
  _ = float(bias)
  return (time.perf_counter() - t0) / iters


def time_inference(model, variables, batch, dtype):
  return time_inference_with(model, variables, batch, dtype,
                             image=IMAGE, warmup=WARMUP, iters=ITERS)


def main():
  import jax
  import jax.numpy as jnp
  import optax

  from rigl_tpu.models.packed_convnet import DenseResNetTwin, PackedResNet

  dtype = jnp.dtype(DTYPE)
  rs = np.random.RandomState(0)
  xt = jnp.asarray(rs.randn(TRAIN_BATCH, IMAGE, IMAGE, 3), dtype)
  yt = jnp.asarray(rs.randint(0, 1000, TRAIN_BATCH), jnp.int32)
  tx = optax.sgd(0.05, momentum=0.9, nesterov=True)
  kw = dict(depth=50, num_classes=1000, width_mult=WIDTH)
  out = {'width_mult': WIDTH, 'train_batch': TRAIN_BATCH, 'image': IMAGE,
         'block': list(BLOCK), 'dtype': DTYPE,
         'backend': jax.default_backend()}

  twin = DenseResNetTwin(block=BLOCK, dtype=dtype, **kw)
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
    model = PackedResNet(sparsity=sp, block=BLOCK, bm=BM, dtype=dtype, **kw)
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

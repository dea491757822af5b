"""Peak-HBM accounting: WRN train step on PACKED spatial-conv storage vs
the same architecture with DENSE latent kernels (the reference's
representation: full dense weights + dense optimizer slots at any
sparsity, sparse_optimizers_base.py).

Uses the XLA compiler's own accounting (compiled.memory_analysis()) on the
jitted train step — argument bytes (params + optimizer slots + batch) and
temp bytes (activations/workspace) — so the number is the compiler's
committed allocation, not a sampled profile.  Run on the real chip:

  python scripts/wrn_packed_hbm.py                      # TPU
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu WRN_DEPTH=10 WRN_BATCH=8 \
      python scripts/wrn_packed_hbm.py                  # CPU smoke
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEPTH = int(os.environ.get('WRN_DEPTH', 22))
WIDTH = int(os.environ.get('WRN_WIDTH', 2))
BATCH = int(os.environ.get('WRN_BATCH', 256))
IMAGE = int(os.environ.get('WRN_IMAGE', 32))
SPARSITIES = [float(s) for s in
              os.environ.get('WRN_SPARSITIES', '0.8,0.95').split(',')]
BLOCK = tuple(int(b) for b in os.environ.get('WRN_BLOCK', '16,16').split(','))


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


def make_step(model, variables, tx, opt_state, x, y):
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

  return step, (variables['params'], opt_state, x, y)


def main():
  import jax
  import jax.numpy as jnp
  import optax

  from rigl_tpu.models.packed_convnet import (DenseWideResNetTwin,
                                              PackedWideResNet)

  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(BATCH, IMAGE, IMAGE, 3), jnp.float32)
  y = jnp.asarray(rs.randint(0, 10, BATCH), jnp.int32)
  tx = optax.sgd(0.05, momentum=0.9, nesterov=True)
  out = {'depth': DEPTH, 'width': WIDTH, 'batch': BATCH,
         'backend': jax.default_backend()}

  # Dense-latent arm (the reference's storage at ANY sparsity): the twin's
  # full (kh*kw*cin, cout) kernels + dense momentum slots.
  twin = DenseWideResNetTwin(depth=DEPTH, width=WIDTH, num_classes=10)
  tv = twin.init(jax.random.key(0), x[:1])
  opt_d = tx.init(tv['params'])
  step_d, args_d = make_step(twin, tv, tx, opt_d, x, y)
  out['dense_latent'] = analyze(step_d, args_d)
  out['dense_latent']['state_mb'] = round(
      (tree_bytes(tv['params']) + tree_bytes(opt_d)) / 2**20, 1)

  for sp in SPARSITIES:
    model = PackedWideResNet(depth=DEPTH, width=WIDTH, num_classes=10,
                             sparsity=sp, block=BLOCK)
    variables = model.init(jax.random.key(0), x[:1])
    opt_p = tx.init(variables['params'])
    step_p, args_p = make_step(model, variables, tx, opt_p, x, y)
    rec = analyze(step_p, args_p)
    rec['state_mb'] = round(
        (tree_bytes(variables['params']) + tree_bytes(opt_p)) / 2**20, 1)
    out[f'packed@{sp}'] = rec
  print(json.dumps(out, indent=2))


if __name__ == '__main__':
  main()

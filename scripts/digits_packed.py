"""Real-data accuracy on the PACKED block-sparse engine: sklearn's bundled
handwritten digits (1797 real scanned 8x8 images, zero-egress-safe) trained
end-to-end on PackedDense storage with RigL drop/grow on packed blocks
(transforms/packed_training.py).

This is the accuracy-side proof that packed storage is a first-class
training path, not a bench-only representation: weights, grads, and
momentum never exist densely except for the rare update-step dense-grad
view (RigL's grow score, sparse_optimizers_base.py:328-334).

Arms:
  dense       — same arch, dense nn.Dense kernels;
  packed_rigl — PackedDense @ SPARSITY with drop/grow every 100 steps;
  packed_static — PackedDense, mask frozen at init.

Arch: 784 -> 512 -> 256 -> 10; the two hidden matmuls are packed with
blocks (112,128)/(128,128); the 10-way head stays dense (the reference's
MNIST net also keeps its final layer dense, mnist_train_eval.py:269-272).

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/digits_packed.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get('DIGITS_STEPS', 2000))
SPARSITY = float(os.environ.get('DIGITS_SPARSITY', 0.9))
LR = float(os.environ.get('DIGITS_LR', 0.05))
BATCH = 100
UPDATE_EVERY = 100
UPDATE_END = int(STEPS * 0.75)
ARMS = os.environ.get('DIGITS_ARMS', 'dense,packed_rigl,packed_static'
                      ).split(',')

# (16,16) blocks give RigL real granularity (l1: 49x32 grid, 157 active at
# s=0.9).  VIA=dense_view executes packed storage through a differentiable
# unpack_dense + matmul — bit-identical semantics to the kernel path (whose
# float parity is covered by tests/test_packed_training.py) and fast on the
# 1-core CPU box; VIA=kernel runs the pallas packed_matmul (TPU-tiled
# blocks required: bn=128, bk%8==0).
VIA = os.environ.get('DIGITS_VIA', 'dense_view')
if VIA == 'kernel':
  BLOCKS = {'l1': (16, 128), 'l2': (16, 128)}
else:
  BLOCKS = {'l1': (16, 16), 'l2': (16, 16)}
WIDTHS = {'l1': (784, 512), 'l2': (512, 256)}
BM = 128


def load_digits_flat():
  """28x28 view of the 8x8 digits (same lossless kron x3 + pad as
  scripts/digits_accuracy.py), flattened to 784, deterministic 80/20."""
  from sklearn.datasets import load_digits
  x, y = load_digits(return_X_y=True)
  x = (x.reshape(-1, 8, 8) * (255.0 / 16.0)).round().clip(0, 255)
  x = np.kron(x, np.ones((1, 3, 3)))
  x = np.pad(x, ((0, 0), (2, 2), (2, 2))).reshape(-1, 784) / 255.0
  test = np.arange(len(x)) % 5 == 0
  return (x[~test].astype(np.float32), y[~test].astype(np.int32),
          x[test].astype(np.float32), y[test].astype(np.int32))


def build(arm, key):
  import jax
  import jax.numpy as jnp
  from rigl_tpu.layers.packed_dense import random_occupancy
  from rigl_tpu.ops.pallas.block_sparse_packed import make_packing
  from rigl_tpu.sparsity.distributions import get_n_zeros

  k1, k2, k3, ko = jax.random.split(key, 4)
  params, packings, n_active = {}, {}, {}
  if arm == 'dense':
    for name, (kin, kout) in WIDTHS.items():
      kk = {'l1': k1, 'l2': k2}[name]
      params[name] = (jax.random.normal(kk, (kin, kout))
                      / np.sqrt(kin)).astype(jnp.float32)
  else:
    for name, (kin, kout) in WIDTHS.items():
      bk, bn = BLOCKS[name]
      nk, nn_ = kin // bk, kout // bn
      na = nk * nn_ - get_n_zeros(nk * nn_, SPARSITY)
      kk = {'l1': k1, 'l2': k2}[name]
      ka, kb = jax.random.split(kk)
      packings[name] = make_packing(random_occupancy(ka, nk, nn_, na), na)
      params[name] = (jax.random.normal(kb, (na, bk, bn))
                      / np.sqrt(kin)).astype(jnp.float32)
      n_active[name] = na
  params['head_w'] = (jax.random.normal(k3, (256, 10)) / 16.0).astype(
      jnp.float32)
  params['head_b'] = jnp.zeros((10,), jnp.float32)
  return params, packings, n_active


def make_fns(arm, packings):
  import jax
  import jax.numpy as jnp
  from rigl_tpu.ops.pallas.block_sparse_packed import packed_matmul
  from rigl_tpu.transforms import packed_training as pt

  from rigl_tpu.ops.pallas.block_sparse_packed import unpack_dense

  def matmul(name, x, params, dense_view=None):
    if arm == 'dense' or dense_view is not None:
      w = params[name] if arm == 'dense' else dense_view[name]
      return x @ w
    if VIA == 'dense_view':
      # Differentiable dense view: unpack's vjp delivers exactly the
      # active blocks' grads back onto packed storage.
      return x @ unpack_dense(params[name], packings[name], BLOCKS[name])
    pad = (-x.shape[0]) % BM
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    y = packed_matmul(xp, params[name], packings[name], BLOCKS[name], BM)
    return y[:x.shape[0]]

  def logits(params, x, dense_view=None):
    h = jax.nn.relu(matmul('l1', x, params, dense_view))
    h = jax.nn.relu(matmul('l2', h, params, dense_view))
    return h @ params['head_w'] + params['head_b']

  def loss_fn(params, x, y, dense_view=None):
    lg = logits(params, x, dense_view)
    return jnp.mean(
        -jax.nn.log_softmax(lg)[jnp.arange(x.shape[0]), y])

  return logits, loss_fn


def run_arm(arm, data):
  import jax
  import jax.numpy as jnp
  import optax
  from rigl_tpu.transforms import packed_training as pt

  xtr, ytr, xte, yte = data
  params, packings, n_active = build(arm, jax.random.key(0))
  logits, loss_fn = make_fns(arm, packings)
  tx = optax.sgd(LR, momentum=0.9)
  opt = tx.init(params)

  @jax.jit
  def step(params, opt, x, y):
    loss, g = jax.value_and_grad(loss_fn)(params, x, y)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt, loss

  from rigl_tpu.ops.pallas.block_sparse_packed import unpack_dense
  from rigl_tpu.ops.block_mask import pool_to_blocks

  def update_masks(params, packings, opt, x, y, df):
    dv = {name: unpack_dense(params[name], packings[name], BLOCKS[name])
          for name in packings}

    def dense_loss(dv):
      return loss_fn(params, x, y, dense_view=dv)

    g = jax.grad(dense_loss)(dv)
    grids = {name: pool_to_blocks(jnp.abs(g[name]), BLOCKS[name], 'sum')
             for name in g}
    sub = {name: params[name] for name in packings}
    # opt state is over the FULL params dict; permute only packed leaves.
    out_pp, out_pk = {}, {}
    perm_tree = {}
    grown_tree = {}
    for name in packings:
      o = pt.packed_drop_grow(sub[name], packings[name], grids[name], df,
                              n_active[name])
      out_pp[name] = o.packed
      out_pk[name] = o.packing
      perm_tree[name] = pt.repack_permutation(packings[name], o.packing)
      grown_tree[name] = o.grown
    params = dict(params, **out_pp)

    def fix(leaf, name):
      if name is None:
        return leaf
      perm, grown = perm_tree[name], grown_tree[name]
      src = leaf[jnp.maximum(perm, 0)]
      return jnp.where(grown[:, None, None], jnp.zeros_like(src), src)

    name_tree = {k: (k if k in packings else None) for k in params}
    import optax as _optax
    opt = _optax.tree_map_params(tx, fix, opt, name_tree)
    return params, out_pk, opt

  rs = np.random.RandomState(0)
  n = len(xtr)
  for it in range(STEPS):
    idx = rs.randint(0, n, size=BATCH)
    x = jnp.asarray(xtr[idx])
    y = jnp.asarray(ytr[idx])
    if (arm == 'packed_rigl' and it % UPDATE_EVERY == 0 and 0 < it
        and it <= UPDATE_END):
      df = 0.3 * 0.5 * (1 + np.cos(np.pi * it / UPDATE_END))
      params, packings, opt = update_masks(params, packings, opt, x, y, df)
      logits, loss_fn = make_fns(arm, packings)

      @jax.jit
      def step(params, opt, x, y):  # noqa: F811 — new packing closure
        loss, g = jax.value_and_grad(loss_fn)(params, x, y)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss
    else:
      params, opt, loss = step(params, opt, x, y)

  import jax.numpy as jnp2
  pred = np.asarray(jnp2.argmax(logits(params, jnp2.asarray(xte)), -1))
  acc = float((pred == yte).mean())
  res = {'arm': arm, 'sparsity': 0.0 if arm == 'dense' else SPARSITY,
         'eval_top_1': round(acc, 4), 'steps': STEPS}
  print(json.dumps(res))
  return res


def main():
  data = load_digits_flat()
  print(f'# digits: {len(data[0])} train / {len(data[2])} test')
  out = {}
  for arm in ARMS:
    out[arm] = run_arm(arm, data)
  print(json.dumps(out))
  return out


if __name__ == '__main__':
  main()

"""End-to-end block-sparse training benchmark: 3x4096 MLP, full train step
(fwd + bwd + SGD) through BlockSparseDense vs dense nn.Dense.

Methodology per PERF.md: scan-chained steps with a matched harness floor
(same scan, trivial body) subtracted, single readback sync.

  python scripts/bench_blocksparse_mlp.py            # on TPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.layers import BlockSparseDense
from rigl_tpu.ops.block_mask import random_block_mask
from rigl_tpu.ops.pallas.block_sparse_v6 import (block_sparse_matmul_v6,
                                                 make_packing)

WIDTH = int(os.environ.get('MLP_WIDTH', 4096))
DEPTH = int(os.environ.get('MLP_DEPTH', 3))
BATCH = int(os.environ.get('MLP_BATCH', 1024))
ITERS = int(os.environ.get('MLP_ITERS', 100))
BLOCK = (512, 512)
SPARSITY = float(os.environ.get('MLP_SPARSITY', 0.8))
# 'v6' (auto-pipelined entry grid, premasked weights, packing built once —
# mirrors the trainer's premask_params + static-count invariants) or
# 'layer' (BlockSparseDense module path: v3 kernel, per-step mask multiply).
ENGINE = os.environ.get('MLP_ENGINE', 'v6')


class DenseMLP(nn.Module):
  # param_dtype matches the packed arm's bf16 storage so the dense
  # baseline's optimizer traffic is not handicapped by f32 slots.
  @nn.compact
  def __call__(self, x):
    for i in range(DEPTH):
      x = nn.Dense(WIDTH, use_bias=False, dtype=jnp.bfloat16,
                   param_dtype=jnp.bfloat16, name=f'd{i}')(x)
      x = nn.relu(x)
    return x


class BlockSparseMLP(nn.Module):
  @nn.compact
  def __call__(self, x):
    for i in range(DEPTH):
      x = BlockSparseDense(WIDTH, block=BLOCK, bm=512, use_bias=False,
                           dtype=jnp.bfloat16, name=f'd{i}')(x)
      x = nn.relu(x)
    return x


def make_packed_train_scan(params, packings):
  """Train scan on PACKED storage: weights, grads, and momentum all
  (n_active, bk, bn) — optimizer traffic scales with density and dw never
  materializes densely."""
  from rigl_tpu.ops.pallas.block_sparse_packed import packed_matmul
  tx = optax.sgd(1e-4, momentum=0.9)
  opt_state = tx.init(params)

  def loss_fn(params, x):
    for i in range(DEPTH):
      x = packed_matmul(x, params[f'd{i}'], packings[i], BLOCK, 512)
      x = nn.relu(x)
    return jnp.mean(x.astype(jnp.float32) ** 2)

  @jax.jit
  def run(x, params, opt_state):
    def body(carry, _):
      params, opt_state = carry
      g = jax.grad(loss_fn)(params, x)
      updates, opt_state = tx.update(g, opt_state, params)
      params = optax.apply_updates(params, updates)
      return (params, opt_state), ()
    (p2, _), _ = jax.lax.scan(body, (params, opt_state), None, length=ITERS)
    return p2[f'd{DEPTH - 1}']

  return run, params, opt_state


def make_v6_train_scan(params, packings):
  """Train scan on the v6 path: weights stored premasked, dw masked by the
  kernel's vjp, so momentum stays zero at inactive blocks — the premask
  invariant holds with no per-step mask multiply anywhere."""
  tx = optax.sgd(1e-4, momentum=0.9)
  opt_state = tx.init(params)

  def loss_fn(params, x):
    for i in range(DEPTH):
      x = block_sparse_matmul_v6(x, params[f'd{i}'], packings[i], BLOCK, 512)
      x = nn.relu(x)
    return jnp.mean(x.astype(jnp.float32) ** 2)

  @jax.jit
  def run(x, params, opt_state):
    def body(carry, _):
      params, opt_state = carry
      g = jax.grad(loss_fn)(params, x)
      updates, opt_state = tx.update(g, opt_state, params)
      params = optax.apply_updates(params, updates)
      return (params, opt_state), ()
    (p2, _), _ = jax.lax.scan(body, (params, opt_state), None, length=ITERS)
    return p2[f'd{DEPTH - 1}']

  return run, params, opt_state


def bench(run, x, label, *extra):
  c = run(x, *extra)
  _ = float(jnp.sum(jnp.isnan(c).astype(jnp.float32)))
  t = time.perf_counter()
  c = run(x, *extra)
  _ = float(jnp.sum(jnp.isnan(c).astype(jnp.float32)))
  dt = (time.perf_counter() - t) / ITERS
  print(f'{label}: {dt * 1e6:.1f} us/step')
  return dt


def make_train_scan(model, variables, with_masks=False):
  # Masks are a traced ARGUMENT, not a closure constant: 3x4096x4096 f32
  # constants embedded in the program blew the tunnel's compile-request
  # size limit (HTTP 413).
  tx = optax.sgd(1e-4, momentum=0.9)
  params = variables['params']
  opt_state = tx.init(params)

  def loss_fn(params, masks, x):
    v = {'params': params}
    if with_masks:
      v['masks'] = masks
    out = model.apply(v, x)
    target = jnp.zeros_like(out)
    return jnp.mean((out - target).astype(jnp.float32) ** 2)

  @jax.jit
  def run(x, masks=None):
    def body(carry, _):
      params, opt_state = carry
      g = jax.grad(loss_fn)(params, masks, x)
      updates, opt_state = tx.update(g, opt_state, params)
      params = optax.apply_updates(params, updates)
      return (params, opt_state), ()
    (params2, _), _ = jax.lax.scan(body, (params, opt_state), None,
                                   length=ITERS)
    return params2[f'd{DEPTH - 1}']['kernel']

  return run


def main():
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(BATCH, WIDTH) * 0.01, jnp.bfloat16)

  @jax.jit
  def floor_run(x):
    def body(c, _):
      return c + 1.0, ()
    c, _ = jax.lax.scan(body, x, None, length=ITERS)
    return c

  floor = bench(floor_run, x, 'harness floor')

  dense = DenseMLP()
  dv = dense.init(jax.random.key(0), x)
  t_dense = bench(make_train_scan(dense, dv), x, 'dense train step')

  if ENGINE == 'packed':
    from rigl_tpu.ops.pallas.block_sparse_packed import (make_packing as
                                                         make_packing_p,
                                                         pack_dense)
    nb = (WIDTH // BLOCK[0], WIDTH // BLOCK[1])
    packings, params = [], {}
    for i in range(DEPTH):
      mask_i = random_block_mask(
          jax.random.fold_in(jax.random.key(1), i), (WIDTH, WIDTH),
          SPARSITY, BLOCK)
      occ = (mask_i.reshape(nb[0], BLOCK[0], nb[1], BLOCK[1])
             .max(axis=(1, 3)) > 0).astype(jnp.int32)
      pk = make_packing_p(occ, int(np.asarray(occ).sum()))
      packings.append(jax.device_put(pk))
      wm = (dv['params'][f'd{i}']['kernel'] * mask_i).astype(jnp.bfloat16)
      params[f'd{i}'] = jax.device_put(pack_dense(wm, pk, BLOCK))
    run, params, opt_state = make_packed_train_scan(params, packings)
    t_sparse = bench(run, x, f'packed train step (s={SPARSITY})',
                     params, opt_state)
  elif ENGINE == 'v6':
    masks = {i: random_block_mask(
        jax.random.fold_in(jax.random.key(1), i), (WIDTH, WIDTH), SPARSITY,
        BLOCK) for i in range(DEPTH)}
    nb = (WIDTH // BLOCK[0], WIDTH // BLOCK[1])
    packings = []
    params = {}
    for i in range(DEPTH):
      occ = (masks[i].reshape(nb[0], BLOCK[0], nb[1], BLOCK[1])
             .max(axis=(1, 3)) > 0).astype(jnp.int32)
      packings.append(jax.device_put(
          make_packing(occ, int(np.asarray(occ).sum()))))
      params[f'd{i}'] = jax.device_put(
          (dv['params'][f'd{i}']['kernel'] * masks[i]).astype(jnp.bfloat16))
    run, params, opt_state = make_v6_train_scan(params, packings)
    t_sparse = bench(run, x, f'block-sparse v6 train step (s={SPARSITY})',
                     params, opt_state)
  else:
    sparse = BlockSparseMLP()
    sv = sparse.init(jax.random.key(0), x)
    masks = jax.device_put({f'd{i}': {'kernel': random_block_mask(
        jax.random.fold_in(jax.random.key(1), i), (WIDTH, WIDTH), SPARSITY,
        BLOCK)} for i in range(DEPTH)})
    t_sparse = bench(make_train_scan(sparse, sv, with_masks=True), x,
                     f'block-sparse train step (s={SPARSITY})', masks)

  net_d = t_dense - floor
  net_s = t_sparse - floor
  print(f'net dense: {net_d * 1e6:.1f} us  net sparse: {net_s * 1e6:.1f} us '
        f'ratio: {net_s / net_d:.3f} (north star <= 0.6)')
  return t_dense, t_sparse


if __name__ == '__main__':
  main()

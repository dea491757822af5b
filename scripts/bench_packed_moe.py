"""Packed block-sparse MoE train-step benchmark vs the dense twin.

2-layer Switch-MoE decoder (top-1 routing, 8 experts, capacity factor 2)
with every parameter matmul on packed storage in the sparse arm: attention
projections per-token PackedDense, expert fc1/fc2 kernels expert-stacked
packed `(E, cap, bk, bn)` (models/packed_moe.py).  The dense twin runs the
IDENTICAL router/dispatch/combine math with dense `(E, K, N)` expert
kernels — the delta is pure storage/compute representation, router and
all_to_all-free single-chip dispatch einsums are the shared honest mass.
Methodology per PERF.md: scan-chained steps, matched trivial-body scan
floor subtracted, one readback sync.

  python scripts/bench_packed_moe.py          # on TPU
  MOE_SPARSITY=0.9 python scripts/bench_packed_moe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.models.packed_moe import (DenseMoETransformer,
                                        PackedMoETransformer)

D_MODEL = int(os.environ.get('MOE_D_MODEL', 1024))
D_FF = int(os.environ.get('MOE_D_FF', 4096))
LAYERS = int(os.environ.get('MOE_LAYERS', 2))
HEADS = int(os.environ.get('MOE_HEADS', 16))
SEQ = int(os.environ.get('MOE_SEQ', 512))
BATCH = int(os.environ.get('MOE_BATCH', 4))
EXPERTS = int(os.environ.get('MOE_EXPERTS', 8))
CAPACITY = float(os.environ.get('MOE_CAPACITY', 2.0))
ITERS = int(os.environ.get('MOE_ITERS', 30))
SPARSITY = float(os.environ.get('MOE_SPARSITY', 0.8))
BLOCK = tuple(int(b) for b in os.environ.get('MOE_BLOCK', '256,256'
                                             ).split(','))
BM = int(os.environ.get('MOE_BM', 512))


def make_train_scan(model, variables):
  tx = optax.sgd(1e-4, momentum=0.9)
  params = variables['params']
  extra = {k: v for k, v in variables.items()
           if k not in ('params', 'intermediates')}
  opt_state = tx.init(params)

  def loss_fn(params, x):
    out, inter = model.apply(dict(extra, params=params), x,
                             mutable=['intermediates'])
    aux = sum(jax.tree.leaves(inter['intermediates']))
    return jnp.mean(out.astype(jnp.float32) ** 2) + 0.01 * aux

  @jax.jit
  def run(x, params, opt_state):
    def body(carry, _):
      params, opt_state = carry
      g = jax.grad(loss_fn)(params, x)
      updates, opt_state = tx.update(g, opt_state, params)
      params = optax.apply_updates(params, updates)
      return (params, opt_state), ()
    (p2, _), _ = jax.lax.scan(body, (params, opt_state), None, length=ITERS)
    return p2['ln_f']['scale']

  return run, params, opt_state


def bench(run, x, label, *extra):
  c = run(x, *extra)
  _ = float(jnp.sum(jnp.isnan(c).astype(jnp.float32)))
  t = time.perf_counter()
  c = run(x, *extra)
  _ = float(jnp.sum(jnp.isnan(c).astype(jnp.float32)))
  dt = (time.perf_counter() - t) / ITERS
  print(f'{label}: {dt * 1e6:.1f} us/step', flush=True)
  return dt


def main():
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(BATCH, SEQ, D_MODEL) * 0.02, jnp.bfloat16)

  @jax.jit
  def floor_run(x):
    def body(c, _):
      return c + 1.0, ()
    c, _ = jax.lax.scan(body, x, None, length=ITERS)
    return c

  floor = bench(floor_run, x, 'harness floor')

  kw = dict(num_layers=LAYERS, d_model=D_MODEL, d_ff=D_FF, num_heads=HEADS,
            num_experts=EXPERTS, capacity_factor=CAPACITY,
            dtype=jnp.bfloat16)
  dense = DenseMoETransformer(**kw)
  dv = dense.init(jax.random.key(0), x)
  run_d, params_d, opt_d = make_train_scan(dense, dv)
  t_dense = bench(run_d, x, 'dense MoE step', params_d, opt_d)

  packed = PackedMoETransformer(sparsity=SPARSITY, block=BLOCK, bm=BM, **kw)
  pv = packed.init(jax.random.key(0), x)
  run_p, params_p, opt_p = make_train_scan(packed, pv)
  t_packed = bench(run_p, x, f'packed MoE step (s={SPARSITY})',
                   params_p, opt_p)

  net_d, net_s = t_dense - floor, t_packed - floor
  print(f'net dense: {net_d * 1e6:.1f} us  net packed: {net_s * 1e6:.1f} us '
        f'ratio: {net_s / net_d:.3f} gross: {t_dense / t_packed:.2f}x',
        flush=True)
  return t_dense, t_packed


if __name__ == '__main__':
  main()

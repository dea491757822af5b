"""Packed block-sparse TRANSFORMER train-step benchmark vs the dense twin.

2-layer decoder blocks at GPT-medium-ish width (d_model 2048, d_ff 8192,
16 heads), seq 512, batch 4 (2048 tokens), bf16 compute.  All parameter
matmuls (fused QKV, out-proj, both FFN matmuls) run on packed storage in
the sparse arm; attention math and LayerNorms are dense in BOTH arms (the
shared, honest mass).  Methodology per PERF.md: scan-chained steps, a
matched trivial-body scan floor subtracted, one readback sync.

  python scripts/bench_packed_transformer.py          # on TPU
  TR_SPARSITY=0.9 python scripts/bench_packed_transformer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)

D_MODEL = int(os.environ.get('TR_D_MODEL', 2048))
D_FF = int(os.environ.get('TR_D_FF', 8192))
LAYERS = int(os.environ.get('TR_LAYERS', 2))
HEADS = int(os.environ.get('TR_HEADS', 16))
SEQ = int(os.environ.get('TR_SEQ', 512))
BATCH = int(os.environ.get('TR_BATCH', 4))
ITERS = int(os.environ.get('TR_ITERS', 30))
SPARSITY = float(os.environ.get('TR_SPARSITY', 0.8))
BLOCK = tuple(int(b) for b in os.environ.get('TR_BLOCK', '512,512'
                                             ).split(','))
BM = int(os.environ.get('TR_BM', 512))
# Fused flash-attention core in BOTH arms (TPU only; shrinks the shared
# attention mass honestly — see models/packed_transformer.py).
FUSED = bool(int(os.environ.get('TR_FUSED', '0')))


def make_train_scan(model, variables):
  tx = optax.sgd(1e-4, momentum=0.9)
  params = variables['params']
  extra = {k: v for k, v in variables.items() if k != 'params'}
  opt_state = tx.init(params)

  def loss_fn(params, x):
    out = model.apply(dict(extra, params=params), x)
    return jnp.mean(out.astype(jnp.float32) ** 2)

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
  print(f'{label}: {dt * 1e6:.1f} us/step')
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
            dtype=jnp.bfloat16, fused_attention=FUSED)
  dense = DenseTransformer(**kw)
  dv = dense.init(jax.random.key(0), x)
  run_d, params_d, opt_d = make_train_scan(dense, dv)
  t_dense = bench(run_d, x, 'dense transformer step', params_d, opt_d)

  packed = PackedTransformer(sparsity=SPARSITY, block=BLOCK, bm=BM, **kw)
  pv = packed.init(jax.random.key(0), x)
  run_p, params_p, opt_p = make_train_scan(packed, pv)
  t_packed = bench(run_p, x, f'packed transformer step (s={SPARSITY})',
                   params_p, opt_p)

  net_d, net_s = t_dense - floor, t_packed - floor
  print(f'net dense: {net_d * 1e6:.1f} us  net packed: {net_s * 1e6:.1f} us '
        f'ratio: {net_s / net_d:.3f} gross: {t_dense / t_packed:.2f}x')
  return t_dense, t_packed


if __name__ == '__main__':
  main()

"""Per-shape packed-vs-dense matmul microbench (fwd + full grad), used to
localize the transformer-arm efficiency gap.  Scan-chained ITERS steps,
matched floor subtracted, one readback — same methodology as the e2e
benches (PERF.md); per-shape RATIOS are the signal, not absolute times.

  python scripts/bench_mm_shapes.py            # transformer shapes
  MM_SHAPES="2048,2048,6144" python scripts/bench_mm_shapes.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.pallas import block_sparse_packed as bsp

SPARSITY = float(os.environ.get('MM_SPARSITY', 0.8))
ITERS = int(os.environ.get('MM_ITERS', 50))
BLOCK = tuple(int(b) for b in os.environ.get('MM_BLOCK', '512,512'
                                             ).split(','))
SHAPES = [tuple(int(v) for v in s.split(','))
          for s in os.environ.get(
              'MM_SHAPES',
              '2048,2048,6144;2048,2048,2048;2048,2048,8192;2048,8192,2048'
          ).split(';')]


def bench(run, *args):
  c = run(*args)
  jax.block_until_ready(c)
  _ = float(jnp.asarray(c).ravel()[0])
  t = time.perf_counter()
  c = run(*args)
  _ = float(jnp.asarray(c).ravel()[0])
  return (time.perf_counter() - t) / ITERS


def main():
  rs = np.random.RandomState(0)
  bk, bn = BLOCK
  x0 = jnp.asarray(rs.randn(8, 8) * 0.1, jnp.bfloat16)

  @jax.jit
  def floor_run(x):
    c, _ = jax.lax.scan(lambda c, _: (c + 1.0, ()), x, None, length=ITERS)
    return c

  floor = bench(floor_run, x0)
  print(f'floor {floor * 1e6:.1f} us', flush=True)

  for m, kdim, n in SHAPES:
    nk, nn = kdim // bk, n // bn
    n_active = max(1, int(round((1 - SPARSITY) * nk * nn)))
    flat = np.zeros(nk * nn, np.int32)
    flat[rs.choice(nk * nn, n_active, replace=False)] = 1
    packing = bsp.make_packing(jnp.asarray(flat.reshape(nk, nn)), n_active)
    wp = jnp.asarray(rs.randn(n_active, bk, bn) * 0.02, jnp.bfloat16)
    wd = jnp.asarray(rs.randn(kdim, n) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rs.randn(m, kdim) * 0.1, jnp.bfloat16)

    def packed_loss(x, wp):
      y = bsp.packed_matmul(x, wp, packing, BLOCK, 512)
      return jnp.sum(y.astype(jnp.float32) ** 2)

    def dense_loss(x, wd):
      y = jnp.dot(x, wd)
      return jnp.sum(y.astype(jnp.float32) ** 2)

    def make_run(loss):
      @jax.jit
      def run(x, w):
        def body(w, _):
          dw = jax.grad(loss, argnums=1)(x, w)
          return w - 1e-6 * dw.astype(w.dtype), ()
        w2, _ = jax.lax.scan(body, w, None, length=ITERS)
        return w2
      return run

    t_p = bench(make_run(packed_loss), x, wp)
    t_d = bench(make_run(dense_loss), x, wd)
    np_, nd = t_p - floor, t_d - floor
    flops = 3 * 2.0 * m * kdim * n            # fwd+dx+dw
    rec = {'shape': [m, kdim, n], 'n_act': n_active,
           'dense_us': round(nd * 1e6, 1), 'packed_us': round(np_ * 1e6, 1),
           'net_ratio': round(np_ / nd, 3),
           'ideal_ratio': round(n_active / (nk * nn), 3),
           'tflops_dense': round(flops / nd / 1e12, 1),
           'tflops_packed_active': round(
               flops * n_active / (nk * nn) / np_ / 1e12, 1)}
    print(json.dumps(rec), flush=True)


if __name__ == '__main__':
  main()

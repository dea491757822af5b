"""Same-session arms comparison for the block-sparse matmul kernels at the
compute-bound MLP shape — the measurement that decides whether the matmul
kernels' round-1 'wins' were real or session noise.

Round-1 measured v3 at 1.4x XLA dense in a session where XLA dense itself
read 1032 us; the round-2 pinned ceiling implies ~210 us for this shape
(34.4 GFLOP at ~180 TF/s net) — that session was noise.  The e2e MLP train
bench (bench_blocksparse_mlp.py) has the sparse arm 3.2x SLOWER than dense.
This harness times every arm back-to-back in one process on the sound scan
recipe (jit'd lax.scan, length >= 128, one readback, min over reps) so the
comparison is same-session.

Arms (fwd matmul only, (M, K, N) = (1024, 4096, 4096) bf16 by default):
  xla_dense    y = x @ w
  xla_masked   y = x @ (mask * w)        (capability-mode execution)
  pallas_dense tiled Pallas matmul       (kernel-overhead control)
  v3@d         block-gathered w          (density d in {1.0, 0.2, 0.1})
  v4@d         flat-packed entry grid
  v3big@d      v3 with bm = M (single row panel)

  python scripts/bench_mlp_arms.py            # on TPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.block_mask import random_block_mask
from rigl_tpu.ops.pallas.block_sparse_v3 import (block_sparse_matmul_v3,
                                                 pallas_dense_matmul)
from rigl_tpu.ops.pallas.block_sparse_v4 import (block_sparse_matmul_v4,
                                                 pack_flat_active)
from rigl_tpu.ops.pallas.block_sparse_v6 import (block_sparse_matmul_v6,
                                                 make_packing)

M = int(os.environ.get('ARMS_M', 1024))
K = int(os.environ.get('ARMS_K', 4096))
N = int(os.environ.get('ARMS_N', 4096))
BLOCK = (512, 512)
LENGTH = int(os.environ.get('ARMS_LEN', 256))
REPS = 3


def scan_time(fn, x):
  @jax.jit
  def run(x0):
    def body(c, _):
      y = fn(c)
      # Keep the chain live: feed a slice of y back into the carry.
      return c + 1e-12 * y[:, :K].astype(c.dtype), None
    c, _ = jax.lax.scan(body, x0, None, length=LENGTH)
    return c
  c = run(x)
  _ = float(np.asarray(jax.device_get(c[0, 0])))
  best = float('inf')
  for _ in range(REPS):
    t0 = time.perf_counter()
    c = run(x)
    _ = float(np.asarray(jax.device_get(c[0, 0])))
    best = min(best, time.perf_counter() - t0)
  return best / LENGTH


def main():
  print(f'# backend={jax.default_backend()} M={M} K={K} N={N} len={LENGTH}',
        flush=True)
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(M, K) * 0.05, jnp.bfloat16)
  w = jnp.asarray(rs.randn(K, N) * 0.02, jnp.bfloat16)
  results = {}

  def report(name, t):
    results[name] = round(t * 1e6, 1)
    print(f'{name}: {t * 1e6:.1f} us', flush=True)

  only = os.environ.get('ARMS_ONLY', '')

  def want(name):
    return not only or any(name.startswith(p) for p in only.split(','))

  if want('xla_dense'):
    report('xla_dense', scan_time(lambda c: c @ w, x))
  if want('pallas_dense'):
    report('pallas_dense', scan_time(
        lambda c: pallas_dense_matmul(c, w), x))

  for d in (1.0, 0.2, 0.1):
    bmask = (random_block_mask(jax.random.key(1), (K, N), 1.0 - d, BLOCK)
             if d < 1.0 else jnp.ones((K, N), jnp.float32))
    occ = (bmask.reshape(K // BLOCK[0], BLOCK[0],
                         N // BLOCK[1], BLOCK[1]).max(axis=(1, 3))
           > 0).astype(jnp.int32)
    wm = (w * bmask).astype(jnp.bfloat16)
    tag = f'{d:.1f}'
    if want('xla_masked'):
      report(f'xla_masked@{tag}', scan_time(lambda c: c @ wm, x))
    if want('v3@'):
      report(f'v3@{tag}', scan_time(
          lambda c: block_sparse_matmul_v3(c, wm, occ, BLOCK, 512), x))
    if want('v3big'):
      report(f'v3big@{tag}', scan_time(
          lambda c: block_sparse_matmul_v3(c, wm, occ, BLOCK, M), x))
    if want('v4@'):
      n_active = int(np.asarray(occ).sum())
      cols, rows = pack_flat_active(occ, n_active)
      report(f'v4@{tag}', scan_time(
          lambda c: block_sparse_matmul_v4(c, wm, cols, rows, BLOCK, 512),
          x))
    if want('v6@'):
      n_active = int(np.asarray(occ).sum())
      packing = jax.device_put(make_packing(occ, n_active))
      report(f'v6@{tag}', scan_time(
          lambda c: block_sparse_matmul_v6(c, wm, packing, BLOCK, 512), x))
    if want('v6grad'):
      n_active = int(np.asarray(occ).sum())
      packing = jax.device_put(make_packing(occ, n_active))

      def fwd_bwd(c):
        y, vjp = jax.vjp(
            lambda cc, ww: block_sparse_matmul_v6(cc, ww, packing, BLOCK,
                                                  512), c, wm)
        dx, dw = vjp(y)
        return dx + 1e-12 * dw[: , :1].T  # keep both grads live
      report(f'v6grad@{tag}', scan_time(fwd_bwd, x))

  print(json.dumps(results))


if __name__ == '__main__':
  main()

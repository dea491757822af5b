"""Per-layer TPU micro-bench: ResNet-50's 1x1 conv shapes as matmuls.

For each (M, K, N) that block execution routes through the v3 kernel at
batch 128 / 224x224, times fwd and fwd+bwd for:
  * XLA dense matmul (the execution ceiling),
  * dense-times-mask (capability-parity execution),
  * block_sparse_matmul_v3 at the layer's approximate ERK density.

Methodology per CLAUDE.md: chain iterations through a lax.scan carry inside
ONE jit and sync on a value readback (per-call dispatch pipelines on the
remote backend).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.block_mask import expand_from_blocks
from rigl_tpu.ops.pallas.block_sparse_v3 import block_sparse_matmul_v3

# (name, M, K, N, approx ERK density at 80% overall)
SHAPES = [
    ('g2_conv1a', 100352, 256, 128, 0.55),
    ('g2_conv3', 100352, 128, 512, 0.55),
    ('g2_conv1b', 100352, 512, 128, 0.55),
    ('g2_proj', 100352, 256, 512, 0.45),
    ('g3_conv1a', 25088, 512, 256, 0.35),
    ('g3_conv3', 25088, 256, 1024, 0.35),
    ('g3_conv1b', 25088, 1024, 256, 0.35),
    ('g3_proj', 25088, 512, 1024, 0.30),
    ('g4_conv1a', 6272, 1024, 512, 0.20),
    ('g4_conv3', 6272, 512, 2048, 0.20),
    ('g4_conv1b', 6272, 2048, 512, 0.20),
    ('g4_proj', 6272, 1024, 2048, 0.15),
]

BLOCK = (128, 128)
BM = 512


def _pad_rows(m, bm):
  return ((m + bm - 1) // bm) * bm


def time_fn(fn, args, iters=30, warmup=3):
  """Scan-chain `fn` (carry -> carry) and time one jit call."""
  @jax.jit
  def run(c):
    def body(c, _):
      return fn(c), None
    c, _ = jax.lax.scan(body, c, None, length=iters)
    return c

  c = run(args)
  jax.block_until_ready(c)
  t0 = time.perf_counter()
  c = run(c)
  _ = np.asarray(jax.tree.leaves(c)[0])[:1]
  return (time.perf_counter() - t0) / iters


def main():
  rng = np.random.default_rng(0)
  results = []
  for name, m, k, n, density in SHAPES:
    mp = _pad_rows(m, BM)
    x = jnp.asarray(rng.normal(size=(mp, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    gb, nb = k // BLOCK[0], n // BLOCK[1]
    nz = max(int(round(density * gb * nb)), 1)
    flat = np.zeros(gb * nb, np.int32)
    flat[rng.permutation(gb * nb)[:nz]] = 1
    bmask = jnp.asarray(flat.reshape(gb, nb))
    emask = expand_from_blocks(bmask.astype(jnp.bfloat16), (k, n), BLOCK)

    def fwd_dense(c, x=x):
      w = c
      y = x @ w
      return w * 0.999 + (y.astype(jnp.float32).sum() * 1e-12).astype(w.dtype)

    def fwd_masked(c, x=x, emask=emask):
      w = c
      y = x @ (w * emask)
      return w * 0.999 + (y.astype(jnp.float32).sum() * 1e-12).astype(w.dtype)

    def fwd_v3(c, x=x, bmask=bmask):
      w = c
      y = block_sparse_matmul_v3(x, w, bmask, BLOCK, BM)
      return w * 0.999 + (y.astype(jnp.float32).sum() * 1e-12).astype(w.dtype)

    def wg_dense(c, x=x):
      w = c
      g = jax.grad(lambda w: (x @ w).astype(jnp.float32).sum())(w)
      return w * 0.999 + g * 1e-9

    def wg_masked(c, x=x, emask=emask):
      w = c
      g = jax.grad(
          lambda w: (x @ (w * emask)).astype(jnp.float32).sum())(w)
      return w * 0.999 + g * 1e-9

    def wg_v3(c, x=x, bmask=bmask):
      w = c
      g = jax.grad(lambda w: block_sparse_matmul_v3(
          x, w, bmask, BLOCK, BM).astype(jnp.float32).sum())(w)
      return w * 0.999 + g * 1e-9

    row = {'name': name, 'M': m, 'K': k, 'N': n, 'density': density}
    for label, fn in [('fwd_dense', fwd_dense), ('fwd_masked', fwd_masked),
                      ('fwd_v3', fwd_v3), ('fb_dense', wg_dense),
                      ('fb_masked', wg_masked), ('fb_v3', wg_v3)]:
      try:
        row[label] = round(time_fn(fn, w) * 1e6, 1)  # us
      except Exception as e:  # noqa: BLE001
        row[label] = f'ERR {type(e).__name__}'
    results.append(row)
    print(json.dumps(row), flush=True)


if __name__ == '__main__':
  main()

"""Isolated TPU timing: tap block-sparse conv vs XLA dense conv.

Times a lax.scan chain of convs (the PERF.md methodology: per-call dispatch
pipelines on the remote backend; chain on-device and read back one value).
Shapes default to the ResNet-50 group3 3x3 (the biggest sparse FLOP mass).

  python - < scripts/bench_tap_conv.py            # on TPU
  SHAPE=7,7,512,512 DENSITY=0.09 python - < scripts/bench_tap_conv.py
"""

import os
import time

import numpy as np


def main():
  import jax
  import jax.numpy as jnp
  from rigl_tpu.ops.block_mask import pool_to_tap_blocks, random_tap_block_mask
  from rigl_tpu.ops.pallas.block_sparse_conv import (block_sparse_conv_tap,
                                                     pack_tap_active)

  shape_env = os.environ.get('SHAPE', '14,14,256,256')
  h, w_dim, cin, cout = (int(v) for v in shape_env.split(','))
  batch = int(os.environ.get('BATCH', 128))
  density = float(os.environ.get('DENSITY', 0.087))  # group3 ERK = 1-0.913
  iters = int(os.environ.get('ITERS', 50))
  block_env = os.environ.get('BLOCK', '128,128')
  block = tuple(int(v) for v in block_env.split(','))
  bm = int(os.environ.get('BM', 512))

  key = jax.random.key(0)
  x = jax.random.normal(key, (batch, h, w_dim, cin), jnp.bfloat16)
  w4 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, cin, cout),
                         jnp.bfloat16)
  mask = random_tap_block_mask(jax.random.fold_in(key, 2), w4.shape,
                               1.0 - density, block)
  occ3 = (pool_to_tap_blocks(mask.astype(jnp.float32), block, 'max')
          > 0).astype(jnp.int32)
  n_active = int(occ3.sum())
  print(f'shape=({batch},{h},{w_dim},{cin})->{cout} block={block} '
        f'active {n_active}/{occ3.size} blocks '
        f'(density {n_active / occ3.size:.3f})')
  packing = dict(zip(('cols', 'rows', 'taps'),
                     pack_tap_active(occ3, n_active)))
  wm = (w4 * mask.astype(w4.dtype))

  def chain(f):
    def run(x0):
      def body(c, _):
        y = f(c)
        # keep shapes closed: project y back to x's shape via slice
        return (c + y[..., :cin] * 1e-6).astype(x0.dtype), ()
      out, _ = jax.lax.scan(body, x0, None, length=iters)
      return out
    return jax.jit(run)

  def dense_f(xx):
    return jax.lax.conv_general_dilated(
        xx, wm, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  def tap_f(xx):
    return block_sparse_conv_tap(xx, w4, packing, block, bm, False)

  for name, f in (('xla_dense', dense_f), ('tap_kernel', tap_f)):
    run = chain(f)
    y = run(x)
    _ = np.asarray(y[0, 0, 0, :2])  # sync
    t0 = time.perf_counter()
    y = run(x)
    _ = np.asarray(y[0, 0, 0, :2])
    dt = (time.perf_counter() - t0) / iters
    gflop = 2 * batch * h * w_dim * 9 * cin * cout / 1e9
    print(f'{name:12s} {dt * 1e6:9.1f} us/conv  '
          f'dense-equiv {gflop / dt / 1e3:7.1f} TFLOP/s')


if __name__ == '__main__':
  main()

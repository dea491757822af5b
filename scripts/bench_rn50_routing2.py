"""Per-layer routing measurements, round 2 — on the SOUND scan recipe.

Round-1's per-layer microbenches dispatched each call separately; with the
now-measured ~1.7 ms/dispatch + ~28 ms/readback tunnel costs they resolved
only >30% margins and flipped sign run to run (PERF.md session 4).  This
harness times each layer arm inside ONE jit'd lax.scan (fwd + dx + dw per
iteration, dw kept live through a carried accumulator), device time
>= 100 ms per measurement — margins of a few percent are now resolvable.

Arms per ResNet-50 layer shape (batch 128, bf16):
  dense  — XLA conv_general_dilated on pre-masked weights (the incumbent)
  block  — 1x1: ops.conv.block_sparse_conv1x1 (v3 occupancy form);
           3x3 stride 1: the tap kernel (block_sparse_conv_tap)
at the layer's uniform-80 (d=0.20) and/or ERK-80 densities.

Select configs with BENCH_NAMES=comma,separated,prefixes (compiles cost
~70 s each over the tunnel — run ~6 configs per invocation).

  BENCH_NAMES=d28,d56 python scripts/bench_rn50_routing2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
BLOCK = (128, 128)
BM = int(os.environ.get('RIGL_ROUTE_BM', '512'))
LENGTH = int(os.environ.get('RIGL_ROUTE_LEN', '128'))


def _scan_time(body, carry, length, reps=3):
  @jax.jit
  def run(c):
    c, _ = jax.lax.scan(lambda c, _: (body(c), None), c, None, length=length)
    return c
  c = run(carry)
  _ = float(jax.tree.leaves(c)[-1].ravel()[0])
  best = float('inf')
  for _ in range(reps):
    t0 = time.perf_counter()
    c = run(carry)
    _ = float(jax.tree.leaves(c)[-1].ravel()[0])
    best = min(best, time.perf_counter() - t0)
  return best / length


def make_body(impl, w, dtype=jnp.bfloat16):
  """One training-shaped iteration: fwd + dx + dw; dw kept live via acc."""
  def body(carry):
    x, acc = carry

    def loss(x, w):
      y = impl(x, w)
      return jnp.sum(jnp.square(y.astype(jnp.float32)))

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
    x2 = x - 0.001 * dx.astype(x.dtype)
    x2 = x2 * jax.lax.rsqrt(
        jnp.mean(jnp.square(x2.astype(jnp.float32))) + 1e-6).astype(x.dtype)
    return (x2, acc + jnp.sum(dw.astype(jnp.float32)))

  return body


def uniform_block_mask(key, nk, nn, density, taps=None):
  shape = (nk, nn) if taps is None else (taps, nk, nn)
  n = int(np.prod(shape))
  n_on = max(int(round(density * n)), 1)
  flat = np.zeros(n, np.int32)
  flat[:n_on] = 1
  rng = np.random.default_rng(int(key))
  rng.shuffle(flat)
  return jnp.asarray(flat.reshape(shape))


def run_1x1(name, hw, cin, cout, density, results):
  rng = np.random.default_rng(0)
  x0 = jax.device_put(rng.normal(0, 1, (BATCH, hw, hw, cin))
                      .astype(jnp.bfloat16))
  acc0 = jnp.zeros((), jnp.float32)
  blk = BLOCK
  nk, nn = cin // blk[0], cout // blk[1]
  occ = uniform_block_mask(0, nk, nn, density)
  from rigl_tpu.ops.block_mask import expand_from_blocks
  mask = expand_from_blocks(occ, (cin, cout), blk)
  w = jax.device_put((rng.normal(0, cin ** -0.5, (cin, cout))
                      * np.asarray(mask)).astype(jnp.bfloat16))

  def dense_impl(x, w):
    return jax.lax.conv_general_dilated(
        x, w[None, None], (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  from rigl_tpu.ops import conv as bs_conv

  def block_impl(x, w):
    return bs_conv.block_sparse_conv1x1(x, w, occ, block=blk, bm=BM)

  # Third arm: the tap kernel's T=1 fast path (this is what in-model 1x1
  # routing actually executes; RIGL_TAP_ENGINE selects flat vs v5).
  from rigl_tpu.ops.pallas.block_sparse_conv import (block_sparse_conv_tap,
                                                     pack_tap_active)
  n_act = int(np.asarray(occ).sum())
  cols, rows, taps = pack_tap_active(occ[None], n_act)
  packing = {'cols': jax.device_put(cols), 'rows': jax.device_put(rows),
             'taps': jax.device_put(taps)}

  def tap_impl(x, w):
    return block_sparse_conv_tap(x, w[None, None], packing, block=blk)

  t_d = _scan_time(make_body(dense_impl, w), (x0, acc0), LENGTH)
  t_b = _scan_time(make_body(block_impl, w), (x0, acc0), LENGTH)
  t_t = _scan_time(make_body(tap_impl, w), (x0, acc0), LENGTH)
  results[name] = {'dense_us': round(t_d * 1e6, 1),
                   'block_us': round(t_b * 1e6, 1),
                   'tap1x1_us': round(t_t * 1e6, 1),
                   'speedup': round(t_d / t_b, 3),
                   'tap_speedup': round(t_d / t_t, 3), 'density': density}
  print(name, results[name])


def run_3x3(name, hw, cin, cout, density, results):
  rng = np.random.default_rng(0)
  x0 = jax.device_put(rng.normal(0, 1, (BATCH, hw, hw, cin))
                      .astype(jnp.bfloat16))
  acc0 = jnp.zeros((), jnp.float32)
  nk, nn = cin // BLOCK[0], cout // BLOCK[1]
  occ3 = uniform_block_mask(0, nk, nn, density, taps=9)
  from rigl_tpu.ops.block_mask import expand_from_tap_blocks
  mask = expand_from_tap_blocks(occ3, (3, 3, cin, cout), BLOCK)
  w = jax.device_put((rng.normal(0, (9 * cin) ** -0.5, (3, 3, cin, cout))
                      * np.asarray(mask)).astype(jnp.bfloat16))

  def dense_impl(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  from rigl_tpu.ops.pallas.block_sparse_conv import (block_sparse_conv_tap,
                                                     pack_tap_active)
  n_act = int(np.asarray(occ3).sum())
  cols, rows, taps = pack_tap_active(occ3, n_act)
  packing = {'cols': jax.device_put(cols), 'rows': jax.device_put(rows),
             'taps': jax.device_put(taps)}

  def tap_impl(x, w):
    return block_sparse_conv_tap(x, w, packing, block=BLOCK)

  t_d = _scan_time(make_body(dense_impl, w), (x0, acc0), LENGTH)
  t_t = _scan_time(make_body(tap_impl, w), (x0, acc0), LENGTH)
  results[name] = {'dense_us': round(t_d * 1e6, 1),
                   'tap_us': round(t_t * 1e6, 1),
                   'speedup': round(t_d / t_t, 3), 'density': density}
  print(name, results[name])


CONFIGS = {
    # 1x1s: uniform-80 density everywhere (ERK makes g1/g2 1x1s ~dense,
    # no routing question; g3/g4 ERK 1x1 densities ~0.5+ are above any
    # plausible skip threshold).
    # g1's 1x1s (64<->256) are ineligible: the v3 kernel slices K/N by
    # the block size on the lane dim, which must be a multiple of 128 —
    # cin/cout 64 routes dense by construction (block_executable_layers
    # already gates on divisibility).
    'd28_512_128': lambda r: run_1x1('d28_512_128', 28, 512, 128, 0.2, r),
    'd28_128_512': lambda r: run_1x1('d28_128_512', 28, 128, 512, 0.2, r),
    'd14_1024_256': lambda r: run_1x1('d14_1024_256', 14, 1024, 256, 0.2, r),
    'd14_256_1024': lambda r: run_1x1('d14_256_1024', 14, 256, 1024, 0.2, r),
    'd7_2048_512': lambda r: run_1x1('d7_2048_512', 7, 2048, 512, 0.2, r),
    'd7_512_2048': lambda r: run_1x1('d7_512_2048', 7, 512, 2048, 0.2, r),
    # 3x3s: uniform-80 and the real ERK-80 densities.
    't28_128_u': lambda r: run_3x3('t28_128_u', 28, 128, 128, 0.2, r),
    't14_256_u': lambda r: run_3x3('t14_256_u', 14, 256, 256, 0.2, r),
    't14_256_erk': lambda r: run_3x3('t14_256_erk', 14, 256, 256, 0.11, r),
    't7_512_u': lambda r: run_3x3('t7_512_u', 7, 512, 512, 0.2, r),
    't7_512_erk': lambda r: run_3x3('t7_512_erk', 7, 512, 512, 0.09, r),
}


def main():
  only = os.environ.get('BENCH_NAMES', '')
  prefixes = [p for p in only.split(',') if p]
  results = {}
  print(f'# backend={jax.default_backend()} bm={BM} len={LENGTH}')
  for name, fn in CONFIGS.items():
    if prefixes and not any(name.startswith(p) for p in prefixes):
      continue
    fn(results)
  print(json.dumps(results))


if __name__ == '__main__':
  main()

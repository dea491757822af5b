"""Pin the chip's real compute/bandwidth ceiling (VERDICT r1, perf item 2a).

The round-1 dense ResNet-50 baseline implied only ~16% MFU (32 TFLOP/s of a
~197 TFLOP/s bf16 v5e chip) and PERF.md's controls found XLA dense matmul at
~25% peak — leaving open whether the tunnel/backend throttles or the model
leaves 2-3x on the table.  This script measures known-good maximum-MFU
programs through the SAME chained-carry timing recipe as bench.py:

  1. big square bf16 matmul (the canonical MXU-saturating program),
  2. a mid-size matmul at ResNet-like arithmetic intensity,
  3. ResNet-50 body conv shapes (dense, fwd-only) at batch 128,
  4. an HBM stream (copy) to pin achievable bandwidth.

Interpretation: if (1) reaches >=70% of bf16 peak, the chip and tunnel are
fine and the ResNet step's 16% MFU is real op-mix/layout headroom; if (1)
itself caps out low, all kernel-vs-XLA ratios on this box stay suspect and
only e2e deltas count (PERF.md methodology).

Usage: python scripts/bench_ceiling.py  (TPU; ~2-4 min mostly compile)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12   # TFLOP/s, public v5e spec
V5E_HBM_PEAK = 819e9     # bytes/s


def _time_chain(fn, carry, iters=20, warmup=3):
  """bench.py recipe: chained carries, one final readback."""
  run = jax.jit(fn, donate_argnums=0)
  for _ in range(warmup):
    carry = run(carry)
  _ = float(jax.tree.leaves(carry)[0].ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    carry = run(carry)
  _ = float(jax.tree.leaves(carry)[0].ravel()[0])
  return (time.perf_counter() - t0) / iters


def bench_matmul(m, k, n, dtype=jnp.bfloat16, iters=20):
  w = jax.device_put(
      (np.random.default_rng(0).normal(0, k ** -0.5, (k, n))).astype(dtype))
  x0 = jax.device_put(
      np.random.default_rng(1).normal(0, 1, (m, k)).astype(dtype))

  def step(x):
    y = x @ w
    # Keep magnitudes bounded so the chain can run forever; one cheap
    # elementwise pass, small next to the matmul.
    y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6
                          ).astype(dtype)
    return y[:, :k] if n != k else y

  t = _time_chain(step, x0, iters=iters)
  flops = 2.0 * m * k * n
  return t, flops / t


def bench_conv(batch, hw, cin, cout, ksize, stride=1, iters=20):
  w = jax.device_put(np.random.default_rng(0).normal(
      0, 0.05, (ksize, ksize, cin, cout)).astype(jnp.bfloat16))
  x0 = jax.device_put(np.random.default_rng(1).normal(
      0, 1, (batch, hw, hw, cin)).astype(jnp.bfloat16))

  def step(x):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y * jax.lax.rsqrt(
        jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6).astype(x.dtype)
    # Bring the carry back to cin channels so the chain types match.
    if cout == cin:
      return y
    if cout > cin:
      return y[..., :cin]
    reps = -(-cin // cout)
    return jnp.concatenate([y] * reps, axis=-1)[..., :cin]

  t = _time_chain(step, x0, iters=iters)
  ohw = hw // stride
  flops = 2.0 * batch * ohw * ohw * ksize * ksize * cin * cout
  return t, flops / t


def bench_hbm_stream(mb=512, iters=20):
  n = mb * 2 ** 20 // 2  # bf16 elements
  x0 = jax.device_put(np.zeros((n,), np.float16).view(np.int16))

  def step(x):
    return x + 1

  t = _time_chain(step, x0, iters=iters)
  return t, 2.0 * n * 2 / t  # read + write


def main():
  print(f'# backend={jax.default_backend()}')
  results = {}

  for name, (m, k, n) in {
      'matmul_8192^3': (8192, 8192, 8192),
      'matmul_4096^3': (4096, 4096, 4096),
      'matmul_b128_4096x4096': (128, 4096, 4096),
  }.items():
    t, fs = bench_matmul(m, k, n)
    results[name] = {'ms': round(t * 1e3, 3), 'tflops': round(fs / 1e12, 1),
                     'mfu': round(fs / V5E_BF16_PEAK, 3)}
    print(name, results[name])

  for name, args in {
      'conv_56x56_64->64_k3_b128': (128, 56, 64, 64, 3),
      'conv_14x14_256->256_k3_b128': (128, 14, 256, 256, 3),
      'conv_28x28_512->128_k1_b128': (128, 28, 512, 128, 1),
  }.items():
    t, fs = bench_conv(*args)
    results[name] = {'ms': round(t * 1e3, 3), 'tflops': round(fs / 1e12, 1),
                     'mfu': round(fs / V5E_BF16_PEAK, 3)}
    print(name, results[name])

  t, bw = bench_hbm_stream()
  results['hbm_stream_512MB'] = {
      'ms': round(t * 1e3, 3), 'gbps': round(bw / 1e9, 1),
      'frac_peak': round(bw / V5E_HBM_PEAK, 3)}
  print('hbm_stream_512MB', results['hbm_stream_512MB'])

  print(json.dumps(results))


if __name__ == '__main__':
  main()

"""Conv-lowering headroom study (VERDICT r1 perf 2a follow-up).

bench_ceiling.py pinned: matmul ~90% of bf16 peak net of a ~1.7ms
per-dispatch floor, HBM ~87% of peak, but XLA convs only ~16% at every
ResNet-50 shape — the dense baseline's low MFU is conv lowering, not the
tunnel.  This script measures, floor-free (slope between two lax.scan
lengths inside one jit), what the same math costs as a dot:

  * each ResNet conv shape as conv_general_dilated (NHWC, bf16)
  * the exact same contraction as a reshaped matmul (1x1) or an
    im2col matmul (3x3)
  * dtype/layout variants (f32 conv, NCHW conv, f32-accum dot)

If dots win big, an all-dot ResNet formulation (whole model, so no
conv<->dot layout boundaries — the mixed form regressed 2x, PERF.md) is
the round-2 perf lever, and block-sparse matmul kernels get a real lane.

Usage: python scripts/bench_conv_vs_dot.py  (TPU, ~4-6 min)
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


_FLOOR = None


def _scan_time(body, carry, length, reps=3):
  """Seconds per jit(scan(body, length)) call, synced by readback."""
  @jax.jit
  def run(c):
    c, _ = jax.lax.scan(lambda c, _: (body(c), None), c, None, length=length)
    return c
  c = run(carry)
  _ = float(jax.tree.leaves(c)[0].ravel()[0])  # compile + warm
  best = float('inf')
  for _ in range(reps):
    t0 = time.perf_counter()
    c = run(carry)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    best = min(best, time.perf_counter() - t0)
  return best


def per_iter(body, carry, length=512):
  """Per-iteration seconds: one jit'd scan of `length` iterations (one
  remote compile — compiles cost ~70s over the tunnel, so the 2-length
  slope method is unaffordable).  The readback RTT on this tunnel is
  ~28ms, so the scan must be long enough that device time dominates; at
  512 iterations of >=0.2ms ops the RTT is <0.3% of the total."""
  global _FLOOR
  if _FLOOR is None:
    z = jax.device_put(np.zeros((8, 128), np.float32))
    _FLOOR = _scan_time(lambda c: c + 1, z, 1, reps=5)
    print(f'# readback floor: {_FLOOR * 1e3:.2f} ms')
  t = _scan_time(body, carry, length)
  return max(t - _FLOOR, 1e-9) / length


def _norm(y, dtype):
  return (y * jax.lax.rsqrt(
      jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6)).astype(dtype)


def conv_body(w, stride, dnums, dtype, cin, cout):
  def body(x):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'SAME', dimension_numbers=dnums)
    y = _norm(y, dtype)
    if cout == cin:
      return y
    ax = -1 if dnums[0] == 'NHWC' else 1
    if cout > cin:
      return jax.lax.slice_in_dim(y, 0, cin, axis=ax)
    reps = -(-cin // cout)
    return jax.lax.slice_in_dim(
        jnp.concatenate([y] * reps, axis=ax), 0, cin, axis=ax)
  return body


def matmul_body(w, dtype, k, n, accum_f32=False):
  def body(x):
    y = jax.lax.dot(x, w, precision=None,
                    preferred_element_type=jnp.float32 if accum_f32
                    else None)
    y = _norm(y, dtype)
    if n == k:
      return y
    if n > k:
      return y[:, :k]
    reps = -(-k // n)
    return jnp.concatenate([y] * reps, axis=1)[:, :k]
  return body


def main():
  import os
  part = int(os.environ.get('BENCH_PART', '1'))
  rng = np.random.default_rng(0)
  out = {}
  print(f'# backend={jax.default_backend()} part={part}')

  def report(name, t, flops):
    out[name] = {'us': round(t * 1e6, 1),
                 'tflops': round(flops / t / 1e12, 1),
                 'mfu': round(flops / t / PEAK, 3)}
    print(name, out[name])

  # ---- ResNet-50 shapes: conv vs equivalent dot --------------------------
  # (label, N, HW, Cin, Cout, ksize, stride)
  shapes_all = {
      1: [
          ('g2_1x1_28x28_512->128', 128, 28, 512, 128, 1, 1),
          ('g2_3x3_28x28_128->128', 128, 28, 128, 128, 3, 1),
          ('g4_3x3_7x7_512->512', 128, 7, 512, 512, 3, 1),
      ],
      2: [
          ('g1_1x1_56x56_64->256', 128, 56, 64, 256, 1, 1),
          ('g3_3x3_14x14_256->256', 128, 14, 256, 256, 3, 1),
      ],
  }
  for label, n_b, hw, cin, cout, ks, stride in shapes_all[part]:
    flops = 2.0 * n_b * hw * hw * ks * ks * cin * cout
    # conv NHWC bf16
    wc = jax.device_put(rng.normal(0, 0.04, (ks, ks, cin, cout))
                        .astype(jnp.bfloat16))
    xc = jax.device_put(rng.normal(0, 1, (n_b, hw, hw, cin))
                        .astype(jnp.bfloat16))
    t = per_iter(conv_body(wc, stride, ('NHWC', 'HWIO', 'NHWC'),
                           jnp.bfloat16, cin, cout), xc)
    report(f'conv_{label}', t, flops)
    # the same contraction as a dot: M = N*H*W rows, K = ks*ks*cin
    m_rows, k_dim = n_b * hw * hw, ks * ks * cin
    wd = jax.device_put(rng.normal(0, k_dim ** -0.5, (k_dim, cout))
                        .astype(jnp.bfloat16))
    xd = jax.device_put(rng.normal(0, 1, (m_rows, k_dim))
                        .astype(jnp.bfloat16))
    t = per_iter(matmul_body(wd, jnp.bfloat16, k_dim, cout), xd)
    report(f'dot_{label}', t, flops)

  if part == 2:
    # ---- variants on one representative conv -----------------------------
    n_b, hw, cin, cout, ks = 128, 28, 128, 128, 3
    flops = 2.0 * n_b * hw * hw * ks * ks * cin * cout
    # f32 conv
    wc = jax.device_put(rng.normal(0, 0.04, (ks, ks, cin, cout))
                        .astype(jnp.float32))
    xc = jax.device_put(rng.normal(0, 1, (n_b, hw, hw, cin))
                        .astype(jnp.float32))
    t = per_iter(conv_body(wc, 1, ('NHWC', 'HWIO', 'NHWC'), jnp.float32,
                           cin, cout), xc)
    report('conv_g2_3x3_f32', t, flops)
    # NCHW conv bf16
    wc = jax.device_put(rng.normal(0, 0.04, (cout, cin, ks, ks))
                        .astype(jnp.bfloat16))
    xc = jax.device_put(rng.normal(0, 1, (n_b, cin, hw, hw))
                        .astype(jnp.bfloat16))
    t = per_iter(conv_body(wc, 1, ('NCHW', 'OIHW', 'NCHW'), jnp.bfloat16,
                           cin, cout), xc)
    report('conv_g2_3x3_nchw', t, flops)

  print(json.dumps(out))


if __name__ == '__main__':
  main()

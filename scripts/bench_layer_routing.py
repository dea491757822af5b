"""Measured per-layer routing table for block-sparse execution.

For every masked conv layer of a model (at its REAL activation shape, stride
and ERK density), times each execution candidate on the current backend and
emits {mask path: 'dense'|'tap'|'matmul'} JSON for
TrainConfig.block_routing_file / BENCH_BLOCK_ROUTING.

Candidates:
  * dense  — XLA conv on masked weights (the incumbent; dense-times-mask).
  * tap    — direct shift-and-matmul block-skipping conv kernel
             (ops/pallas/block_sparse_conv.py; spatial stride-1 + all 1x1).
  * matmul — 1x1 through the v4 flat-packed block-skipping matmul
             (ops/conv.py block_sparse_conv1x1).

Timing is fwd+bwd (training is the target), scan-chained inside one jit
with a final value readback (remote-backend methodology, CLAUDE.md), two
interleaved reps per candidate, min taken; a candidate must beat dense by
MARGIN (default 3%) to displace it.  Layers sharing
(k, cin, cout, stride, H, W, density-bucket) share one measurement.

  python scripts/bench_layer_routing.py                # TPU, ResNet-50
  BATCH=128 MARGIN=0.03 OUT=configs/routing_v5e_rn50_b128.json \
      python scripts/bench_layer_routing.py

Why this exists: eligibility-heuristic routing regressed end-to-end step
time on every attempt (PERF.md session 3) — whether a kernel beats XLA's
dense conv at a given (shape, density) on a given chip is an empirical
question, so the framework answers it empirically.
"""

import functools
import json
import os
import sys
import time

import numpy as np


def collect_conv_layers(model, input_shape):
  """{mask path: dict(x_shape, kernel_shape, stride)} for every _BlockConv,
  via a flax interceptor under eval_shape (no device compute)."""
  import flax.linen as nn
  import jax
  import jax.numpy as jnp
  from rigl_tpu.models.common import _BlockConv

  layers = {}

  def interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if isinstance(mod, _BlockConv) and context.method_name == '__call__':
      path = '/'.join(mod.path) + '/kernel'
      x = args[0]
      layers[path] = {
          'x_shape': tuple(x.shape),
          'kernel_shape': (mod.kernel_size, mod.kernel_size,
                           x.shape[-1], mod.features),
          'stride': mod.strides,
      }
    return next_fun(*args, **kwargs)

  with nn.intercept_methods(interceptor):
    jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.key(0), jnp.zeros(input_shape, jnp.float32))
  return layers


def time_fn(fn, carry, iters):
  import jax

  @jax.jit
  def run(c):
    def body(c, _):
      return fn(c), None
    c, _ = jax.lax.scan(body, c, None, length=iters)
    return c

  c = run(carry)
  _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]  # sync after compile
  times = []
  for _ in range(2):
    t0 = time.perf_counter()
    c = run(c)
    _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    times.append((time.perf_counter() - t0) / iters)
  return min(times), run, c


def main():
  import jax
  import jax.numpy as jnp
  from rigl_tpu.models import registry
  from rigl_tpu.ops import block_mask as bm_lib
  from rigl_tpu.ops import conv as bs_conv
  from rigl_tpu.ops.pallas.block_sparse_conv import (
      block_sparse_conv_tap, default_tap_bm, pack_tap_active, tap_batch_ok)
  from rigl_tpu.ops.pallas.block_sparse_v4 import pack_flat_active
  from rigl_tpu.sparsity import distributions
  from rigl_tpu.sparsity import masks as masks_lib

  model_name = os.environ.get('MODEL', 'resnet')
  depth = int(os.environ.get('DEPTH', 50))
  batch = int(os.environ.get('BATCH', 128))
  image = int(os.environ.get('IMAGE', 224))
  sparsity = float(os.environ.get('SPARSITY', 0.8))
  block_env = os.environ.get('BLOCK', '128,128')
  block = tuple(int(v) for v in block_env.split(','))
  bm_matmul = int(os.environ.get('BM', 512))
  iters = int(os.environ.get('ITERS', 20))
  margin = float(os.environ.get('MARGIN', 0.03))
  out_path = os.environ.get('OUT', '')
  dtype = jnp.bfloat16

  model = registry.create_model(model_name, depth=depth, num_classes=1000,
                                dtype=dtype, block=block)
  input_shape = (batch, image, image, 3)
  layers = collect_conv_layers(model, input_shape)
  print(f'{len(layers)} masked conv layers', file=sys.stderr)

  # ERK sparsities over ALL maskable params (matches SparseTraining.init).
  variables = jax.eval_shape(
      functools.partial(model.init, train=False),
      jax.random.key(0), jnp.zeros(input_shape, jnp.float32))
  shapes = masks_lib.mask_shapes({'params': variables['params']})
  sparsities = distributions.get_sparsities(
      shapes, 'erdos_renyi_kernel', sparsity, {})

  def signature(path):
    info = layers[path]
    n, h, w, cin = info['x_shape']
    k = info['kernel_shape'][0]
    cout = info['kernel_shape'][3]
    dens = 1.0 - sparsities.get(path, 0.0)
    return (k, cin, cout, info['stride'], h, w, round(dens, 2))

  sig_results = {}
  routing = {}
  rng = np.random.default_rng(0)

  for path in layers:
    if path not in sparsities:
      continue
    sig = signature(path)
    if sig in sig_results:
      routing[path] = sig_results[sig]
      continue
    k, cin, cout, stride, h, w, dens = sig
    if cin % block[0] or cout % block[1]:
      sig_results[sig] = 'dense'
      routing[path] = 'dense'
      continue
    kshape = (k, k, cin, cout)
    x = jnp.asarray(rng.normal(size=(batch, h, w, cin)), dtype)
    w4 = jnp.asarray(rng.normal(size=kshape) * 0.05, dtype)

    # Block mask at the layer's density with the training-invariant count.
    n_blocks = k * k * (cin // block[0]) * (cout // block[1])
    n_active = n_blocks - distributions.get_n_zeros(n_blocks, 1.0 - dens)
    occ_flat = np.zeros(n_blocks, np.int32)
    occ_flat[rng.permutation(n_blocks)[:n_active]] = 1
    occ3 = jnp.asarray(occ_flat.reshape(k * k, cin // block[0],
                                        cout // block[1]))
    emask = bm_lib.expand_from_tap_blocks(occ3.astype(jnp.float32), kshape,
                                          block).astype(dtype)

    def fwd_bwd(conv_fn):
      # One training-shaped pass: loss = sum(conv(x, w)); grads wrt w and x.
      def f(c):
        w_c, x_c = c
        def loss(w_, x_):
          return conv_fn(x_, w_).astype(jnp.float32).sum()
        gw, gx = jax.grad(loss, argnums=(0, 1))(w_c, x_c)
        return ((w_c * 0.999 + gw.astype(dtype) * 1e-9),
                (x_c + gx.astype(dtype) * 1e-9))
      return f

    # collect_conv_layers records _BlockConv's input, which for strided
    # layers is ALREADY fixed-padded (ConvFixedPad pads then calls with
    # padding='VALID') — so candidates must not pad again.
    pad = 'SAME' if stride == 1 else 'VALID'

    def dense_conv(x_, w_):
      return jax.lax.conv_general_dilated(
          x_, w_ * emask, (stride, stride), pad,
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    candidates = {'dense': dense_conv}

    tap_ok = (k == 1 or (tap_batch_ok(batch, False)
                         and (stride == 1 or k % 2 == 1)))
    if tap_ok:
      cols, rows, taps = (np.asarray(v) for v in
                          pack_tap_active(occ3, int(n_active)))
      packing = {'cols': jnp.asarray(cols), 'rows': jnp.asarray(rows),
                 'taps': jnp.asarray(taps)}

      def tap_conv(x_, w_, packing=packing):
        if k == 1:
          xx = x_[:, ::stride, ::stride, :] if stride > 1 else x_
          return block_sparse_conv_tap(xx, w_, packing, block,
                                       default_tap_bm(), False)
        if stride == 1:
          return block_sparse_conv_tap(x_, w_, packing, block,
                                       default_tap_bm(), False)
        # Strided spatial conv (models/common.py _BlockConv): x_ is the
        # already-fixed-padded input; stride-1 SAME tap conv, take every
        # s-th window center.
        y = block_sparse_conv_tap(x_, w_, packing, block,
                                  default_tap_bm(), False)
        oh = (x_.shape[1] - k) // stride + 1
        ow = (x_.shape[2] - k) // stride + 1
        c = k // 2
        return y[:, c:c + stride * (oh - 1) + 1:stride,
                 c:c + stride * (ow - 1) + 1:stride, :]
      candidates['tap'] = tap_conv

    if k == 1:
      occ2 = occ3[0]
      vcols, vrows = pack_flat_active(occ2, int(n_active))
      entry = {'cols': vcols, 'rows': vrows}

      def mm_conv(x_, w_, entry=entry):
        return bs_conv.block_sparse_conv1x1(x_, w_, entry, stride=stride,
                                            block=block, bm=bm_matmul)
      candidates['matmul'] = mm_conv

    times = {}
    for name, conv_fn in candidates.items():
      try:
        t, _, _ = time_fn(fwd_bwd(conv_fn), (w4, x), iters)
        times[name] = t
      except Exception as e:  # noqa: BLE001 - report and fall back
        print(f'{path} {name}: FAILED {type(e).__name__}: {e}',
              file=sys.stderr)
    best = 'dense'
    t_dense = times.get('dense', float('inf'))
    for name, t in times.items():
      if name != 'dense' and t < t_dense * (1.0 - margin) \
          and t < times.get(best, float('inf')):
        best = name
    sig_results[sig] = best
    routing[path] = best
    pretty = ' '.join(f'{n}={t * 1e6:.0f}us' for n, t in sorted(times.items()))
    print(f'{path} k{k} {cin}->{cout} s{stride} {h}x{w} d={dens:.2f}: '
          f'{pretty} -> {best}', file=sys.stderr)

  print(json.dumps(routing, indent=1))
  if out_path:
    with open(out_path, 'w') as f:
      json.dump(routing, f, indent=1)
    print(f'wrote {out_path}', file=sys.stderr)


if __name__ == '__main__':
  main()

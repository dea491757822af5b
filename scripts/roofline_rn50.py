"""Analytic roofline of a ResNet-50 train step on TPU v5e (single chip).

Answers VERDICT.md round-1 weak #2/#3 definitively: where can executable
sparsity actually buy step time, and what is the speed-of-light for the
dense baseline bench.py measures against?

Model: per conv layer, a train step does three passes (fwd y = x*w,
dx = gy*w^T, dw = x^T*gy).  Each pass costs
    max(compute_time, hbm_time)
with  compute = 2*M*K*N*density FLOP at PEAK_TFLOPS (MXU),
      hbm    = unavoidable operand traffic at PEAK_GBs.
Traffic charged (bf16, perfectly fused elementwise neighbors):
  fwd: read x (M*K) + write y (M*N)         [w negligible or counted]
  dx : read gy (M*N) + write dx (M*K)
  dw : read x + read gy (+ write dw)
Weight-block sparsity thins COMPUTE (and w traffic) by `density`, but the
activation traffic is irreducible: x must be read even if most w-blocks are
dead (only fully-dead cin/cout block-columns could skip it, which ERK/
uniform distributions do not produce).  So each pass has a hard floor at
its activation bytes — that floor is what this script tabulates.

Run:  python scripts/roofline_rn50.py            (pure host math, no jax)
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197e12   # v5e bf16 (2 bytes) MXU peak
PEAK_GBS = 716e9       # measured ~87-90%-of-peak HBM stream (PERF.md r2 s1)
BYTES = 2              # bf16

B = 128
IMG = 224


def conv_layers_rn50():
  """(name, H_in, k, stride, cin, cout) for every conv in ResNet-50 +
  the final dense layer, NHWC.  Mirrors rigl_tpu/models/resnet.py."""
  layers = [('stem', 224, 7, 2, 3, 64)]
  spec = [(1, 3, 64, 256, 56), (2, 4, 128, 512, 28),
          (3, 6, 256, 1024, 14), (4, 3, 512, 2048, 7)]
  cin_prev = 64
  for (gi, nblocks, width, cout, hw) in spec:
    h_in = hw * 2 if gi > 1 else 56
    for b in range(nblocks):
      stride = 2 if (b == 0 and gi > 1) else 1
      h_blk = h_in if b == 0 else hw
      if b == 0:
        layers.append((f'g{gi}b{b}/proj', h_blk, 1, stride, cin_prev, cout))
      layers.append((f'g{gi}b{b}/conv1', h_blk, 1, 1, cin_prev, width))
      layers.append((f'g{gi}b{b}/conv2', h_blk, 3, stride, width, width))
      layers.append((f'g{gi}b{b}/conv3', hw, 1, 1, width, cout))
      cin_prev = cout
  layers.append(('fc', 1, 1, 1, 2048, 1000))
  return layers


def erk_density(k, cin, cout, target=0.8):
  """ERK raw score (normalized globally elsewhere); here we just use the
  known solved densities for RN50@80 from the repo's distribution solver."""
  return None  # filled per-layer below from the solver if available


def pass_times(m, k_eff, n, density, extra_read=0.0):
  """One matmul-view pass: returns (time_s, compute_s, hbm_s)."""
  comp = 2 * m * k_eff * n * density / PEAK_TFLOPS
  hbm = (m * k_eff + m * n + extra_read) * BYTES / PEAK_GBS
  return max(comp, hbm), comp, hbm


def main():
  try:
    import numpy as np  # noqa: F401
    from rigl_tpu.sparsity import distributions
    have_solver = True
  except Exception:
    have_solver = False

  layers = conv_layers_rn50()
  # Solve real ERK-80 densities over the conv shapes (first conv excluded,
  # mirroring bench.py's mask_rule).
  dens_erk = {}
  if have_solver:
    shapes = {}
    for (name, h, k, s, cin, cout) in layers:
      if name == 'stem':
        continue
      shapes[name] = (cin, cout) if name == 'fc' else (k, k, cin, cout)
    sp = distributions.get_sparsities(
        shapes, 'erdos_renyi_kernel', default_sparsity=0.8)
    dens_erk = {n: 1.0 - s for n, s in sp.items()}

  def layer_report(dist):
    rows = []
    tot = {'t': 0.0, 'comp': 0.0, 'floor': 0.0, 'dense_t': 0.0}
    for (name, h, k, stride, cin, cout) in layers:
      h_out = math.ceil(h / stride)
      m = B * h_out * h_out
      k_eff = k * k * cin
      if dist == 'dense' or name == 'stem':
        d = 1.0
      elif dist == 'erk':
        d = dens_erk.get(name, 1.0)
      else:  # uniform-80, first conv dense (bench.py mask_rule)
        d = 0.2
      # fwd + dx + dw; dw reads both x and gy, writes K*N*d.
      t_f, c_f, b_f = pass_times(m, k_eff, cout, d)
      t_dx, c_dx, b_dx = pass_times(m, k_eff, cout, d)
      t_dw, c_dw, b_dw = pass_times(m, k_eff, cout, d,
                                    extra_read=k_eff * cout * d)
      t = t_f + t_dx + t_dw
      td_f, _, _ = pass_times(m, k_eff, cout, 1.0)
      t_dense = 3 * td_f
      comp = c_f + c_dx + c_dw
      floor = b_f + b_dx + b_dw
      tot['t'] += t
      tot['comp'] += comp
      tot['floor'] += floor
      tot['dense_t'] += t_dense
      rows.append((name, h, k, stride, cin, cout, d, t, comp, floor))
    return rows, tot

  for dist in ('dense', 'erk', 'uniform'):
    rows, tot = layer_report(dist)
    print(f'\n=== {dist} ===  SOL step {tot["t"]*1e3:.2f} ms '
          f'(compute {tot["comp"]*1e3:.2f} ms, hbm floor '
          f'{tot["floor"]*1e3:.2f} ms)')
    if dist != 'dense':
      print(f'    vs dense SOL: {tot["dense_t"]/tot["t"]:.3f}x faster '
            f'(dense SOL {tot["dense_t"]*1e3:.2f} ms)')
    hdr = f'{"layer":<14}{"HxH":>5}{"k":>2}{"s":>2}{"cin":>5}{"cout":>5}' \
          f'{"dens":>6}{"t_us":>8}{"comp":>8}{"hbm":>8}{"bound":>6}'
    print(hdr)
    for (name, h, k, s, cin, cout, d, t, comp, floor) in rows:
      bound = 'COMP' if comp > floor else 'hbm'
      print(f'{name:<14}{h:>5}{k:>2}{s:>2}{cin:>5}{cout:>5}{d:>6.2f}'
            f'{t*1e6:>8.0f}{comp*1e6:>8.0f}{floor*1e6:>8.0f}{bound:>6}')


if __name__ == '__main__':
  main()

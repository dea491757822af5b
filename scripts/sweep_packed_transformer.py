"""Block/bm sweep for the packed transformer train step (VERDICT-r2 item
5: close the transformer-shape kernel-efficiency gap, or attribute it).

Benches the harness floor and the dense twin ONCE, then the packed arm at
every (block, bm) in TR_SWEEP (semicolon-separated "bk,bn,bm" triples) at
TR_SPARSITY.  Same methodology as scripts/bench_packed_transformer.py
(scan-chained steps, matched floor subtracted, one readback).

  TR_SWEEP="512,512,512;256,256,512;512,512,2048" \
      python scripts/sweep_packed_transformer.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)
from scripts.bench_packed_transformer import (BATCH, D_FF, D_MODEL, HEADS,
                                              ITERS, LAYERS, SEQ, SPARSITY,
                                              bench, make_train_scan)

SWEEP = [tuple(int(v) for v in cfg.split(','))
         for cfg in os.environ.get(
             'TR_SWEEP',
             '512,512,512;512,512,1024;512,512,2048;'
             '256,256,512;256,256,1024;512,256,512;256,512,512'
         ).split(';')]


def main():
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(BATCH, SEQ, D_MODEL) * 0.02, jnp.bfloat16)

  @jax.jit
  def floor_run(xx):
    def body(c, _):
      return c + 1.0, ()
    c, _ = jax.lax.scan(body, xx, None, length=ITERS)
    return c

  floor = bench(floor_run, x, 'harness floor')

  kw = dict(num_layers=LAYERS, d_model=D_MODEL, d_ff=D_FF, num_heads=HEADS,
            dtype=jnp.bfloat16)
  dense = DenseTransformer(**kw)
  dv = dense.init(jax.random.key(0), x)
  run_d, params_d, opt_d = make_train_scan(dense, dv)
  t_dense = bench(run_d, x, 'dense transformer step', params_d, opt_d)

  results = []
  for bk, bn, bm in SWEEP:
    label = f'packed s={SPARSITY} block=({bk},{bn}) bm={bm}'
    try:
      packed = PackedTransformer(sparsity=SPARSITY, block=(bk, bn), bm=bm,
                                 **kw)
      pv = packed.init(jax.random.key(0), x)
      run_p, params_p, opt_p = make_train_scan(packed, pv)
      t_packed = bench(run_p, x, label, params_p, opt_p)
    except Exception as e:  # noqa: BLE001 — record and keep sweeping
      print(f'{label}: FAILED {type(e).__name__}: {e}', flush=True)
      results.append({'block': [bk, bn], 'bm': bm, 'error': str(e)})
      continue
    rec = {'block': [bk, bn], 'bm': bm,
           'gross_us': round(t_packed * 1e6, 1),
           'gross_ratio': round(t_dense / t_packed, 3),
           'net_ratio': round((t_packed - floor) / (t_dense - floor), 3)}
    results.append(rec)
    print(json.dumps(rec), flush=True)

  print(json.dumps({
      'dense_us': round(t_dense * 1e6, 1), 'floor_us': round(floor * 1e6, 1),
      'sparsity': SPARSITY, 'sweep': results}))


if __name__ == '__main__':
  main()

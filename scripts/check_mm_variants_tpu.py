"""On-chip parity check for the packed matmul x-feed variants.

For each transformer-class shape: fwd / dx / dw under
RIGL_PACKED_MM_VARIANT=panel vs =slice must be BIT-EXACT (same entry
order, same f32 accumulation), and both must match the dense
mask-multiply reference to bf16 tolerance.

  python scripts/check_mm_variants_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.pallas import block_sparse_packed as bsp

SHAPES = [  # (m, K, N, block)
    (2048, 2048, 6144, (512, 512)),   # fused QKV
    (2048, 2048, 2048, (512, 512)),   # out-proj
    (2048, 2048, 8192, (512, 512)),   # fc1
    (2048, 8192, 2048, (512, 512)),   # fc2 (wide-K: the slice win)
    (1024, 4096, 4096, (512, 512)),   # MLP bench shape (panel regime)
    # The LM-accuracy config's layers (d_model 512, 128 blocks, m=b*s=1024)
    # — the shapes the 10k-step accuracy sweeps train through.
    (1024, 512, 1536, (128, 128)),    # QKV
    (1024, 512, 2048, (128, 128)),    # fc1
    (1024, 2048, 512, (128, 128)),    # fc2
    (8, 2048, 2048, (512, 512)),      # decode step row count (act regime)
]

# Per-layer ERK operating points (round 5: SparsityMap on packed storage,
# d512/128-block LM config): the solver gives every layer a DIFFERENT
# density — cover the densest (attn/out at s~=0.70) and sparsest
# (fc at s~=0.8125) against the same bit-exactness bar.
ERK_SHAPES = [  # (m, K, N, block, density)
    (1024, 512, 512, (128, 128), 0.30),     # attn/out at ERK-80
    (1024, 2048, 512, (128, 128), 0.1875),  # fc2 at ERK-80
]


def run_variant(variant, x, wp, packing, block, rowmode='dummy'):
  os.environ['RIGL_PACKED_MM_VARIANT'] = variant
  os.environ['RIGL_PACKED_MM_ROWMODE'] = rowmode

  @jax.jit
  def f(x, wp):
    def loss(x, wp):
      y = bsp.packed_matmul(x, wp, packing, block, 512)
      return jnp.sum(y.astype(jnp.float32) ** 2), y
    (l, y), (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(x, wp)
    return y, dx, dw

  y, dx, dw = f(x, wp)
  return (np.asarray(y), np.asarray(dx), np.asarray(dw))


def main():
  rs = np.random.RandomState(0)
  all_shapes = ([(m, k, n, b, 0.2) for m, k, n, b in SHAPES]
                + ERK_SHAPES)
  for m, kdim, n, block, density in all_shapes:
    bk, bn = block
    nk, nn = kdim // bk, n // bn
    n_active = max(1, int(density * nk * nn))
    flat = np.zeros(nk * nn, np.int32)
    flat[rs.choice(nk * nn, n_active, replace=False)] = 1
    bm_np = flat.reshape(nk, nn)
    packing = bsp.make_packing(jnp.asarray(bm_np), n_active)
    w = rs.randn(kdim, n).astype(np.float32) * 0.02
    mask = np.repeat(np.repeat(bm_np, bk, 0), bn, 1).astype(np.float32)
    wp = bsp.pack_dense(jnp.asarray(w * mask, jnp.bfloat16), packing, block)
    x = jnp.asarray(rs.randn(m, kdim) * 0.1, jnp.bfloat16)

    yp, dxp, dwp = run_variant('panel', x, wp, packing, block)
    bit = True
    # All (variant, rowmode) combinations must be BIT-EXACT: actives keep
    # the same entry order and f32 accumulation in every mode; dummy
    # entries only zero-write empty columns, which rowmode=act replaces
    # with the column-presence where-mask (exact zeros either way).
    for var in ('panel', 'slice'):
      for rm in ('dummy', 'act'):
        if (var, rm) == ('panel', 'dummy'):
          continue
        ys, dxs, dws = run_variant(var, x, wp, packing, block, rm)
        ok = (np.array_equal(yp, ys) and np.array_equal(dxp, dxs)
              and np.array_equal(dwp, dws))
        if not ok:
          print(f'  MISMATCH {var}/{rm} vs panel/dummy')
        bit = bit and ok

    # dense reference (f32 matmul of the bf16-masked weight)
    wd = np.asarray(
        bsp.unpack_dense(wp, packing, block, jnp.float32))
    y_ref = np.asarray(x, np.float32) @ wd
    rel = (np.abs(yp.astype(np.float32) - y_ref).max()
           / (np.abs(y_ref).max() + 1e-9))
    print(f'({m},{kdim},{n}) block={block} n_act={n_active}: '
          f'bit_exact={bit} fwd_rel_vs_dense={rel:.2e}', flush=True)
    assert bit, 'variants disagree!'
    assert rel < 2e-2, 'packed fwd does not match dense!'
  print('ALL OK')


if __name__ == '__main__':
  main()

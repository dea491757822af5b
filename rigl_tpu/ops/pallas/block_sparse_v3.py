"""Block-sparse matmul v3: x panel resident in VMEM, w gathered from HBM.

Refinement of v2 guided by the round-1 TPU benchmarks (PERF.md): v2's
per-block x-tile DMA serialized against compute.  Here the activation row
panel (bm x K) is auto-pipelined into VMEM once per grid row (Pallas skips
the re-fetch while the block index is unchanged along the j sweep), and only
the *weight* tiles — the tensors sparsity actually thins — are manually
DMA'd with double buffering over the packed active-block list.  HBM weight
traffic scales with density.

Also provides `pallas_dense_matmul`, the identical structure without
sparsity, as the control for isolating kernel overhead from skip savings.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rigl_tpu.ops.pallas.block_sparse_v2 import pack_block_indices


def _v3_kernel(counts_ref, idx_ref, x_ref, w_hbm, o_ref, w_buf, sems,
               *, bk, bn):
  j = pl.program_id(1)
  count = counts_ref[j]
  col = pl.multiple_of(j * bn, bn)

  def w_copy(s, slot):
    k = idx_ref[j, s] * bk
    return pltpu.make_async_copy(
        w_hbm.at[pl.ds(k, bk), pl.ds(col, bn)], w_buf.at[slot],
        sems.at[slot])

  @pl.when(count > 0)
  def _():
    w_copy(0, 0).start()

  def body(s, acc):
    slot = jax.lax.rem(s, 2)

    @pl.when(s + 1 < count)
    def _():
      w_copy(s + 1, 1 - slot).start()

    w_copy(s, slot).wait()
    k = idx_ref[j, s] * bk
    x_tile = x_ref[:, pl.ds(k, bk)]
    return acc + jnp.dot(x_tile, w_buf[slot],
                         preferred_element_type=jnp.float32)

  acc = jax.lax.fori_loop(
      0, count, body, jnp.zeros(o_ref.shape, jnp.float32))
  o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def block_sparse_matmul_v3(x, w, block_mask,
                           block: Tuple[int, int] = (512, 512),
                           bm: int = 512,
                           interpret: Optional[bool] = None,
                           dw_mode: str = 'auto'):
  """y = x @ (expanded(block_mask) * w); x VMEM-resident, w gathered.

  Differentiable: dx runs this kernel with the transposed mask.  dw
  (gradients exist only at active blocks — the trainer's dense path
  supplies full grads at update steps) has two strategies, because its
  contraction axis (M) carries no sparsity — only whole output tiles can
  be skipped:
    * 'gather': _dw_blocksparse_v2 — HBM traffic scales with density but
      re-reads the x/g row panels once per active block; wins when
      density * (K/bk + N/bn) is small.
    * 'dense': one XLA pass x^T @ g times the expanded mask — MXU-bound,
      reads each operand once; wins for large-M layers.
  'auto' picks by that traffic model.
  """
  return _v3_impl(x, w, block_mask, block, bm, interpret)


def _v3_impl(x, w, block_mask, block, bm, interpret):
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  m, kdim = x.shape
  _, n = w.shape
  bk, bn = block
  if m % bm or kdim % bk or n % bn:
    raise ValueError(f'shapes ({m},{kdim},{n}) must divide tiles '
                     f'bm={bm}, block={block}')
  counts, idx = pack_block_indices(block_mask)

  kernel = functools.partial(_v3_kernel, bk=bk, bn=bn)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(m // bm, n // bn),
          in_specs=[
              # Full x row-panel auto-pipelined to VMEM; constant along j.
              pl.BlockSpec((bm, kdim), lambda i, j, c, ix: (i, 0)),
              pl.BlockSpec(memory_space=pl.ANY),   # w stays in HBM
          ],
          out_specs=pl.BlockSpec((bm, bn), lambda i, j, c, ix: (i, j)),
          scratch_shapes=[
              pltpu.VMEM((2, bk, bn), w.dtype),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
      interpret=interpret,
  )(counts, idx, x, w)


def _v3_fwd(x, w, block_mask, block, bm, interpret, dw_mode):
  return _v3_impl(x, w, block_mask, block, bm, interpret), (x, w, block_mask)


# Density assumed by the 'auto' dw traffic model; actual per-layer density
# is a traced value (mask evolves on device) so the choice must be static.
_AUTO_DENSITY = 0.3


def _v3_bwd(block, bm, interpret, dw_mode, residuals, gy):
  from rigl_tpu.ops.pallas.block_sparse import _pad_to
  x, w, block_mask = residuals
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  bk, bn = block
  dx = _v3_impl(gy, w.T, block_mask.T.astype(jnp.int32), (bn, bk), bm,
                interpret)
  kdim, n = w.shape
  if dw_mode == 'auto':
    # gather re-reads (bk + bn)-wide row panels once per active block;
    # the dense pass reads each operand once and is MXU-bound.
    gather_bytes = (_AUTO_DENSITY * (kdim // bk) * (n // bn) * (bk + bn))
    dw_mode = 'gather' if gather_bytes < (kdim + n) else 'dense'
  if dw_mode == 'dense':
    from rigl_tpu.ops.block_mask import expand_from_blocks
    dw = jax.lax.dot_general(
        x, gy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = (dw * expand_from_blocks(block_mask, (kdim, n), block)
          ).astype(w.dtype)
  else:
    gp, _ = _pad_to(gy, bm, 0)
    xp, _ = _pad_to(x, bm, 0)
    dw = _dw_blocksparse_v2(xp, gp, block_mask.astype(jnp.int32), block, bm,
                            w.dtype, interpret)
  return dx, dw, None


block_sparse_matmul_v3.defvjp(_v3_fwd, _v3_bwd)


# ------------------------------------------------------------- dw gather --
def _dw_v2_kernel(coords_ref, flags_ref, x_hbm, g_hbm, o_ref, acc_ref,
                  x_buf, g_buf, sems, *, bm, bk, bn):
  """dw tile (i, j) = sum_ms x[ms, i]^T @ g[ms, j], gathered.

  Grid (n_blocks, M/bm): s enumerates output blocks active-first (coords
  packed by the host-side argsort in _dw_blocksparse_v2); inactive blocks
  issue NO DMA and no MXU work — they only flush a zero tile — so HBM
  traffic scales with density, unlike the predicated kernel in
  block_sparse.py whose auto-pipeline streams every tile regardless.
  """
  s = pl.program_id(0)
  ms = pl.program_id(1)
  nms = pl.num_programs(1)
  active = flags_ref[s] != 0
  i = coords_ref[s, 0]
  j = coords_ref[s, 1]

  def copies(m_idx, slot):
    row = m_idx * bm
    cx = pltpu.make_async_copy(
        x_hbm.at[pl.ds(row, bm), pl.ds(i * bk, bk)], x_buf.at[slot],
        sems.at[slot, 0])
    cg = pltpu.make_async_copy(
        g_hbm.at[pl.ds(row, bm), pl.ds(j * bn, bn)], g_buf.at[slot],
        sems.at[slot, 1])
    return cx, cg

  @pl.when(ms == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(active & (ms == 0))
  def _():
    cx, cg = copies(0, 0)
    cx.start()
    cg.start()

  slot = jax.lax.rem(ms, 2)

  @pl.when(active & (ms + 1 < nms))
  def _():
    cx, cg = copies(ms + 1, 1 - slot)
    cx.start()
    cg.start()

  @pl.when(active)
  def _():
    cx, cg = copies(ms, slot)
    cx.wait()
    cg.wait()
    acc_ref[:] += jax.lax.dot_general(
        x_buf[slot], g_buf[slot],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(ms == nms - 1)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _dw_blocksparse_v2(x, g, block_mask, block, bm, out_dtype, interpret):
  """dw = x^T @ g restricted to active blocks; zeros elsewhere.

  x: (M, K), g: (M, N), block_mask: (K/bk, N/bn).  M must divide bm
  (pad upstream), K/N must divide the block.
  """
  m, kdim = x.shape
  _, n = g.shape
  bk, bn = block
  nb = n // bn
  flat = block_mask.astype(jnp.int32).reshape(-1)
  order = jnp.argsort(-flat, stable=True).astype(jnp.int32)
  flags = flat[order]
  coords = jnp.stack([order // nb, order % nb], axis=1)

  kernel = functools.partial(_dw_v2_kernel, bm=bm, bk=bk, bn=bn)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(flat.shape[0], m // bm),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY),
          ],
          out_specs=pl.BlockSpec(
              (bk, bn), lambda s, ms, coords, flags: (coords[s, 0],
                                                      coords[s, 1])),
          scratch_shapes=[
              pltpu.VMEM((bk, bn), jnp.float32),
              pltpu.VMEM((2, bm, bk), x.dtype),
              pltpu.VMEM((2, bm, bn), g.dtype),
              pltpu.SemaphoreType.DMA((2, 2)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((kdim, n), out_dtype),
      interpret=interpret,
  )(coords, flags, x, g)


# ---------------------------------------------------------------- control --
def _dense_kernel(x_ref, w_ref, o_ref, acc_ref):
  k = pl.program_id(2)

  @pl.when(k == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                        preferred_element_type=jnp.float32)

  @pl.when(k == pl.num_programs(2) - 1)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_dense_matmul(x, w, tiles: Tuple[int, int, int] = (512, 512, 512),
                        interpret: Optional[bool] = None):
  """Plain tiled Pallas matmul (auto-pipelined), the kernel-overhead control."""
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  m, kdim = x.shape
  _, n = w.shape
  bm, bk, bn = tiles
  return pl.pallas_call(
      _dense_kernel,
      grid=(m // bm, n // bn, kdim // bk),
      in_specs=[
          pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
          pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
      ],
      out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
      scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
      out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
      interpret=interpret,
  )(x, w)

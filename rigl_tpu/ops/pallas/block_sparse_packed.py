"""Packed block-sparse tensors: weights, gradients, and optimizer state in
O(density) memory, with fully auto-pipelined matmul kernels.

The reference stores dense latent weights and multiplies masks in
(sparse_optimizers_base.py) — size savings appear only at export.  Here the
TPU-native representation IS sparse: a weight matrix lives as its active
blocks `(n_active, bk, bn)` plus a static packing (column-major coords +
per-entry packed-slot indices).  Consequences:

  * fwd / dx fetch exactly the active blocks (Mosaic auto-pipelines them
    through scalar-prefetch BlockSpec index maps — same structure as v6);
  * dw is computed PACKED (one grid entry per active block, no dense pass,
    no masking multiply) — gradient traffic scales with density;
  * the optimizer updates the packed array directly, so momentum/Adam
    slots cost density * dense, and the premask invariant holds by
    construction (inactive weights do not exist).

Drop/grow updates change WHICH blocks are active but not the count, so all
shapes are static across mask updates; repacking is a gather on the packed
axis (repack_permutation).

n_entries = n_active + nn for fwd/bwd matmuls, ACTIVES FIRST (column-major)
then the nn dummies (attached + empty-column; see pack_columns_slots) —
so actives-only grids (dw always; fwd/dx in decode-size calls) are free
static slices of the entry lists.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ----------------------------------------------------------- packing ------
@jax.tree_util.register_pytree_node_class
class Packing:
  """fwd/bwd entry lists + the STATIC occupancy-grid shape (aux data, so
  jit/device_put never trace it)."""

  def __init__(self, fwd, bwd, shape):
    self.fwd = fwd
    self.bwd = bwd
    self.shape = tuple(shape)

  def __getitem__(self, key):          # dict-style access
    return {'fwd': self.fwd, 'bwd': self.bwd, 'shape': self.shape}[key]

  def tree_flatten(self):
    return (self.fwd, self.bwd), self.shape

  @classmethod
  def tree_unflatten(cls, shape, children):
    return cls(children[0], children[1], shape)


def pack_columns_slots(block_mask: jnp.ndarray, n_active: int):
  """(nk, nn) occupancy -> (cols, rows, slots, valid), each (n_active+nn,).

  Entry order: ALL ACTIVES FIRST (column-major), then the nn dummies —
  "attached" dummies (one per NON-empty column) immediately after, each
  forward-filling the final active entry's col/row/slot so every one of
  its DMA indices is unchanged (Mosaic skips all fetches; the final
  column's output write migrates to the last attached dummy), then
  "empty-column" dummies carrying their own col (they zero-write the
  output tiles of columns with no active block).  Actives-first makes the
  actives-only grid (_mm_call rowmode=act, _dw_call) a FREE static slice
  [:n_active] — no per-call argsort/gather on device — while the full
  walk stays correct: attached dummies are no-op grid steps, empty
  dummies first-and-last their own column (acc zeroed, zero written).

  `slots` is the packed-axis index of each entry's block.  The PACKED
  LAYOUT is defined as column-major active order, so for the fwd packing
  slots == arange over the actives; the bwd (transposed) packing maps its
  entries into the SAME layout via a permutation lookup (make_packing).
  """
  nk, nn = block_mask.shape
  occ = block_mask.astype(jnp.int32)
  n_entries = n_active + nn
  col_idx = jax.lax.broadcasted_iota(jnp.int32, (nk, nn), 1)
  row_idx = jax.lax.broadcasted_iota(jnp.int32, (nk, nn), 0)
  # Sort-key bands: actives (column-major) < attached dummies <
  # empty-column dummies (by column) < inactive blocks (truncated away).
  big = nn * (nk + 1)
  key_real = jnp.where(occ > 0, col_idx * (nk + 1) + row_idx,
                       big + nn + 2).T.reshape(-1)
  col_count = occ.sum(axis=0)
  j = jnp.arange(nn, dtype=jnp.int32)
  key_dummy = jnp.where(col_count == 0, big + 1 + j, big)
  keys = jnp.concatenate([key_real, key_dummy])
  cols_all = jnp.concatenate([col_idx.T.reshape(-1), j])
  rows_all = jnp.concatenate([row_idx.T.reshape(-1),
                              jnp.zeros((nn,), jnp.int32)])
  valid_all = jnp.concatenate([occ.T.reshape(-1),
                               jnp.zeros((nn,), jnp.int32)])
  order = jnp.argsort(keys, stable=True)[:n_entries]
  keys = keys[order]
  cols = cols_all[order].astype(jnp.int32)
  rows = rows_all[order].astype(jnp.int32)
  valid = valid_all[order].astype(jnp.int32)
  # Dummies forward-fill the previous VALID entry's row (their compute is
  # skipped, so the value is semantically free): the sliced mm variant's
  # x BlockSpec indexes on rows, and an unchanged index lets Mosaic skip
  # the prefetch.  Attached dummies (key == big) forward-fill col too.
  pos = jnp.arange(n_entries, dtype=jnp.int32)
  last_valid = jax.lax.cummax(jnp.where(valid == 1, pos, -1))
  fill = jnp.maximum(last_valid, 0)
  rows = jnp.where(valid == 1, rows,
                   jnp.where(last_valid >= 0, rows[fill], 0))
  cols = jnp.where((valid == 0) & (keys == big) & (last_valid >= 0),
                   cols[fill], cols)
  slots = jnp.maximum(jnp.cumsum(valid) - 1, 0).astype(jnp.int32)
  return cols, rows, slots, valid


def make_packing(block_mask: jnp.ndarray, n_active: int):
  """fwd + bwd packings sharing ONE packed layout (fwd column-major).

  bwd slots point into the fwd layout: entry for block (k, j) in the
  transposed walk gets the slot that block holds in the fwd packing.
  """
  nk, nn = block_mask.shape
  fc, fr, fs, fv = pack_columns_slots(block_mask, n_active)
  bc, br, bs_local, bv = pack_columns_slots(block_mask.T, n_active)
  # Map fwd slots onto the dense grid, then read out at the bwd walk's
  # (row=bc? col?) coordinates: bwd entry visits block (k=bc[s], j=br[s]).
  grid = jnp.zeros((nk, nn), jnp.int32).at[fr, fc].max(
      jnp.where(fv == 1, fs, 0))
  bslots = jnp.where(bv == 1, grid[bc, br], 0).astype(jnp.int32)
  return Packing((fc, fr, fs, fv), (bc, br, bslots, bv), (nk, nn))


def pack_dense(w: jnp.ndarray, packing, block: Tuple[int, int]):
  """Dense (K, N) -> packed (n_active, bk, bn) in the fwd layout."""
  bk, bn = block
  nk, nn = packing['shape']
  cols, rows, slots, valid = packing['fwd']
  blocks = w.reshape(nk, bk, nn, bn).transpose(0, 2, 1, 3)   # (nk, nn, bk, bn)
  picked = blocks[rows, cols]                                # (n_entries, ...)
  n_act = picked.shape[0] - nn
  out = jnp.zeros((n_act, bk, bn), w.dtype)
  out = out.at[slots].add(jnp.where((valid == 1)[:, None, None], picked, 0))
  return out


def unpack_dense(packed: jnp.ndarray, packing, block: Tuple[int, int],
                 dtype=None):
  """Packed (n_active, bk, bn) -> dense (K, N) with zeros at inactive."""
  bk, bn = block
  nk, nn = packing['shape']
  cols, rows, slots, valid = packing['fwd']
  blocks = jnp.zeros((nk, nn, bk, bn), dtype or packed.dtype)
  vals = jnp.where((valid == 1)[:, None, None], packed[slots], 0)
  blocks = blocks.at[rows, cols].add(vals)
  return blocks.transpose(0, 2, 1, 3).reshape(nk * bk, nn * bn)


def repack_permutation(old_packing, new_packing):
  """Gather indices g with new_data = old_data[g] for surviving blocks;
  entries new in the mask get index -1 (caller fills grow-init values)."""
  nk, nn = old_packing['shape']
  oc, orow, oslot, ov = old_packing['fwd']
  grid = jnp.full((nk, nn), -1, jnp.int32).at[orow, oc].max(
      jnp.where(ov == 1, oslot, -1))
  ncols, nrows, nslots, nv = new_packing['fwd']
  n_act = int(nrows.shape[0]) - nn
  perm = jnp.full((n_act,), -1, jnp.int32)
  src = jnp.where(nv == 1, grid[nrows, ncols], -1)
  return perm.at[nslots].max(jnp.where(nv == 1, src, -1))


# ----------------------------------------------------------- kernels ------
def _mm_kernel(cols_ref, rows_ref, slots_ref, valid_ref, x_ref, w_ref,
               o_ref, acc_ref, *, bk, transpose_w, x_sliced):
  s = pl.program_id(1)
  ns = pl.num_programs(1)
  first = jnp.logical_or(
      s == 0, cols_ref[s] != cols_ref[jnp.maximum(s - 1, 0)])

  @pl.when(first)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(valid_ref[s] != 0)
  def _():
    if x_sliced:
      xt = x_ref[:]                       # (bm, bk) slice fetched by spec
    else:
      k = rows_ref[s] * bk
      xt = x_ref[:, pl.ds(k, bk)]
    if transpose_w:
      acc_ref[:] += jax.lax.dot_general(
          xt, w_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
    else:
      acc_ref[:] += jnp.dot(xt, w_ref[0],
                            preferred_element_type=jnp.float32)

  last = jnp.logical_or(
      s == ns - 1, cols_ref[jnp.minimum(s + 1, ns - 1)] != cols_ref[s])

  @pl.when(last)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _clamp_bm(bm: int, m: int, kdim: int, out_bn: int, block) -> int:
  """Largest bm (halving from the request, divisor of m) whose VMEM
  working set fits the ~16MB/core budget: double-buffered x row panel
  (bm, kdim) + w block + out tile, f32 accumulator.  A (bm=512, K=8192)
  request otherwise OOMs scoped vmem (observed on v5e: 19MB > 16MB)."""
  bk, bn = block
  limit = 13 * 2 ** 20
  while bm > 8:
    need = (2 * bm * kdim * 2          # x panel, double-buffered, bf16
            + 2 * bk * bn * 2          # w block
            + 2 * bm * out_bn * 2      # out tile
            + bm * out_bn * 4)         # f32 accumulator
    if need <= limit and m % bm == 0:
      return bm
    bm //= 2
  return bm


def _clamp_bm_sliced(bm: int, m: int, bk_eff: int, out_bn: int, block,
                     itemsize: int) -> int:
  """bm clamp for the x-SLICED variant: the x tile is (bm, bk_eff), so
  VMEM no longer scales with the full contraction width and bm can grow
  to m itself (fetching each weight block exactly once)."""
  bk, bn = block
  limit = 13 * 2 ** 20
  while bm > 8:
    need = (2 * bm * bk_eff * itemsize   # x slice, double-buffered
            + 2 * bk * bn * itemsize     # w block
            + 2 * bm * out_bn * itemsize # out tile
            + bm * out_bn * 4)           # f32 accumulator
    if need <= limit and m % bm == 0:
      return bm
    bm //= 2
  return bm


def _mm_call(x, w_packed, pk, block, bm, interpret, transpose_w, n_out):
  """block is ALWAYS the storage orientation (bk, bn) of the packed blocks.
  transpose_w: x is gy (m, N); slices are bn-wide (N-axis), output tiles
  bk-wide (K-axis), w contracted on its stored N axis.

  Two x-feed variants, picked by an HBM-traffic model (override with
  RIGL_PACKED_MM_VARIANT=panel|slice):
    * panel — x spec is the full (bm, kdim) row panel (fetched once per
      m-tile; kernel slices the bk window dynamically).  VMEM scales with
      kdim, capping bm and so multiplying weight-block refetch across
      m-tiles (m/bm passes over the packed array).
    * slice — x spec is the (bm, bk) slice the entry needs, indexed by the
      prefetched row list (as the dw kernel).  VMEM is kdim-independent so
      bm can reach m: weight blocks are fetched exactly once, at the cost
      of re-fetching x slices per entry (n_entries * m * bk bytes)."""
  m, _ = x.shape
  bk, bn = block
  cols, rows, slots, valid = pk
  n_entries = cols.shape[0]
  out_bn = bk if transpose_w else bn
  bk_eff = bn if transpose_w else bk
  xs = x.dtype.itemsize
  ws = w_packed.dtype.itemsize
  # Actives-only grid (RIGL_PACKED_MM_ROWMODE=act|dummy|auto): drop the
  # nn dummy entries.  Actives-first packing order (pack_columns_slots)
  # makes this a FREE static slice — no device argsort (the first cut of
  # this mode sorted per call inside the decode scan and measured as a
  # net regression, PERF.md round-3).  The kernel's first/last
  # column-compare logic is dummy-agnostic; the dummies' only
  # irreplaceable job is writing the output tiles of EMPTY block-columns,
  # replaced here by a jnp.where column-presence mask on the result.
  # That mask is an extra elementwise pass over (m, n_out), so this pays
  # when m is small — decode/serving steps, where dummy grid steps were
  # ~half the packed kernel time (PERF.md round-3 serving section).
  n_cols_walk = n_out // out_bn
  n_act = n_entries - n_cols_walk
  rowmode = os.environ.get('RIGL_PACKED_MM_ROWMODE', 'auto')
  # auto: act when the where-mask pass is cheap (small m — decode steps,
  # measured 273 vs 288 us/tok at batch-1 s=0.8) OR when dummies utterly
  # dominate the grid (n_act <= n_cols/4 — the s=0.95@512-block regime,
  # measured +4.3% gross on that train arm).  The threshold is strict
  # because the (m, n_out) where pass is expensive at training m: at
  # s=0.8@512-block (n_act ~= 0.75*n_cols) flipping to act cost the
  # transformer arm -12% e2e (PERF.md round 4), so anything short of
  # dummy-dominated grids keeps the dummy walk.
  actives_only = n_act > 0 and (
      rowmode == 'act'
      or (rowmode == 'auto' and (m <= 256 or n_act <= n_cols_walk // 4)))
  if actives_only:
    cols, rows, slots = cols[:n_act], rows[:n_act], slots[:n_act]
    valid = valid[:n_act]
    n_entries = n_act
  # The bm request is a hint: both variants grow it to m when VMEM allows
  # (fewer m-tiles = fewer passes over the packed weight array).
  bm_panel = _clamp_bm(max(bm, m), m, x.shape[1], out_bn, block)
  bm_slice = _clamp_bm_sliced(max(bm, m), m, bk_eff, out_bn, block, xs)
  traffic_panel = (m * x.shape[1] * xs
                   + (m // bm_panel) * n_entries * bk * bn * ws)
  traffic_slice = (n_entries * m * bk_eff * xs
                   + (m // bm_slice) * n_entries * bk * bn * ws)
  variant = os.environ.get('RIGL_PACKED_MM_VARIANT', 'auto')
  if variant == 'auto':
    variant = 'slice' if traffic_slice < traffic_panel else 'panel'
  x_sliced = variant == 'slice'
  bm = bm_slice if x_sliced else bm_panel
  kernel = functools.partial(_mm_kernel, bk=bk_eff,
                             transpose_w=transpose_w, x_sliced=x_sliced)
  if x_sliced:
    x_spec = pl.BlockSpec((bm, bk_eff), lambda i, s, c, r, sl, v: (i, r[s]))
  else:
    x_spec = pl.BlockSpec((bm, x.shape[1]), lambda i, s, c, r, sl, v: (i, 0))
  y = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=4,
          grid=(m // bm, n_entries),
          in_specs=[
              x_spec,
              pl.BlockSpec((1, bk, bn),
                           lambda i, s, c, r, sl, v: (sl[s], 0, 0)),
          ],
          out_specs=pl.BlockSpec((bm, out_bn),
                                 lambda i, s, c, r, sl, v: (i, c[s])),
          scratch_shapes=[pltpu.VMEM((bm, out_bn), jnp.float32)],
      ),
      out_shape=jax.ShapeDtypeStruct((m, n_out), x.dtype),
      interpret=interpret,
  )(cols, rows, slots, valid, x, w_packed)
  if actives_only:
    # Tiles of block-columns with no active entry were never visited —
    # their contents are uninitialized.  where (not multiply: garbage may
    # be NaN/Inf) zeroes exactly those columns.
    counts = jnp.zeros((n_cols_walk,), jnp.int32).at[cols].add(1)
    y = jnp.where(jnp.repeat(counts > 0, out_bn)[None, :], y, 0)
  return y


def _dw_kernel(cols_ref, rows_ref, x_ref, g_ref, o_ref, acc_ref):
  ms = pl.program_id(1)
  nms = pl.num_programs(1)

  @pl.when(ms == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  acc_ref[:] += jax.lax.dot_general(
      x_ref[:], g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  @pl.when(ms == nms - 1)
  def _():
    o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _dw_panel_kernel(cols_ref, rows_ref, x_ref, g_ref, o_ref, acc_ref, *,
                     bm):
  """Column-panel dw: g_ref holds the block's FULL (m, bn) output-gradient
  column panel; its BlockSpec index depends only on cols[s], and actives
  are column-major, so Mosaic fetches each panel once per column run
  instead of once per (active block, m-tile) pair."""
  ms = pl.program_id(1)
  nms = pl.num_programs(1)

  @pl.when(ms == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  acc_ref[:] += jax.lax.dot_general(
      x_ref[:], g_ref[pl.ds(ms * bm, bm), :],
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  @pl.when(ms == nms - 1)
  def _():
    o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _dw_call(x, gy, packing, block, bm, interpret, out_dtype):
  """Packed dw: grid (n_active, M/bm), auto-pipelined x/g tiles, each
  active block's accumulator flushes straight into its packed slot."""
  m, kdim = x.shape
  bk, bn = block
  nk, nn = packing['shape']
  cols, rows, slots, valid = packing['fwd']
  n_act = cols.shape[0] - nn
  if n_act == 0:
    return jnp.zeros((0, bk, bn), out_dtype)
  # bm must divide m or trailing rows silently drop from dw: clamp by
  # halving (mirror of _mm_call's _clamp_bm) and fail loudly if no
  # power-of-two reduction of the request divides m.
  while bm > 8 and m % bm:
    bm //= 2
  if m % bm:
    raise ValueError(
        f'packed dw: no bm halved from the request divides m ({m}); pad '
        'the row axis to a multiple of 8 (PackedDense does this).')
  # dw grid wants actives only, ordered by slot: actives-first packing
  # order (pack_columns_slots) makes that the first n_act entries — a
  # free static slice, no device argsort.
  acols = cols[:n_act]
  arows = rows[:n_act]
  # Column-panel variant: keep the whole (m, bn) g panel resident across a
  # column's active blocks (actives are column-major), so g traffic drops
  # from n_act*m*bn to one pass m*N.  Profitable only when columns average
  # >1 active block (n_act > nn) and the working set fits scoped VMEM:
  # double-buffered g panel + x tile (actual dtypes) + double-buffered
  # packed out tile + f32 accumulator, same 13MB budget as _clamp_bm.
  panel_need = (2 * m * bn * gy.dtype.itemsize
                + 2 * bm * bk * x.dtype.itemsize
                + 2 * bk * bn * jnp.dtype(out_dtype).itemsize
                + bk * bn * 4)
  use_panel = n_act > nn and panel_need <= 13 * 2 ** 20
  if use_panel:
    return pl.pallas_call(
        functools.partial(_dw_panel_kernel, bm=bm),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_act, m // bm),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda s, ms, c, r: (ms, r[s])),
                pl.BlockSpec((m, bn), lambda s, ms, c, r: (0, c[s])),
            ],
            out_specs=pl.BlockSpec((1, bk, bn),
                                   lambda s, ms, c, r: (s, 0, 0)),
            scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_act, bk, bn), out_dtype),
        interpret=interpret,
    )(acols, arows, x, gy)
  return pl.pallas_call(
      _dw_kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(n_act, m // bm),
          in_specs=[
              pl.BlockSpec((bm, bk), lambda s, ms, c, r: (ms, r[s])),
              pl.BlockSpec((bm, bn), lambda s, ms, c, r: (ms, c[s])),
          ],
          out_specs=pl.BlockSpec((1, bk, bn), lambda s, ms, c, r: (s, 0, 0)),
          scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
      ),
      out_shape=jax.ShapeDtypeStruct((n_act, bk, bn), out_dtype),
      interpret=interpret,
  )(acols, arows, x, gy)


# ------------------------------------------------------------- public -----
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def packed_matmul(x, w_packed, packing,
                  block: Tuple[int, int] = (512, 512),
                  bm: int = 512,
                  interpret: Optional[bool] = None,
                  n_out: Optional[int] = None):
  """y = x @ W where W is the packed block-sparse tensor.

  Gradients: dx through the bwd packing (no transpose materialization),
  dw PACKED — same layout as w_packed, ready for the optimizer."""
  return _packed_fwd(x, w_packed, packing, block, bm, interpret, n_out)[0]


def _resolve(packing, block, n_out):
  nk, nn = packing['shape']
  return (nn * block[1]) if n_out is None else n_out


def _packed_fwd(x, w_packed, packing, block, bm, interpret, n_out):
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  y = _mm_call(x, w_packed, packing['fwd'], block, bm, interpret, False,
               _resolve(packing, block, n_out))
  return y, (x, w_packed)


def _packed_fwd_res(x, w_packed, packing, block, bm, interpret, n_out):
  y, _ = _packed_fwd(x, w_packed, packing, block, bm, interpret, n_out)
  return y, (x, w_packed, packing)


def _packed_bwd(block, bm, interpret, n_out, residuals, gy):
  x, w_packed, packing = residuals
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  bk, bn = block
  kdim = packing['shape'][0] * bk
  dx = _mm_call(gy, w_packed, packing['bwd'], block, bm, interpret,
                True, kdim)
  dw = _dw_call(x, gy, packing, block, bm, interpret, w_packed.dtype)
  return dx, dw, None


packed_matmul.defvjp(_packed_fwd_res, _packed_bwd)

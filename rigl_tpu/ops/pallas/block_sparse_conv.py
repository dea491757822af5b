"""Direct block-sparse spatial conv: shift-and-matmul, no im2col.

The FLOP mass of a sparse ResNet sits in 3x3 convs whose ERK sparsity is
high (group3/4 at 80% overall ERK are ~85-92% sparse) but which the matmul
kernels (v3/v4) cannot serve: im2col materializes kh*kw x the activations,
which loses to XLA's dense conv on HBM bandwidth (PERF.md round-1).

This kernel exploits a layout identity instead.  Compute the conv on the
*spatially padded* output grid: with x padded to (N, H+2ph, W+2pw, Cin) and
flattened to rows r = (n, hp, wp), the contribution of tap (dy, dx) to
output row r is exactly input row r + delta_t where

    delta_t = (dy - ph) * Wp + (dx - pw)        (a compile-time constant)

— reads that would cross an image row or image boundary land on zero padding
rows, which is precisely SAME-conv semantics.  So a stride-1 SAME conv is a
sum of kh*kw constant row-shifts of one flattened 2D activation buffer, each
a (Cin x Cout) matmul — and with per-tap block masks
(ops/block_mask.py tap layout), each tap is *block-sparse*: the kernel's
grid enumerates only active (tap, cin-block, cout-block) triples (the v4
flat-packing idea), so MXU work and weight traffic scale with density.
Each grid step DMAs its exact (bm x bk) shifted x tile from HBM
(double-buffered against the dot) — total activation traffic is
density * kh*kw * one-full-read, i.e. *below* one full read once tap
density < 1/(kh*kw), and ~1-2x of it at ResNet ERK densities; far below
the kh*kw x writes+reads of im2col.

Padded-grid overhead: outputs at pad positions are discarded — a factor
(Hp*Wp)/(H*W) of wasted rows (1.31x at 14x14, 1.65x at 7x7), far below the
kh*kw = 9x of im2col and applied only to the ~10-15% of blocks that are
active.

Backward: dx is the SAME kernel with spatially flipped taps, per-tap
transposed blocks, and w9[t]^T (the adjoint of pad->shift-sum->crop is
crop->flipped-shift-sum->pad).  dw is emitted as XLA's native
conv-backward-filter (batch<->feature swapped dimension numbers) times the
expanded mask — dot_general formulations of dw force layout conversions
inside conv models (PERF.md).

Reference: this implements the *executable* form of the mask semantics in
sparse_optimizers_base.py:276-343 (drop/grow) for spatial convs; the
reference computed dense math under element masks everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_tap_active(occ3: jnp.ndarray, n_active: int):
  """(T, K/bk, N/bn) occupancy -> (cols, rows, taps) packing of the active
  blocks, column-major by cout-block (so each output column is one
  contiguous run).

  The packing carries, per cout column, one leading DUMMY entry (tap = -1):
  the kernel zero-initializes the column's accumulator on it, so every
  output tile gets written even when a column has no active block — no
  post-hoc empty-column select pass.  One sentinel entry (-1/0/0) closes
  the list.  Total length = n_active + nn + 1, static.

  `n_active` must equal the true active count — static through training for
  drop/grow-family block masks (SparseTraining.static_block_counts).
  """
  t_dim, nk, nn = occ3.shape
  # Column-major: all active blocks of cout-column j are contiguous.
  flat_cm = occ3.astype(jnp.int32).transpose(2, 0, 1).reshape(-1)
  order = jnp.argsort(-flat_cm, stable=True)[:n_active].astype(jnp.int32)
  cols = order // (t_dim * nk)
  rem = order % (t_dim * nk)
  taps = rem // nk
  rows = rem % nk
  # One dummy per column; stable sort by column puts each dummy first
  # within its column (dummies are concatenated in front).
  cols = jnp.concatenate([jnp.arange(nn, dtype=jnp.int32), cols])
  rows = jnp.concatenate([jnp.zeros((nn,), jnp.int32), rows])
  taps = jnp.concatenate([jnp.full((nn,), -1, jnp.int32), taps])
  order2 = jnp.argsort(cols, stable=True)
  cols, rows, taps = cols[order2], rows[order2], taps[order2]
  cols = jnp.concatenate([cols, jnp.full((1,), -1, jnp.int32)])
  rows = jnp.concatenate([rows, jnp.zeros((1,), jnp.int32)])
  taps = jnp.concatenate([taps, jnp.full((1,), -1, jnp.int32)])
  return cols, rows, taps


def _occupancy3(cols, rows, taps, t_dim, nk, nn):
  """Reconstructs the (T, K/bk, N/bn) occupancy from the packing
  (dummy/sentinel entries carry tap = -1 and are ignored)."""
  occ = jnp.zeros((t_dim + 1, nk, nn), jnp.int32)
  occ = occ.at[taps, rows, cols].max(jnp.where(taps >= 0, 1, 0))
  return occ[:t_dim]


# Sublane-tile alignment required of dynamic DMA row starts (bf16 VMEM
# tiling is (16, 128); 16 also covers the f32 (8, 128) case).
_ALIGN = 16


def tap_batch_ok(n: int, interpret: Optional[bool] = None) -> bool:
  """True if a batch of n images can run the tap kernel (alignment)."""
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  return interpret or n % _ALIGN == 0


# deltas_ref entry encoding: tap * 2**22 + valid * 2**21 + row_offset,
# row_offset < 2**20.  Dummy entries (column zero-init) have valid = 0.
_OFF_BITS = 2 ** 21
_TAP_BITS = 2 ** 22


def _conv_kernel(cols_ref, rows_ref, deltas_ref, x_hbm, w_hbm, o_ref,
                 acc_ref, x_buf, w_buf, sem_x, sem_w, *, bk, bn, bm):
  i = pl.program_id(0)
  s = pl.program_id(1)
  ns = pl.num_programs(1)
  j = cols_ref[s]

  # Each active block (tap, ci, j) reads x rows [i*bm + offset_tap, +bm) of
  # the staged flattened activations — DMA'd per step (DMAs take arbitrary
  # row offsets; a VMEM-resident panel with a dynamic sublane slice does
  # not lower in Mosaic).  Both tiles double-buffer across s, so the copies
  # for s+1 overlap the dot for s.
  def x_copy(si, slot):
    # Row starts are provably sublane-aligned: the (Hp, Wp, N, C) layout
    # makes every tap shift a multiple of N, and _conv_impl requires
    # N % _ALIGN == 0 (multiple_of communicates it to Mosaic).
    start = pl.multiple_of(i * bm + deltas_ref[si] % _OFF_BITS, _ALIGN)
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, bm), pl.ds(rows_ref[si] * bk, bk)],
        x_buf.at[slot], sem_x.at[slot])

  def w_copy(si, slot):
    return pltpu.make_async_copy(
        w_hbm.at[deltas_ref[si] // _TAP_BITS, pl.ds(rows_ref[si] * bk, bk),
                 pl.ds(cols_ref[si] * bn, bn)],
        w_buf.at[slot], sem_w.at[slot])

  @pl.when(s == 0)
  def _():
    x_copy(0, 0).start()
    w_copy(0, 0).start()

  slot = jax.lax.rem(s, 2)

  @pl.when(s + 1 < ns)
  def _():
    x_copy(s + 1, 1 - slot).start()
    w_copy(s + 1, 1 - slot).start()

  x_copy(s, slot).wait()
  w_copy(s, slot).wait()
  valid = (deltas_ref[s] // _OFF_BITS) % 2 != 0
  prod = jnp.where(
      valid,
      jnp.dot(x_buf[slot], w_buf[slot], preferred_element_type=jnp.float32),
      jnp.zeros((bm, bn), jnp.float32))

  prev_j = cols_ref[jax.lax.max(s - 1, 0)]
  is_first = (s == 0) | (prev_j != j)
  # select, not multiply-by-flag: the scratch is uninitialized on the first
  # visit of a column and 0 * garbage would still poison the accumulator.
  # Every column's run starts with its dummy entry (prod = 0), so empty
  # columns still write a zero tile.
  acc_ref[:] = jnp.where(is_first, prod, acc_ref[:] + prod)

  next_j = cols_ref[s + 1]  # sentinel makes this safe at s == ns-1
  is_last = (s + 1 == ns) | (next_j != j)

  @pl.when(is_last)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _shift_matmul(x2d_staged, w9, cols, rows, deltas, m_pad, block, bm,
                  interpret):
  """Core pallas call on the staged flattened padded grid.

  x2d_staged: (rows >= max read, Cin) zero-padded staging buffer;
  w9: (T, Cin, Cout); deltas: per-entry tap/valid/row-offset encoding
  (one scalar-prefetch vector).  Returns (m_pad, Cout), every output tile
  written (dummy entries cover empty columns).
  """
  t_dim, cin, cout = w9.shape
  bk, bn = block
  n_entries = cols.shape[0] - 1
  kernel = functools.partial(_conv_kernel, bk=bk, bn=bn, bm=bm)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(m_pad // bm, n_entries),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
              pl.BlockSpec(memory_space=pl.ANY),   # w stays in HBM
          ],
          out_specs=pl.BlockSpec((bm, bn), lambda i, s, c, r, d: (i, c[s])),
          scratch_shapes=[
              pltpu.VMEM((bm, bn), jnp.float32),
              pltpu.VMEM((2, bm, bk), x2d_staged.dtype),
              pltpu.VMEM((2, bk, bn), w9.dtype),
              pltpu.SemaphoreType.DMA((2,)),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((m_pad, cout), x2d_staged.dtype),
      interpret=interpret,
  )(cols, rows, deltas, x2d_staged, w9)


def _conv_impl(x, w4d, packing, block, bm, interpret):
  """y = SAME-conv(x, expanded(tap mask) * w4d), stride 1, NHWC.

  packing: {'cols','rows','taps'} flat tap packing (pack_tap_active).

  Internally the padded activations are laid out spatial-major with the
  batch dim MINOR — rows r = (hp*Wp + wp)*N + n — so every tap shift
  delta_t = ((dy-ph)*Wp + (dx-pw)) * N is a multiple of N, which makes the
  dynamic DMA row starts sublane-tile-aligned (Mosaic requires proof of
  divisibility by the (16, 128) bf16 tiling).  Costs one transpose of x in
  and of y out; XLA fuses the crop into the output transpose.
  """
  n, h, w_dim, cin = x.shape
  kh, kw, _, cout = w4d.shape
  bk, bn = block
  if cin % bk or cout % bn:
    raise ValueError(f'channels ({cin},{cout}) must divide block {block}')
  if (kh, kw) != (1, 1) and (kh % 2 == 0 or kw % 2 == 0):
    raise ValueError(
        f'tap conv requires odd spatial kernel dims, got ({kh},{kw}): the '
        'symmetric ph=k//2 padding differs from SAME semantics for even k')
  if not interpret and bm % _ALIGN:
    raise ValueError(f'bm {bm} must be a multiple of {_ALIGN}')
  if kh == 1 and kw == 1:
    # 1x1 fast path: no shifts (delta = 0 for the single tap), so no
    # batch-minor transpose and no spatial/halo staging — just a tail pad
    # to the bm multiple.  This serves every 1x1 conv with bm decoupled
    # from layer width (the v3/v4 matmul kernels hold a (bm, K) x panel in
    # VMEM, capping bm on wide layers; here tiles are (bm, 128) always).
    m = n * h * w_dim
    m_pad = -(-m // bm) * bm
    x2d = x.reshape(m, cin)
    if m_pad != m:
      x2d = jnp.pad(x2d, [(0, m_pad - m), (0, 0)])
    cols, rows, taps = packing['cols'], packing['rows'], packing['taps']
    w1 = w4d.reshape(1, cin, cout)
    if (default_tap_engine() == 'v5'
        and v5_feasible(1, cin, cout, 0, jnp.dtype(x.dtype).itemsize)):
      starts, ks = _tapcol_pack(cols, rows, taps, 1, cout // bn)
      y2d = _shift_matmul_v5(x2d, w1, starts, ks, m_pad, block, bm,
                             interpret, n_batch=n, kh=1, kw=1, wp=1,
                             t_off=0)
    else:
      valid = (taps >= 0).astype(jnp.int32)
      deltas = (valid * _OFF_BITS).astype(jnp.int32)
      y2d = _shift_matmul(x2d, w1, cols, rows, deltas,
                          m_pad, block, bm, interpret)
    return y2d[:m].reshape(n, h, w_dim, cout)
  if not interpret and n % _ALIGN:
    raise ValueError(
        f'batch {n} must be a multiple of {_ALIGN} for aligned tap shifts '
        '(route this layer dense instead)')
  ph, pw = kh // 2, kw // 2
  hp, wp = h + 2 * ph, w_dim + 2 * pw
  m = n * hp * wp
  m_pad = -(-m // bm) * bm
  halo = (ph * wp + pw) * n
  # Staging buffer: zeros everywhere except the transposed interior — the
  # spatial pad, the halo head, and the divisibility tail are all just
  # regions of one allocation, so the entire input prep is ONE fused
  # transpose+scatter pass (a separate jnp.pad chain costs 2-3 extra full
  # copies of the activations, PERF.md).
  top_img = ph + 1                       # (ph+1)*wp*n >= halo rows of zeros
  tail_img = -(-(halo + m_pad - m) // (wp * n))
  t_off = top_img * wp * n               # buffer row of padded-grid row 0
  if t_off + halo >= 2 ** 20:
    raise ValueError(f'row offset {t_off + halo} overflows delta packing')

  cols, rows, taps = packing['cols'], packing['rows'], packing['taps']

  xt = jnp.transpose(x, (1, 2, 0, 3))    # (H, W, N, C)
  staged = jnp.zeros((top_img + hp + tail_img, wp, n, cin), x.dtype)
  staged = staged.at[top_img + ph:top_img + ph + h, pw:pw + w_dim].set(xt)
  x2d = staged.reshape(-1, cin)
  w9 = w4d.reshape(kh * kw, cin, cout)
  if (default_tap_engine() == 'v5'
      and v5_feasible(kh * kw, cin, cout, halo,
                      jnp.dtype(x.dtype).itemsize)):
    starts, ks = _tapcol_pack(cols, rows, taps, kh * kw, cout // bn)
    y2d = _shift_matmul_v5(x2d, w9, starts, ks, m_pad, block, bm,
                           interpret, n_batch=n, kh=kh, kw=kw, wp=wp,
                           t_off=t_off)
  else:
    # Entry encoding: tap * 2**22 + valid * 2**21 + buffer row offset.
    valid = (taps >= 0).astype(jnp.int32)
    tap_safe = jnp.maximum(taps, 0)
    offset = t_off + valid * (
        (tap_safe // kw - ph) * wp + (tap_safe % kw - pw)) * n
    deltas = (tap_safe * _TAP_BITS + valid * _OFF_BITS
              + offset).astype(jnp.int32)

    y2d = _shift_matmul(x2d, w9, cols, rows, deltas, m_pad, block, bm,
                        interpret)
  y = y2d[:m].reshape(hp, wp, n, cout)[ph:ph + h, pw:pw + w_dim]
  return jnp.transpose(y, (2, 0, 1, 3))


# ------------------------------------------------------------- v5 engine --
_V5_VMEM_BUDGET = 14 * 1024 * 1024


def _v5_vmem_bytes(bm, halo, t_dim, cin, cout, itemsize):
  """Scoped-VMEM footprint of one v5 grid step (see _shift_matmul_v5)."""
  return (2 * (bm + 2 * halo) * cin * itemsize   # double-buffered x panel
          + bm * cout * 4                        # f32 accumulator
          + t_dim * cin * cout * itemsize        # resident tap weights
          + 2 * bm * cout * itemsize)            # pipelined output tile


def v5_feasible(t_dim, cin, cout, halo, itemsize=2) -> bool:
  """Whether the v5 engine can fit this layer at its minimum tile (the
  resident-weight design caps t_dim*cin*cout; callers fall back to the
  flat engine otherwise)."""
  return _v5_vmem_bytes(256, halo, t_dim, cin, cout,
                        itemsize) <= _V5_VMEM_BUDGET


def _tapcol_pack(cols, rows, taps, t_dim, nn):
  """Flat dummy/sentinel packing -> per-(tap, cout-column) CSR for v5.

  Entries sorted by cell = tap * nn + col; dummy/sentinel entries
  (tap < 0) sort to the end and are dropped (n_active = len - nn - 1,
  static).  Returns (starts, ks): starts (t_dim*nn + 1,) row offsets into
  ks (n_active,) cin-block indices.
  """
  n_active = cols.shape[0] - 1 - nn
  key = jnp.where(taps >= 0, taps * nn + cols, t_dim * nn)
  order = jnp.argsort(key, stable=True)
  ks = rows[order][:n_active].astype(jnp.int32)
  starts = jnp.searchsorted(
      key[order][:n_active], jnp.arange(t_dim * nn + 1),
      side='left').astype(jnp.int32)
  if n_active == 0:
    # Zero-length refs can't be indexed even in never-executed loop bodies;
    # one padding element (starts are all 0, so no trip reads it).
    ks = jnp.zeros((1,), jnp.int32)
  return starts, ks


def _conv_kernel_v5(starts_ref, ks_ref, x_hbm, w_ref, o_ref, acc_ref,
                    x_buf, sems, *, bk, bn, bm, nk, nn, tap_offs,
                    base_off, panel_rows):
  """One grid step per output row tile; the haloed x panel is VMEM-resident
  across the whole (tap, cout-column) sweep.

  vs the flat-entry engine (_conv_kernel): grid steps drop from
  n_tiles * n_entries to n_tiles — per-step fixed costs (pipeline flush,
  output handling) amortize over the entire sweep, and x is DMA'd once per
  tile (one big haloed panel) instead of once per active entry.  The
  (tap, column) loops are STATIC (python-unrolled), so every sublane
  offset is compile-time constant — only lane offsets (cin-block k) and
  leading indices are traced, which Mosaic supports (the v3 kernel's
  x_ref[:, pl.ds(k, bk)] pattern).  Per-cell entry ranges come from the
  CSR starts vector; empty cells cost one scalar compare.
  """
  i = pl.program_id(0)
  ni = pl.num_programs(0)

  def panel_copy(ti, slot):
    start = pl.multiple_of(ti * bm + base_off, _ALIGN)
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, panel_rows), :], x_buf.at[slot],
        sems.at[slot])

  @pl.when(i == 0)
  def _():
    panel_copy(0, 0).start()

  slot = jax.lax.rem(i, 2)

  @pl.when(i + 1 < ni)
  def _():
    panel_copy(i + 1, 1 - slot).start()

  panel_copy(i, slot).wait()
  acc_ref[:] = jnp.zeros_like(acc_ref)
  for t, xoff in enumerate(tap_offs):
    for j in range(nn):
      cell = t * nn + j

      def body(s, carry, xoff=xoff, j=j):
        k = ks_ref[s]
        xt = x_buf[slot, xoff:xoff + bm, pl.ds(k * bk, bk)]
        wt = w_ref[t * nk + k, :, j * bn:(j + 1) * bn]
        acc_ref[:, j * bn:(j + 1) * bn] += jnp.dot(
            xt, wt, preferred_element_type=jnp.float32)
        return carry

      jax.lax.fori_loop(starts_ref[cell], starts_ref[cell + 1], body, 0)
  o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _shift_matmul_v5(x2d_staged, w9, starts, ks, m_pad, block, bm,
                     interpret, *, n_batch, kh, kw, wp, t_off):
  """v5 core call on the same staged buffer _conv_impl builds.

  The staging invariants carry over unchanged: zeros above row t_off cover
  the most-negative tap shift, the tail covers halo + m_pad - m, so the
  haloed panel [i*bm + t_off - halo, + bm + 2*halo) is always in bounds
  and every out-of-image read lands on zeros.
  """
  t_dim, cin, cout = w9.shape
  bk, bn = block
  nk, nn = cin // bk, cout // bn
  ph, pw = kh // 2, kw // 2
  halo = (ph * wp + pw) * n_batch
  # VMEM-budget clamp: the double-buffered haloed panel + f32 accumulator +
  # resident tap weights + pipelined output tile must fit the ~16 MB scoped
  # vmem limit; at the default bm=2048, wide layers (7x7, 512ch, batch-128
  # halo) allocate ~20 MB and fail to compile in-model.  Halving preserves
  # correctness: m_pad is a multiple of the caller's bm, so any bm/2^k
  # still divides it.  (The measured g3/g4 wins were at bm=512 — panel
  # amortization, not tile size, is what v5 buys.)
  itemsize = jnp.dtype(x2d_staged.dtype).itemsize
  while bm > 256 and _v5_vmem_bytes(bm, halo, t_dim, cin, cout,
                                    itemsize) > _V5_VMEM_BUDGET:
    bm //= 2
  base_off = t_off - halo
  panel_rows = bm + 2 * halo
  tap_offs = tuple(
      ((t // kw - ph) * wp + (t % kw - pw)) * n_batch + halo
      for t in range(t_dim))
  kernel = functools.partial(
      _conv_kernel_v5, bk=bk, bn=bn, bm=bm, nk=nk, nn=nn,
      tap_offs=tap_offs, base_off=base_off, panel_rows=panel_rows)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(m_pad // bm,),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
              # All tap weights VMEM-resident: (T*nk, bk, cout), constant
              # across the grid so Pallas fetches them once.
              pl.BlockSpec((t_dim * nk, bk, cout),
                           lambda i, s, k: (0, 0, 0)),
          ],
          out_specs=pl.BlockSpec((bm, cout), lambda i, s, k: (i, 0)),
          scratch_shapes=[
              pltpu.VMEM((bm, cout), jnp.float32),
              pltpu.VMEM((2, panel_rows, cin), x2d_staged.dtype),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((m_pad, cout), x2d_staged.dtype),
      interpret=interpret,
  )(starts, ks, x2d_staged, w9.reshape(t_dim * nk, bk, cout))


def default_tap_engine() -> str:
  """'flat' (grid over (row tile, active entry)) or 'v5' (grid over row
  tiles, VMEM-resident haloed panel, static tap/column sweep).
  Env RIGL_TAP_ENGINE."""
  import os
  return os.environ.get('RIGL_TAP_ENGINE', 'flat')


def _dw_kernel(cols_ref, rows_ref, deltas_ref, x_hbm, g_hbm, o_ref,
               acc_ref, x_buf, g_buf, sem_x, sem_g, *, bk, bn, bm, g_off):
  """One dw block per entry: acc[s] = sum_ms x[ms+shift_s, ki_s]^T @ g[ms, j_s].

  Grid (n_entries, M/bm), ms fastest: the output tile for entry s stays
  resident across the ms sweep and flushes once.  Both operands are the
  SAME staged batch-minor padded-grid buffers the forward uses (x with the
  tap shift baked into deltas, g at the static grid origin g_off), so pad /
  halo / tail rows contribute zero terms.  Dummy/sentinel entries
  (valid = 0) skip all DMA and MXU work and flush a zero tile; their output
  slots are dropped by the host-side scatter (tap index -1 out of bounds).
  """
  s = pl.program_id(0)
  ms = pl.program_id(1)
  nms = pl.num_programs(1)
  valid = (deltas_ref[s] // _OFF_BITS) % 2 != 0

  def copies(m_idx, slot):
    xs = pl.multiple_of(m_idx * bm + deltas_ref[s] % _OFF_BITS, _ALIGN)
    gs = pl.multiple_of(m_idx * bm + g_off, _ALIGN)
    cx = pltpu.make_async_copy(
        x_hbm.at[pl.ds(xs, bm), pl.ds(rows_ref[s] * bk, bk)],
        x_buf.at[slot], sem_x.at[slot])
    cg = pltpu.make_async_copy(
        g_hbm.at[pl.ds(gs, bm), pl.ds(cols_ref[s] * bn, bn)],
        g_buf.at[slot], sem_g.at[slot])
    return cx, cg

  @pl.when(ms == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(valid & (ms == 0))
  def _():
    cx, cg = copies(0, 0)
    cx.start()
    cg.start()

  slot = jax.lax.rem(ms, 2)

  @pl.when(valid & (ms + 1 < nms))
  def _():
    cx, cg = copies(ms + 1, 1 - slot)
    cx.start()
    cg.start()

  @pl.when(valid)
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
    o_ref[0, :, :] = acc_ref[:].astype(o_ref.dtype)


def _dw_gather(x, gy, w_shape, packing, block, bm, interpret):
  """dw = conv-backward-filter(x, gy) restricted to active tap blocks.

  HBM traffic and MXU work scale with tap-block density — the dense
  formulation (XLA conv-backward-filter times the expanded mask) computes
  every block, and at ResNet's small late-stage spatial sizes XLA's
  backward-filter runs far below peak (PERF.md session 3: the matching
  forward conv measured 12.6 TFLOP/s at 7x7/512ch, which the tap kernel
  beat 2.6x).  Returns (kh, kw, cin, cout) f32.
  """
  n, h, w_dim, cin = x.shape
  kh, kw, _, cout = w_shape
  bk, bn = block
  cols, rows, taps = packing['cols'], packing['rows'], packing['taps']
  n_entries = cols.shape[0] - 1
  valid = (taps >= 0).astype(jnp.int32)
  tap_safe = jnp.maximum(taps, 0)

  if kh == 1 and kw == 1:
    # No shifts: plain row-major flattening, no batch-minor transpose and
    # no alignment requirement on the batch (reads start at ms * bm).
    m = n * h * w_dim
    m_pad = -(-m // bm) * bm
    t_off = 0

    def stage(a):
      a2 = a.reshape(m, a.shape[-1])
      if m_pad != m:
        a2 = jnp.pad(a2, [(0, m_pad - m), (0, 0)])
      return a2
    offset = jnp.zeros_like(taps)
  else:
    ph, pw = kh // 2, kw // 2
    hp, wp = h + 2 * ph, w_dim + 2 * pw
    m = n * hp * wp
    m_pad = -(-m // bm) * bm
    halo = (ph * wp + pw) * n
    top_img = ph + 1
    tail_img = -(-(halo + m_pad - m) // (wp * n))
    t_off = top_img * wp * n
    if t_off + halo >= 2 ** 20:
      raise ValueError(f'row offset {t_off + halo} overflows delta packing')

    def stage(a):
      c = a.shape[-1]
      at = jnp.transpose(a, (1, 2, 0, 3))
      buf = jnp.zeros((top_img + hp + tail_img, wp, n, c), a.dtype)
      buf = buf.at[top_img + ph:top_img + ph + h, pw:pw + w_dim].set(at)
      return buf.reshape(-1, c)
    offset = t_off + valid * (
        (tap_safe // kw - ph) * wp + (tap_safe % kw - pw)) * n

  x2d = stage(x)
  g2d = stage(gy)
  deltas = (tap_safe * _TAP_BITS + valid * _OFF_BITS
            + offset).astype(jnp.int32)

  kernel = functools.partial(_dw_kernel, bk=bk, bn=bn, bm=bm, g_off=t_off)
  blocks = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(n_entries, m_pad // bm),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY),
          ],
          out_specs=pl.BlockSpec((1, bk, bn),
                                 lambda s, ms, c, r, d: (s, 0, 0)),
          scratch_shapes=[
              pltpu.VMEM((bk, bn), jnp.float32),
              pltpu.VMEM((2, bm, bk), x2d.dtype),
              pltpu.VMEM((2, bm, bn), g2d.dtype),
              pltpu.SemaphoreType.DMA((2,)),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((n_entries, bk, bn), jnp.float32),
      interpret=interpret,
  )(cols, rows, deltas, x2d, g2d)

  # Scatter compact blocks into the (T, K/bk, N/bn, bk, bn) grid.  Dummy
  # and sentinel entries carry tap = -1, which JAX *wraps* (even under
  # mode='drop'), so — as in _occupancy3 — the grid gets one extra tap row
  # for the wrapped -1 to land in, sliced off below.  Relying on mode='drop'
  # alone would overwrite real blocks at the last tap row nondeterministically.
  grid5 = jnp.zeros((kh * kw + 1, cin // bk, cout // bn, bk, bn), jnp.float32)
  grid5 = grid5.at[taps[:n_entries], rows[:n_entries],
                   cols[:n_entries]].set(blocks, mode='drop')
  grid5 = grid5[:kh * kw]
  dw = grid5.transpose(0, 1, 3, 2, 4).reshape(kh * kw, cin, cout)
  return dw.reshape(kh, kw, cin, cout)


def default_tap_dw() -> str:
  """dw strategy for the tap backward: 'gather' (block-sparse kernel) or
  'dense' (XLA conv-backward-filter times mask).  Env RIGL_TAP_DW."""
  import os
  return os.environ.get('RIGL_TAP_DW', 'gather')


def default_tap_bm() -> int:
  """Row-tile for the tap kernel.  Much larger than the matmul kernels'
  bm: each grid step's dot is only (bm, bk=128, bn=128), so per-step fixed
  costs dominate unless bm amortizes them; tiles are (bm, 128) regardless
  of layer width, so VMEM stays small.  Env RIGL_TAP_BM overrides."""
  import os
  return int(os.environ.get('RIGL_TAP_BM', '2048'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def block_sparse_conv_tap(x, w4d, packing,
                          block: Tuple[int, int] = (128, 128),
                          bm: Optional[int] = None,
                          interpret: Optional[bool] = None):
  """Stride-1 SAME NHWC conv through the tap-block-skipping kernel.

  Args:
    x: (N, H, W, Cin).
    w4d: (kh, kw, Cin, Cout), odd kh/kw.
    packing: {'cols','rows','taps'} from pack_tap_active — active
      (tap, cin-block, cout-block) triples, column-major, one sentinel.
    bm: row tile; None = default_tap_bm().
  """
  if bm is None:
    bm = default_tap_bm()
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  return _conv_impl(x, w4d, packing, block, bm, interpret)


def _tap_fwd(x, w4d, packing, block, bm, interpret):
  if bm is None:
    bm = default_tap_bm()
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  return _conv_impl(x, w4d, packing, block, bm, interpret), (x, w4d, packing)


def _tap_bwd(block, bm, interpret, residuals, gy):
  from rigl_tpu.ops.block_mask import expand_from_tap_blocks
  if bm is None:
    bm = default_tap_bm()
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  x, w4d, packing = residuals
  kh, kw, cin, cout = w4d.shape
  bk, bn = block
  t_dim = kh * kw
  occ3 = _occupancy3(packing['cols'], packing['rows'], packing['taps'],
                     t_dim, cin // bk, cout // bn)
  # Packing length = true actives + one dummy per cout column + sentinel.
  n_active = packing['cols'].shape[0] - 1 - (cout // bn)

  # dx: flipped taps (t' = T-1-t), per-tap transposed blocks and weights.
  occ3_t = occ3[::-1].transpose(0, 2, 1)
  cols_t, rows_t, taps_t = pack_tap_active(occ3_t, n_active)
  w_t = jnp.flip(w4d, (0, 1)).transpose(0, 1, 3, 2)
  dx = _conv_impl(gy, w_t, {'cols': cols_t, 'rows': rows_t, 'taps': taps_t},
                  (bn, bk), bm, interpret)

  if default_tap_dw() == 'gather' and (
      interpret or (kh, kw) == (1, 1) or x.shape[0] % _ALIGN == 0):
    # Block-sparse dw: compute only the active tap blocks (the dense
    # backward-filter pays full FLOPs for a mostly-masked result).
    dw = _dw_gather(x, gy, w4d.shape, packing, block, bm,
                    interpret).astype(w4d.dtype)
  else:
    # dw: XLA's native conv-backward-filter (batch<->feature swapped dims)
    # on the 4D tensors, masked to active blocks.
    ph, pw = kh // 2, kw // 2
    x_pad = jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)])
    dw4 = jax.lax.conv_general_dilated(
        x_pad, gy, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('CHWN', 'IHWO', 'NHWC'),
        preferred_element_type=jnp.float32)          # (Cin, kh, kw, Cout)
    dw = jnp.transpose(dw4, (1, 2, 0, 3))
    mask = expand_from_tap_blocks(occ3.astype(jnp.float32),
                                  (kh, kw, cin, cout), block)
    dw = (dw * mask).astype(w4d.dtype)
  return dx, dw, None


block_sparse_conv_tap.defvjp(_tap_fwd, _tap_bwd)

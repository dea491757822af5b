"""Tensor-parallel PACKED block-sparse matmuls: column-group sharding.

The packed representation (ops/pallas/block_sparse_packed.py) stores a
weight matrix as its active blocks `(n_active, bk, bn)`.  This module
shards that storage over the mesh's 'model' axis by OUTPUT-COLUMN GROUPS:
the nn block-columns are split into `n_model` contiguous groups, and each
device holds only its group's active blocks plus a local packing over its
(nk, nn_local) occupancy sub-grid.  Consequences, per shard:

  * fwd needs NO collective — a column group's outputs depend only on its
    own blocks (x is replicated over 'model', usually sharded over 'data');
  * dx is a partial sum over the shard's columns → one psum over 'model';
  * dw is local (each shard owns its blocks' gradients and optimizer
    slots) — optimizer state is sharded for free.

Static shapes under SPMD require every shard to hold the SAME number of
active blocks.  Two pieces make that an invariant rather than a hope:

  * `balanced_block_mask` draws the initial occupancy with EXACTLY
    n_active / n_model active blocks per column group;
  * `tp_drop_grow` runs the bit-exact drop/grow kernel
    (sparsity/update.py, transcribing the reference
    sparse_optimizers_base.py:276-343) INDEPENDENTLY PER GROUP, so each
    group's count is preserved by the kernel's floor arithmetic.  With
    n_model=1 this is exactly `packed_drop_grow` (tested); with n_model>1
    the drop/grow competition is per column group — the TP-balanced
    variant of RigL's per-layer competition (the reference already
    partitions the competition by layer; this partitions one step
    further, along the axis the hardware shards).

The reference's only parallelism is data-parallel `CrossShardOptimizer`
(imagenet_train_eval.py:363-365); tensor parallelism of sparse storage has
no counterpart there — it exists here because packed storage makes the
weight shard a real memory/compute win, not a notional one.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.pallas.block_sparse_packed import (Packing, make_packing,
                                                     pack_dense,
                                                     packed_matmul,
                                                     unpack_dense)
from rigl_tpu.transforms import packed_training as pt


# --------------------------------------------------- collectives helper ----
@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicate_for_tp(x, axis_name: str):
  """Identity forward / psum-cotangent backward over `axis_name`.

  The entry operator of a column-parallel block under shard_map: x is
  replicated over the model axis, each shard's matmul backward yields only
  its own columns' dx contribution, and the FULL dx is their sum — this
  op's transpose inserts exactly that psum (the standard conjugate of the
  tiled all_gather on the output side).  Needed because the sharded train
  steps run with check_vma=False (pallas calls don't carry replication
  types), so jax cannot insert the psum itself."""
  return x


def _replicate_fwd(x, axis_name):
  return x, None


def _replicate_bwd(axis_name, _, g):
  return (jax.lax.psum(g, axis_name),)


replicate_for_tp.defvjp(_replicate_fwd, _replicate_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gather_columns_for_tp(y, axis_name: str, axis: int = 1):
  """Tiled all_gather over `axis_name` whose backward SLICES the
  cotangent instead of psum-scattering it.

  The exit operator of a column-parallel block: every model shard then
  runs the identical replicated downstream compute, so the cotangent dy
  arriving here is REPLICATED over `axis_name`.  The generic transpose of
  a tiled all_gather (psum_scatter) assumes device-varying cotangents
  that sum to the true one and would overcount by the axis size; the
  correct pullback under replication is each shard taking its own slice
  exactly once.  Only valid when everything downstream of the gather is
  replicated over `axis_name` (true for the packed TP models: only
  packed kernels shard over 'model')."""
  return jax.lax.all_gather(y, axis_name, axis=axis, tiled=True)


def _gather_cols_fwd(y, axis_name, axis):
  return gather_columns_for_tp(y, axis_name, axis), y.shape[axis]


def _gather_cols_bwd(axis_name, axis, local_n, g):
  start = jax.lax.axis_index(axis_name) * local_n
  return (jax.lax.dynamic_slice_in_dim(g, start, local_n, axis=axis),)


gather_columns_for_tp.defvjp(_gather_cols_fwd, _gather_cols_bwd)


def mesh_spec_trees(tx, params, packings, opt_state, n_model: int):
  """(params, packings, opt_state) PartitionSpec trees for a
  (data, model) mesh: TP-stacked packed kernels (and their packing arrays
  / optimizer slots) shard their leading group axis over 'model';
  everything else is replicated.  Shared by the packed LM and classifier
  trainers' shard_map steps."""
  import flax.traverse_util as traverse
  import optax
  from jax.sharding import PartitionSpec as P

  flat_p = traverse.flatten_dict(params)
  flat_pk = traverse.flatten_dict(packings)
  spec_p = traverse.unflatten_dict({
      p: (P('model') if (n_model > 1 and p in flat_pk) else P())
      for p in flat_p})
  spec_pk = jax.tree.map(lambda _: P('model') if n_model > 1 else P(),
                         packings)
  spec_os = optax.tree_map_params(
      tx, lambda _, s: s, opt_state, spec_p,
      transform_non_params=lambda _: P())
  return spec_p, spec_pk, spec_os


# ----------------------------------------------------------- occupancy ----
def balanced_block_mask(rs: np.random.RandomState, nk: int, nn: int,
                        n_active: int, n_model: int) -> np.ndarray:
  """(nk, nn) int32 occupancy with exactly n_active/n_model active blocks
  in each of the n_model contiguous column groups."""
  if nn % n_model or n_active % n_model:
    raise ValueError(f'nn={nn} and n_active={n_active} must divide '
                     f'n_model={n_model}')
  nn_local, cap = nn // n_model, n_active // n_model
  if cap > nk * nn_local:
    raise ValueError(f'cap={cap} exceeds group capacity {nk * nn_local}')
  occ = np.zeros((nk, nn), np.int32)
  for g in range(n_model):
    flat = np.zeros(nk * nn_local, np.int32)
    flat[rs.choice(nk * nn_local, size=cap, replace=False)] = 1
    occ[:, g * nn_local:(g + 1) * nn_local] = flat.reshape(nk, nn_local)
  return occ


# ------------------------------------------------------------- packing ----
def make_tp_packing(occ, n_model: int) -> Packing:
  """Per-group packings stacked on a leading axis (n_model, n_entries):
  a Packing whose fwd/bwd arrays carry one row per column group, ready to
  shard with PartitionSpec('model') and unstacked inside shard_map via
  `local_packing`.  `shape` is the LOCAL grid (nk, nn_local)."""
  occ = np.asarray(occ)
  nk, nn = occ.shape
  if nn % n_model:
    raise ValueError(f'nn={nn} must divide n_model={n_model}')
  nn_local = nn // n_model
  groups = [occ[:, g * nn_local:(g + 1) * nn_local] for g in range(n_model)]
  counts = [int(g.sum()) for g in groups]
  if len(set(counts)) != 1:
    raise ValueError(f'unbalanced occupancy across column groups: {counts} '
                     '(use balanced_block_mask / tp_drop_grow)')
  pks = [make_packing(jnp.asarray(g), counts[0]) for g in groups]
  fwd = tuple(jnp.stack([pk.fwd[i] for pk in pks]) for i in range(4))
  bwd = tuple(jnp.stack([pk.bwd[i] for pk in pks]) for i in range(4))
  return Packing(fwd, bwd, (nk, nn_local))


def stack_packings(pks: List[Packing]) -> Packing:
  """List of per-group local packings (identical entry counts and grid
  shapes) -> stacked TP Packing (leading axis n_model on every array).
  jit-traceable (used by PackedDense's tp_shards>1 init and checkpoint
  restore; make_tp_packing is the numpy/validating front door)."""
  fwd = tuple(jnp.stack([pk.fwd[i] for pk in pks]) for i in range(4))
  bwd = tuple(jnp.stack([pk.bwd[i] for pk in pks]) for i in range(4))
  return Packing(fwd, bwd, pks[0].shape)


def stacked_packing_from_occ(occ, n_model: int, cap: int) -> Packing:
  """Global (nk, nn) occupancy (exactly `cap` active blocks per contiguous
  column group) -> stacked TP Packing.  jit-traceable."""
  occ = jnp.asarray(occ)
  nn_local = occ.shape[1] // n_model
  return stack_packings([
      make_packing(occ[:, g * nn_local:(g + 1) * nn_local], cap)
      for g in range(n_model)])


def is_stacked(pk: Packing) -> bool:
  """True for stacked TP packings (leading model-group axis on arrays)."""
  return getattr(pk.fwd[0], 'ndim', 1) == 2


def local_packing(tp_pk: Packing, g=None) -> Packing:
  """Row `g` (default: the shard-local row 0 inside shard_map) of a
  stacked TP packing, as an ordinary Packing."""
  idx = 0 if g is None else g
  return Packing(tuple(a[idx] for a in tp_pk.fwd),
                 tuple(a[idx] for a in tp_pk.bwd), tp_pk.shape)


def n_groups(tp_pk: Packing) -> int:
  return int(tp_pk.fwd[0].shape[0])


def tp_occupancy_grid(tp_pk: Packing) -> jnp.ndarray:
  """Global (nk, nn) occupancy reconstructed from a stacked TP packing."""
  return jnp.concatenate([
      pt.occupancy_grid(local_packing(tp_pk, g))
      for g in range(n_groups(tp_pk))], axis=1)


def cap_of(tp_pk: Packing) -> int:
  """Static per-group active-block count."""
  return int(tp_pk.fwd[0].shape[1]) - tp_pk.shape[1]


def pack_dense_tp(w, tp_pk: Packing, block: Tuple[int, int]):
  """Dense (K, N) -> stacked packed (n_model, cap, bk, bn)."""
  nm = n_groups(tp_pk)
  nn_local = tp_pk.shape[1]
  cols = nn_local * block[1]
  return jnp.stack([
      pack_dense(w[:, g * cols:(g + 1) * cols], local_packing(tp_pk, g),
                 block) for g in range(nm)])


def unpack_dense_tp(packed, tp_pk: Packing, block: Tuple[int, int],
                    dtype=None):
  """Stacked packed (n_model, cap, bk, bn) -> dense (K, N)."""
  nm = n_groups(tp_pk)
  return jnp.concatenate([
      unpack_dense(packed[g], local_packing(tp_pk, g), block, dtype)
      for g in range(nm)], axis=1)


# -------------------------------------------------------------- matmul ----
def tp_packed_matmul(x, w_local, tp_pk_local, block: Tuple[int, int],
                     bm: int = 512, interpret=None):
  """Shard-local y = x @ W_group inside shard_map: w_local and tp_pk_local
  are the shard's slices (leading axis 1) of the stacked packed weights
  and TP packing; returns the shard's (m, nn_local*bn) output columns.
  No collective — concatenating over 'model' IS the full product.  The
  caller psums dx over 'model' (see tests/test_packed_tp.py for the
  train-step pattern)."""
  return packed_matmul(x, w_local[0], local_packing(tp_pk_local), block, bm,
                       interpret)


# ----------------------------------------------------------- drop/grow ----
class TPUpdateResult(NamedTuple):
  packed: jnp.ndarray          # (n_model, cap, bk, bn), grown slots zeroed
  packing: Packing             # new stacked TP packing
  grown: jnp.ndarray           # (n_model, cap) bool — slots that are NEW
  perm: jnp.ndarray            # (n_model, cap) within-group repack gather
  occupancy: jnp.ndarray       # new global (nk, nn) grid


def tp_drop_grow(packed, tp_pk: Packing, grow_grid,
                 drop_fraction) -> TPUpdateResult:
  """One RigL drop/grow on TP-sharded packed storage, per column group.

  Args:
    packed: stacked (n_model, cap, bk, bn) packed weights (global view —
      run this OUTSIDE shard_map; update steps are off the hot path).
    tp_pk: stacked TP packing.
    grow_grid: (nk, nn) block-pooled |dense grad| scores (global grid).
    drop_fraction: traced scalar.
  """
  from rigl_tpu.ops.pallas.block_sparse_packed import repack_permutation

  nm = n_groups(tp_pk)
  nk, nn_local = tp_pk.shape
  cap = cap_of(tp_pk)
  new_packed, grown_rows, occ_cols, perm_rows = [], [], [], []
  fwd_rows, bwd_rows = [], []
  for g in range(nm):
    lpk = local_packing(tp_pk, g)
    grid_g = grow_grid[:, g * nn_local:(g + 1) * nn_local]
    out = pt.packed_drop_grow(packed[g], lpk, grid_g, drop_fraction, cap)
    new_packed.append(out.packed)
    grown_rows.append(out.grown)
    occ_cols.append(out.occupancy)
    perm_rows.append(repack_permutation(lpk, out.packing))
    fwd_rows.append(out.packing.fwd)
    bwd_rows.append(out.packing.bwd)
  new_pk = Packing(
      tuple(jnp.stack([r[i] for r in fwd_rows]) for i in range(4)),
      tuple(jnp.stack([r[i] for r in bwd_rows]) for i in range(4)),
      (nk, nn_local))
  return TPUpdateResult(jnp.stack(new_packed), new_pk,
                        jnp.stack(grown_rows), jnp.stack(perm_rows),
                        jnp.concatenate(occ_cols, axis=1))


def tp_fix_opt_state(tx, opt_state, perm_tree, grown_tree):
  """Carry optimizer slots of TP-stacked packed weights through a repack:
  per-group gather of surviving blocks' slots, zeros at grown ones — the
  same momentum-follow/reset contract as packed_rigl_update
  (sparse_optimizers_base.py:336-343 semantics), applied along axis 1 of
  every (n_model, cap, ...) leaf via optax.tree_map_params.

  perm_tree / grown_tree mirror the params structure tx was init'd with
  ((n_model, cap) arrays at packed leaves; 0-size sentinels at dense
  leaves pass slots through untouched, as packed_rigl_update does)."""
  import optax

  def fix(leaf, perm, grown):
    if (getattr(grown, 'ndim', 0) == 2 and grown.shape[0] > 0
        and hasattr(leaf, 'shape') and getattr(leaf, 'ndim', 0) >= 2
        and leaf.shape[:2] == grown.shape):
      nm, cap = grown.shape
      src = jnp.take_along_axis(
          leaf, jnp.maximum(perm, 0).reshape(
              (nm, cap) + (1,) * (leaf.ndim - 2)), axis=1)
      pad = (1,) * (leaf.ndim - 2)
      return jnp.where(grown.reshape((nm, cap) + pad),
                       jnp.zeros_like(src), src)
    return leaf

  return optax.tree_map_params(tx, fix, opt_state, perm_tree, grown_tree)

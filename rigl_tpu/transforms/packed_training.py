"""Drop/grow sparse training ON packed block storage.

The packed representation (ops/pallas/block_sparse_packed.py) stores only
active blocks; this module gives it the same RigL/SET update semantics the
mask-dict path has, by running the bit-exact drop/grow kernel
(sparsity/update.py:drop_grow_update — the transcription of the reference
sparse_optimizers_base.py:276-343) on the block-pooled occupancy grid:

  * drop score  = sum |w| over each block — identical to the block-mask
    path (ops/block_mask.py:blockwise_drop_grow pools by sum, and inactive
    weights are exactly zero in packed storage);
  * grow score  = block-pooled |dense grads|, computed by the caller at
    update steps only (same lazy-dense-grads contract as SparseTraining's
    RigL branch);
  * repack      = permutation gather on the packed axis; grown slots start
    at zeros (RigL's grow_init default) and their optimizer slots reset.

Everything is jit-traceable with static shapes: the drop/grow kernel
preserves the active count (floor arithmetic), so n_active — and with it
every packed array shape and the packing entry count — is a compile-time
constant across the whole training run.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rigl_tpu.ops.pallas.block_sparse_packed import (Packing, make_packing,
                                                     repack_permutation)
from rigl_tpu.sparsity import update as update_lib


def occupancy_grid(packing: Packing) -> jnp.ndarray:
  """(nk, nn) int32 occupancy reconstructed from the fwd entry list."""
  nk, nn = packing['shape']
  cols, rows, slots, valid = packing['fwd']
  return jnp.zeros((nk, nn), jnp.int32).at[rows, cols].max(valid)


def block_drop_scores(packed: jnp.ndarray, packing: Packing) -> jnp.ndarray:
  """sum |w| per block scattered onto the occupancy grid (zeros at
  inactive blocks, so they never win the keep competition)."""
  nk, nn = packing['shape']
  cols, rows, slots, valid = packing['fwd']
  per_slot = jnp.sum(jnp.abs(packed.astype(jnp.float32)), axis=(1, 2))
  vals = jnp.where(valid == 1, per_slot[slots], 0.0)
  return jnp.zeros((nk, nn), jnp.float32).at[rows, cols].add(
      jnp.where(valid == 1, vals, 0.0))


class PackedUpdateResult(NamedTuple):
  packed: jnp.ndarray        # new packed weights (grown slots zeroed)
  packing: Packing           # new static packing
  grown: jnp.ndarray         # (n_active,) bool — slots that are NEW
  occupancy: jnp.ndarray     # new (nk, nn) grid


def packed_drop_grow(packed: jnp.ndarray, packing: Packing,
                     grow_scores_grid: jnp.ndarray,
                     drop_fraction,
                     n_active: int) -> PackedUpdateResult:
  """One drop/grow update on packed storage.

  grow_scores_grid: (nk, nn) block-pooled grow scores (sum |dense grad|
  per block — pool with ops.block_mask.pool_to_blocks(..., 'sum')).
  n_active: the static active-block count (invariant under drop/grow).
  """
  occ = occupancy_grid(packing).astype(jnp.float32)
  bd = block_drop_scores(packed, packing)
  res = update_lib.drop_grow_update(
      occ, jnp.zeros_like(occ), bd,
      jnp.asarray(grow_scores_grid, jnp.float32), drop_fraction,
      grow_tensor=jnp.zeros_like(occ))
  new_packing = make_packing(res.mask.astype(jnp.int32), n_active)
  perm = repack_permutation(packing, new_packing)
  grown = perm < 0
  new_packed = jnp.where(grown[:, None, None],
                         jnp.zeros_like(packed),
                         packed[jnp.maximum(perm, 0)])
  return PackedUpdateResult(new_packed, new_packing, grown,
                            res.mask.astype(jnp.int32))


def unpack_params(params, packings, block: Tuple[int, int]):
  """{name: packed} -> {name: dense (K, N)} (zeros at inactive blocks).

  Used at update steps only: RigL's grow score is |dense grad|
  (sparse_optimizers_base.py:328-334), which needs a dense-view backward.
  Update steps are rare (every ~100 steps), so the O(K*N) materialization
  is off the hot path — the same lazy-dense-grads contract as
  SparseTraining's RigL branch."""
  from rigl_tpu.ops.pallas.block_sparse_packed import unpack_dense
  return {name: unpack_dense(params[name], packings[name], block)
          for name in params}


def rigl_grow_grids(dense_grads, block: Tuple[int, int]):
  """{name: dense grad} -> {name: (nk, nn) pooled |grad| grow scores}."""
  from rigl_tpu.ops.block_mask import pool_to_blocks
  return {name: pool_to_blocks(jnp.abs(g.astype(jnp.float32)), block, 'sum')
          for name, g in dense_grads.items()}


class PackedRigLResult(NamedTuple):
  params: dict                 # {name: packed} after drop/grow
  packings: dict               # {name: Packing}
  opt_state: object            # optimizer state, survivors carried, grown reset
  occupancy: dict              # {name: (nk, nn)} new grids


def packed_rigl_update(params, packings, opt_state, tx, grow_grids,
                       drop_fraction, n_active) -> PackedRigLResult:
  """One RigL mask update across a dict of packed layers, jit-traceable.

  For each layer: drop by packed block |w| sums, grow by the caller's
  pooled dense-grad grids (rigl_grow_grids), repack weights (grown blocks
  zeroed — RigL's grow_init default) and permute/reset the optimizer state
  through optax.tree_map_params so momentum follows surviving blocks and
  resets on grown ones (sparse_optimizers_base.py:336-343 semantics).

  Args:
    params: {name: (n_active, bk, bn)} packed weights.
    packings: {name: Packing}.
    opt_state: optax state created by tx.init(params).
    tx: the optax transformation (for tree_map_params structure).
    grow_grids: {name: (nk, nn)} pooled grow scores.
    drop_fraction: traced scalar.
    n_active: {name: int} static active-block counts.
  """
  import optax

  new_params, new_packings, occ = dict(params), {}, {}
  perm_tree, grown_tree = {}, {}
  empty = jnp.zeros((0,), jnp.int32)
  for name in params:
    if name not in packings:
      # Dense (non-packed) entry, e.g. a classifier head: opt slots pass
      # through untouched (empty sentinel -> fix() is a no-op).
      perm_tree[name] = empty
      grown_tree[name] = empty
      continue
    out = packed_drop_grow(params[name], packings[name], grow_grids[name],
                           drop_fraction, n_active[name])
    new_params[name] = out.packed
    new_packings[name] = out.packing
    occ[name] = out.occupancy
    perm_tree[name] = repack_permutation(packings[name], out.packing)
    grown_tree[name] = out.grown

  def fix(leaf, perm, grown):
    if (grown.shape[0] > 0 and hasattr(leaf, 'shape')
        and getattr(leaf, 'ndim', 0) >= 1
        and leaf.shape[0] == grown.shape[0]):
      src = leaf[jnp.maximum(perm, 0)]
      pad = (1,) * (leaf.ndim - 1)
      return jnp.where(grown.reshape((-1,) + pad), jnp.zeros_like(src), src)
    return leaf

  new_opt = optax.tree_map_params(tx, fix, opt_state, perm_tree, grown_tree)
  return PackedRigLResult(new_params, new_packings, new_opt, occ)


def _pooled_grids(dense_grads, packings, block: Tuple[int, int],
                  absolute: bool):
  """Block-pooled grids of the dense grads per packed kernel ((E, nk, nn)
  stacks for expert-stacked kernels, the global (nk, nn) grid for
  TP-stacked ones).  absolute=True pools |grad| (RigL); False pools the
  SIGNED grads (SNFS's EMA input — sign information survives pooling so
  cross-update oscillation cancels, like the reference's signed EMA)."""
  import flax.traverse_util as tv
  from rigl_tpu.ops.block_mask import pool_to_blocks
  from rigl_tpu.parallel import packed_ep as ep

  def pool(g2d):
    g2d = g2d.astype(jnp.float32)
    return pool_to_blocks(jnp.abs(g2d) if absolute else g2d, block, 'sum')

  flat_pk = dict(tv.flatten_dict(packings))
  grids = {}
  for path, pk in flat_pk.items():
    g = dense_grads[path]
    if ep.is_expert_stacked(pk):
      grids[path] = jnp.stack([pool(g[e]) for e in range(g.shape[0])])
    else:
      grids[path] = pool(g)
  return grids


def flax_rigl_grow_grids(dense_grads, packings, block: Tuple[int, int]):
  """RigL grow grids over nested flax trees: block-pooled |dense grad| —
  the reference's grow score (sparse_optimizers_base.py:328-334) at block
  granularity."""
  return _pooled_grids(dense_grads, packings, block, absolute=True)


def flax_snfs_inst_grids(dense_grads, packings, block: Tuple[int, int]):
  """SNFS EMA input: block-pooled SIGNED dense grads.  The reference EMAs
  the signed elementwise grads and scores grow by |EMA|
  (sparse_optimizers.py:126-214: momentum decay applied to the raw grads
  pre-apply, generic_mask_update ranks abs(grow_tensor)), so
  sign-oscillating gradients rank near zero.  The packed variant keeps
  that ordering property at block granularity: pool SIGNED grads, EMA the
  pooled values (snfs_update_ema_grids), abs at drop/grow time."""
  return _pooled_grids(dense_grads, packings, block, absolute=False)


def grow_grid_shapes(packings):
  """{path: grid shape} for each packed kernel — (nk, nn) plain, the
  global (nk, n_groups*nn_local) for TP-stacked, (E, nk, nn) for
  expert-stacked.  The shapes flax_packed_drop_grow expects its
  grow_grids in (and the SNFS EMA state shapes)."""
  import flax.traverse_util as tv
  from rigl_tpu.parallel import packed_ep as ep
  from rigl_tpu.parallel import packed_tp as tp

  shapes = {}
  for path, pk in tv.flatten_dict(packings).items():
    if ep.is_expert_stacked(pk):
      shapes[path] = (ep.n_experts_of(pk),) + tuple(pk.shape)
    elif tp.is_stacked(pk):
      nk, nn_local = pk.shape
      shapes[path] = (nk, tp.n_groups(pk) * nn_local)
    else:
      shapes[path] = tuple(pk.shape)
  return shapes


def flax_set_grow_grids(packings, key):
  """SET grow grids: per-layer uniform random scores over the block grid
  (reference sparse_optimizers_base.py:260-274 at block granularity),
  drawn with a deterministic per-layer fold of the caller's key — fold
  the step in BEFORE calling (jax.random.fold_in(key, step)), mirroring
  SparseTraining's stateless-RNG discipline so every data-parallel
  replica draws identical scores."""
  shapes = grow_grid_shapes(packings)
  return {path: jax.random.uniform(jax.random.fold_in(key, i),
                                   shapes[path], jnp.float32)
          for i, path in enumerate(sorted(shapes))}


def init_snfs_ema_grids(packings):
  """Zero-initialized SNFS gradient-EMA state, one grid per packed
  kernel (shape per grow_grid_shapes)."""
  return {path: jnp.zeros(s, jnp.float32)
          for path, s in grow_grid_shapes(packings).items()}


def snfs_update_ema_grids(ema_grids, inst_grids, momentum: float):
  """SNFS EMA advance: ema <- momentum * ema + (1 - momentum) * inst.

  inst_grids are the SIGNED pooled grads (flax_snfs_inst_grids), so the
  EMA preserves the reference's |EMA of grad| ranking: sign-oscillating
  gradients cancel across updates and rank low (sparse_optimizers.py:
  126-214 — abs applied AFTER the EMA, at scoring time).  Two documented
  deviations from the reference, both forced by O(density) packed
  storage: (1) the EMA lives at block-grid granularity (per-element
  dense EMA state would be O(dense)); (2) it advances at mask-update
  steps only (per-step advance would need a dense backward on the hot
  path).  See PARITY.md."""
  return {p: momentum * ema_grids[p] + (1.0 - momentum) * inst_grids[p]
          for p in ema_grids}


def flax_packed_rigl_update(params, packings, opt_state, tx, dense_grads,
                            drop_fraction, block: Tuple[int, int]):
  """packed drop/grow over NESTED flax trees with RigL scores (grow =
  block-pooled |dense grad|).  See flax_packed_drop_grow for the
  score-agnostic machinery; SET/SNFS callers build their grow_grids with
  flax_set_grow_grids / snfs_update_ema_grids instead.

  Args:
    params: the model's 'params' tree (packed kernels + any dense leaves).
    packings: the model's 'packing' collection tree (mirrors params at the
      packed kernels; Packing instances are leaves).
    opt_state: optax state created by tx.init(params).
    tx: the optax transformation.
    dense_grads: {flattened-path tuple: dense (K, N) grad} for each packed
      kernel — computed by the caller via a dense-view forward at update
      steps only (e.g. the model's dense twin with unpack_dense'd kernels,
      see tests/test_packed_transformer.py).
    drop_fraction: traced scalar.
    block: the packed block size.

  Returns:
    PackedRigLResult with nested params/packings trees.
  """
  return flax_packed_drop_grow(
      params, packings, opt_state, tx,
      flax_rigl_grow_grids(dense_grads, packings, block), drop_fraction)


def flax_packed_drop_grow(params, packings, opt_state, tx, grow_grids,
                          drop_fraction):
  """Score-agnostic drop/grow over nested flax trees — the seam every
  packed algorithm shares (RigL / SET / SNFS differ only in grow_grids).

  grow_grids: {flattened-path tuple: grid} per packed kernel, shapes per
  grow_grid_shapes.  Drop scores are always the packed block |w| sums
  (the algorithms share the reference's drop rule)."""
  import flax.traverse_util as tv
  import optax
  from rigl_tpu.parallel import packed_ep as ep
  from rigl_tpu.parallel import packed_tp as tp

  flat_p = dict(tv.flatten_dict(params))
  flat_pk = dict(tv.flatten_dict(packings))
  perm_flat, grown_flat, occ = {}, {}, {}
  empty = jnp.zeros((0,), jnp.int32)
  for path in flat_p:
    if path not in flat_pk:
      perm_flat[path] = empty
      grown_flat[path] = empty
      continue
    pk = flat_pk[path]
    if ep.is_expert_stacked(pk):
      # Expert-stacked kernel (MoE): drop/grow runs independently per
      # expert (static per-expert counts are the shard shapes; perm/grown
      # carry the expert axis — the same 2-D opt-slot fix as TP stacking
      # applies).
      out_ep = ep.expert_drop_grow(flat_p[path], pk, grow_grids[path],
                                   drop_fraction)
      perm_flat[path] = out_ep.perm
      grown_flat[path] = out_ep.grown
      flat_p[path] = out_ep.packed
      flat_pk[path] = out_ep.packing
      occ[path] = out_ep.occupancy
      continue
    grid = grow_grids[path]
    if tp.is_stacked(pk):
      # TP-stacked kernel: drop/grow per column group (static per-group
      # counts are the shard shapes; perm/grown carry the group axis).
      out_tp = tp.tp_drop_grow(flat_p[path], pk, grid, drop_fraction)
      perm_flat[path] = out_tp.perm
      grown_flat[path] = out_tp.grown
      flat_p[path] = out_tp.packed
      flat_pk[path] = out_tp.packing
      occ[path] = out_tp.occupancy
      continue
    n_act = int(flat_p[path].shape[0])
    out = packed_drop_grow(flat_p[path], pk, grid, drop_fraction, n_act)
    perm_flat[path] = repack_permutation(pk, out.packing)
    grown_flat[path] = out.grown
    flat_p[path] = out.packed
    flat_pk[path] = out.packing
    occ[path] = out.occupancy

  def fix(leaf, perm, grown):
    if not (hasattr(leaf, 'shape') and getattr(grown, 'ndim', 0) >= 1
            and grown.shape[0] > 0):
      return leaf
    if (grown.ndim == 2 and getattr(leaf, 'ndim', 0) >= 2
        and leaf.shape[:2] == grown.shape):
      # TP-stacked slots: within-group gather along the packed axis 1.
      nm, cap = grown.shape
      src = jnp.take_along_axis(
          leaf, jnp.maximum(perm, 0).reshape(
              (nm, cap) + (1,) * (leaf.ndim - 2)), axis=1)
      pad = (1,) * (leaf.ndim - 2)
      return jnp.where(grown.reshape((nm, cap) + pad),
                       jnp.zeros_like(src), src)
    if (grown.ndim == 1 and getattr(leaf, 'ndim', 0) >= 1
        and leaf.shape[0] == grown.shape[0]):
      src = leaf[jnp.maximum(perm, 0)]
      pad = (1,) * (leaf.ndim - 1)
      return jnp.where(grown.reshape((-1,) + pad), jnp.zeros_like(src), src)
    return leaf

  new_opt = optax.tree_map_params(
      tx, fix, opt_state, tv.unflatten_dict(perm_flat),
      tv.unflatten_dict(grown_flat))
  return PackedRigLResult(tv.unflatten_dict(flat_p),
                          tv.unflatten_dict(flat_pk), new_opt, occ)


def permute_opt_state(tree, packing_old: Packing, packing_new: Packing,
                      grown: jnp.ndarray):
  """Carry optimizer slots through a repack: gather surviving blocks'
  slots into their new positions, zero the grown ones (the momentum-reset
  the mask-dict path does via tree_map_params on drop).  Applies to every
  leaf whose leading axis is the packed axis; scalars/counters pass
  through."""
  perm = repack_permutation(packing_old, packing_new)

  def fix(leaf):
    if hasattr(leaf, 'shape') and getattr(leaf, 'ndim', 0) >= 1 \
        and leaf.shape[0] == grown.shape[0]:
      src = leaf[jnp.maximum(perm, 0)]
      pad = (1,) * (leaf.ndim - 1)
      return jnp.where(grown.reshape((-1,) + pad), jnp.zeros_like(src), src)
    return leaf

  return jax.tree.map(fix, tree)

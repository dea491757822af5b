"""Expert parallelism for PACKED block-sparse Mixture-of-Experts layers.

An MoE FFN stores E experts' packed kernels stacked on a leading expert
axis `(E, cap, bk, bn)` — the same stacked-group layout as tensor
parallelism (parallel/packed_tp.py), except each group is a FULL (nk, nn)
weight grid instead of a column slice.  `ExpertPacking` (a registered
pytree subclass of Packing) marks the stacking so downstream code — the
RigL update, the dense-twin unpack, checkpointing — can tell the two
apart structurally rather than by naming conventions.

Sharding (GShard / Switch-Transformer layout, re-derived for shard_map):
tokens shard over EVERY mesh axis (the batch rides P(('data','expert'))),
expert kernels shard their leading axis over 'expert'.  Each device
top-1-routes its local tokens to ALL E experts into a capacity-C dispatch
tensor, one `all_to_all` over 'expert' exchanges token slabs so each
device holds the full token set destined for ITS experts, and the reverse
all_to_all + combine-weighted sum scatters results back.  Expert dw is
therefore already complete over the 'expert' axis (pmean over 'data'
only); every other gradient pmean's over both axes.

RigL semantics per expert: drop by packed block |w| sums, grow by
block-pooled |dense grad| — the bit-exact kernel (sparsity/update.py,
transcribing the reference sparse_optimizers_base.py:276-343) runs
INDEPENDENTLY PER EXPERT, so each expert's static active count (= its
shard shape) is an invariant, exactly as tp_drop_grow partitions the
competition per column group.  The reference has no MoE family; this
extends its architecture-agnostic drop/grow semantics to the model class
whose expert matmuls are the canonical expert-parallel TPU workload.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.pallas.block_sparse_packed import (Packing, make_packing,
                                                     pack_dense,
                                                     repack_permutation,
                                                     unpack_dense)
from rigl_tpu.transforms import packed_training as pt


# ------------------------------------------------------------- packing ----
@jax.tree_util.register_pytree_node_class
class ExpertPacking(Packing):
  """A Packing whose fwd/bwd arrays carry a leading EXPERT axis (E,
  n_entries); `shape` is each expert's full (nk, nn) grid.  Distinct
  class so isinstance() distinguishes expert stacking from TP column
  stacking (both are 2-D entry arrays)."""


def stack_expert_packings(pks: List[Packing]) -> ExpertPacking:
  """Per-expert packings (identical entry counts and grid shapes) ->
  stacked ExpertPacking.  jit-traceable."""
  fwd = tuple(jnp.stack([pk.fwd[i] for pk in pks]) for i in range(4))
  bwd = tuple(jnp.stack([pk.bwd[i] for pk in pks]) for i in range(4))
  return ExpertPacking(fwd, bwd, pks[0].shape)


def is_expert_stacked(pk) -> bool:
  return isinstance(pk, ExpertPacking)


def local_expert_packing(pk: ExpertPacking, e: int) -> Packing:
  """Expert e's row as an ordinary Packing (for packed_matmul)."""
  return Packing(tuple(a[e] for a in pk.fwd),
                 tuple(a[e] for a in pk.bwd), pk.shape)


def n_experts_of(pk: ExpertPacking) -> int:
  return int(pk.fwd[0].shape[0])


def cap_of(pk: ExpertPacking) -> int:
  """Static per-expert active-block count."""
  return int(pk.fwd[0].shape[1]) - pk.shape[1]


def expert_occupancy_grid(pk: ExpertPacking) -> jnp.ndarray:
  """(E, nk, nn) occupancy reconstructed from the stacked packing."""
  return jnp.stack([pt.occupancy_grid(local_expert_packing(pk, e))
                    for e in range(n_experts_of(pk))])


def expert_packing_from_occ(occ, cap: int) -> ExpertPacking:
  """(E, nk, nn) occupancy (exactly `cap` active per expert) -> stacked
  ExpertPacking.  jit-traceable."""
  occ = jnp.asarray(occ)
  return stack_expert_packings(
      [make_packing(occ[e], cap) for e in range(occ.shape[0])])


def pack_dense_experts(w, pk: ExpertPacking, block: Tuple[int, int]):
  """Dense (E, K, N) -> stacked packed (E, cap, bk, bn)."""
  return jnp.stack([pack_dense(w[e], local_expert_packing(pk, e), block)
                    for e in range(n_experts_of(pk))])


def unpack_dense_experts(packed, pk: ExpertPacking, block: Tuple[int, int],
                         dtype=None):
  """Stacked packed (E, cap, bk, bn) -> dense (E, K, N), zeros at
  inactive blocks."""
  return jnp.stack([
      unpack_dense(packed[e], local_expert_packing(pk, e), block, dtype)
      for e in range(n_experts_of(pk))])


# ------------------------------------------------------------- routing ----
def top1_dispatch(logits: jnp.ndarray, capacity: int,
                  token_axes: Tuple[str, ...] = ()):
  """Switch-Transformer top-1 routing with a static per-expert capacity.

  Args:
    logits: (T, E) router logits (any float dtype; softmax in f32).
    capacity: static per-expert token capacity C.
    token_axes: mesh axes the token set is sharded over (inside a
      shard_map).  The aux load-balance statistics (frac, mean_prob) are
      pmean'd over these axes BEFORE the product, so the sharded aux
      equals the global-token-set aux — E*sum(frac*mean_prob) is
      nonlinear in the token distribution, so a per-shard aux averaged
      afterwards would diverge from the single-device value.

  Returns:
    dispatch: (T, E, C) 0/1 f32 — token t occupies slot c of expert e.
      Tokens beyond an expert's capacity are DROPPED (all-zero row), the
      residual connection carries them through unchanged (Switch
      semantics).  Constant w.r.t. params (slot assignment is integer).
    combine: (T, E, C) f32 — dispatch scaled by the router probability of
      the chosen expert, so gradients reach the router through the
      output-weighting path.
    aux: scalar load-balance loss, E * sum_e(frac_routed_e * mean_prob_e)
      (= 1 at perfect balance).  Add `aux_weight * aux` to the loss.
  """
  T, E = logits.shape
  probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
  choice = jnp.argmax(probs, axis=-1)                      # (T,)
  onehot = jax.nn.one_hot(choice, E, dtype=jnp.float32)    # (T, E)
  # Slot index of each token within its expert's queue (first come first
  # served in token order); -1 at non-chosen experts.
  pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0
  slot = jnp.where((pos >= 0) & (pos < capacity), pos, capacity)
  dispatch = jax.nn.one_hot(slot.astype(jnp.int32), capacity,
                            dtype=jnp.float32)             # (T, E, C)
  gate = jnp.sum(probs * onehot, axis=-1)                  # (T,)
  combine = dispatch * gate[:, None, None]
  frac = jnp.mean(onehot, axis=0)
  mean_prob = jnp.mean(probs, axis=0)
  if token_axes:
    frac = jax.lax.pmean(frac, token_axes)
    mean_prob = jax.lax.pmean(mean_prob, token_axes)
  aux = E * jnp.sum(frac * mean_prob)
  return dispatch, combine, aux


def top1_gather_dispatch(logits: jnp.ndarray, capacity: int,
                         token_axes: Tuple[str, ...] = ()):
  """top1_dispatch's routing as INTEGER gather/scatter indices.

  The one-hot (T, E, C) dispatch/combine einsums cost O(T*E*C*d) f32
  MXU work (cf * T^2 * d at Switch capacity) — at bench token counts that
  rivals the expert FFN compute itself and rides in BOTH bench arms.
  Since top-1 routing assigns each token at most ONE (expert, slot), the
  same dispatch is a gather: this returns the slot->token and
  token->slot index maps; _MoEFFN turns them into O(T*d) data movement.
  Routing semantics (argmax choice, first-come-first-served slots,
  capacity drops, gate, pmean'd aux) are IDENTICAL to top1_dispatch —
  equivalence is tested exactly.

  Returns:
    src: (E*C,) int32 — token index filling each expert slot, T (one past
      the last token — callers gather from a zero-padded x) for empty
      slots.
    flat_ec: (T,) int32 — each token's slot in the flattened (E*C,)
      expert-major layout (clipped for dropped tokens — mask with kept).
    kept: (T,) bool — token routed within capacity.
    gate: (T,) f32 — router probability of the chosen expert.
    aux: scalar load-balance loss (same statistic as top1_dispatch).
  """
  T, E = logits.shape
  probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
  choice = jnp.argmax(probs, axis=-1)                      # (T,)
  onehot = jax.nn.one_hot(choice, E, dtype=jnp.float32)    # (T, E)
  pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0
  pos_tok = jnp.max(pos, axis=-1).astype(jnp.int32)        # (T,) >= 0
  kept = pos_tok < capacity
  flat_ec = (choice.astype(jnp.int32) * capacity
             + jnp.minimum(pos_tok, capacity - 1))
  src = jnp.full((E * capacity + 1,), T, jnp.int32).at[
      jnp.where(kept, flat_ec, E * capacity)].set(
          jnp.arange(T, dtype=jnp.int32))[:E * capacity]
  gate = jnp.sum(probs * onehot, axis=-1)                  # (T,)
  frac = jnp.mean(onehot, axis=0)
  mean_prob = jnp.mean(probs, axis=0)
  if token_axes:
    frac = jax.lax.pmean(frac, token_axes)
    mean_prob = jax.lax.pmean(mean_prob, token_axes)
  aux = E * jnp.sum(frac * mean_prob)
  return src, flat_ec, kept, gate, aux


def dispatch_to_experts(xe: jnp.ndarray, ep_axis: str) -> jnp.ndarray:
  """(E, C, d) locally-dispatched slabs -> (E_local, n_ep*C, d): each
  device keeps its experts' slabs from every source shard (token order
  within a slab is source-shard-major, which the reverse all_to_all in
  `return_from_experts` inverts exactly)."""
  return jax.lax.all_to_all(xe, ep_axis, split_axis=0, concat_axis=1,
                            tiled=True)


def return_from_experts(ye: jnp.ndarray, ep_axis: str) -> jnp.ndarray:
  """(E_local, n_ep*C, d) expert outputs -> (E, C, d) back at the source
  shards (inverse of dispatch_to_experts)."""
  return jax.lax.all_to_all(ye, ep_axis, split_axis=1, concat_axis=0,
                            tiled=True)


# ----------------------------------------------------------- drop/grow ----
class EPUpdateResult(NamedTuple):
  packed: jnp.ndarray          # (E, cap, bk, bn), grown slots zeroed
  packing: ExpertPacking       # new stacked packing
  grown: jnp.ndarray           # (E, cap) bool — slots that are NEW
  perm: jnp.ndarray            # (E, cap) within-expert repack gather
  occupancy: jnp.ndarray       # new (E, nk, nn) grids


def expert_drop_grow(packed, pk: ExpertPacking, grow_grids,
                     drop_fraction) -> EPUpdateResult:
  """One RigL drop/grow on expert-stacked packed storage, per expert.

  Args:
    packed: (E, cap, bk, bn) packed weights (global view — run OUTSIDE
      shard_map; update steps are off the hot path).
    pk: stacked ExpertPacking.
    grow_grids: (E, nk, nn) block-pooled |dense grad| scores.
    drop_fraction: traced scalar.
  """
  E = n_experts_of(pk)
  cap = cap_of(pk)
  new_packed, grown_rows, occ_rows, perm_rows = [], [], [], []
  fwd_rows, bwd_rows = [], []
  for e in range(E):
    lpk = local_expert_packing(pk, e)
    out = pt.packed_drop_grow(packed[e], lpk, grow_grids[e],
                              drop_fraction, cap)
    new_packed.append(out.packed)
    grown_rows.append(out.grown)
    occ_rows.append(out.occupancy)
    perm_rows.append(repack_permutation(lpk, out.packing))
    fwd_rows.append(out.packing.fwd)
    bwd_rows.append(out.packing.bwd)
  new_pk = ExpertPacking(
      tuple(jnp.stack([r[i] for r in fwd_rows]) for i in range(4)),
      tuple(jnp.stack([r[i] for r in bwd_rows]) for i in range(4)),
      pk.shape)
  return EPUpdateResult(jnp.stack(new_packed), new_pk,
                        jnp.stack(grown_rows), jnp.stack(perm_rows),
                        jnp.stack(occ_rows))


# ---------------------------------------------------------------- specs ----
def ep_spec_trees(tx, params, packings, opt_state):
  """(params, packings, opt_state) PartitionSpec trees for a
  ('data', 'expert') mesh: expert-stacked kernels (their packing arrays
  and optimizer slots) shard the leading expert axis over 'expert';
  everything else — attention packed kernels included — replicates."""
  import flax.traverse_util as traverse
  import optax
  from jax.sharding import PartitionSpec as P

  flat_p = traverse.flatten_dict(params)
  flat_pk = traverse.flatten_dict(packings)
  expert_paths = {p for p, pk in flat_pk.items() if is_expert_stacked(pk)}
  spec_p = traverse.unflatten_dict({
      p: (P('expert') if p in expert_paths else P()) for p in flat_p})
  flat_spec_pk = {
      p: jax.tree.map(lambda _: P('expert') if p in expert_paths else P(),
                      pk)
      for p, pk in flat_pk.items()}
  spec_pk = traverse.unflatten_dict(flat_spec_pk)
  spec_os = optax.tree_map_params(
      tx, lambda _, s: s, opt_state, spec_p,
      transform_non_params=lambda _: P())
  return spec_p, spec_pk, spec_os, expert_paths

"""Pipeline-parallel packed-transformer training: a GPipe schedule over a
'pipe' mesh axis, composable with data parallelism ('data') and the
column-group tensor parallelism of parallel/packed_tp.py ('model').

The decoder's blocks are split into `n_pipe` contiguous stages; each pipe
device holds one stage's layers (per-layer params/packings stacked on a
leading layer axis and sharded over 'pipe').  The local batch is split
into `n_micro` microbatches which flow through the stage ring: at tick t,
stage s processes microbatch t-s and hands its activation to stage s+1 via
`lax.ppermute` — the whole schedule is ONE `lax.scan`, so jit traces a
single program and XLA overlaps the permute DMA with the next tick's
compute.  The backward pass is `jax.grad` THROUGH the scan: ppermute
transposes to the inverse ring permute, i.e. the reverse pipeline
schedule, with no hand-written backward.

Losses are computed where the activations land: the last stage holds the
real outputs, every other stage's output buffer is zeros; the scalar loss
is psum'd over 'pipe' from a last-stage-masked local loss, which routes
the output cotangent to the last stage only and makes the grads of
replicated (non-stage) params — embedding, final LayerNorm, head — nonzero
exactly on the stages that used them.  Summing those grads over 'pipe'
(`psum`) therefore reconstructs the exact global gradient on every device.

Bubble: the schedule runs n_micro + n_pipe - 1 ticks, so the pipeline
efficiency is n_micro / (n_micro + n_pipe - 1) — the standard GPipe
bubble; raise n_micro to amortize it.

The reference's only parallelism is data-parallel CrossShardOptimizer
(/root/reference/rigl/imagenet_resnet/imagenet_train_eval.py:363-365);
pipeline parallelism has no counterpart there — it exists here because the
packed transformer family (models/packed_transformer.py) is the workload
where layer-stacked sparse storage meets multi-chip scale.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


# ------------------------------------------------------ tree plumbing ----
def tree_index(tree, i):
  """Leafwise tree[i] along the leading (stacked) axis."""
  return jax.tree.map(lambda a: a[i], tree)


def stack_layer_trees(trees):
  """[tree_0, ..., tree_{L-1}] (identical structure/shapes) -> one tree
  whose leaves gained a leading layer axis.  Packing instances stack too
  (registered pytrees; the static grid shape is shared)."""
  return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def split_lm_variables(params, packings, num_layers: int):
  """PackedTransformer variable trees -> (stacked block params, stacked
  block packings, rest params).  Blocks are the per-layer 'block{i}'
  subtrees; rest is everything else (embed / ln_f / head)."""
  blocks_p = stack_layer_trees(
      [params[f'block{i}'] for i in range(num_layers)])
  blocks_pk = stack_layer_trees(
      [packings[f'block{i}'] for i in range(num_layers)])
  rest = {k: v for k, v in params.items() if not k.startswith('block')}
  return blocks_p, blocks_pk, rest


def merge_lm_params(blocks_p, rest, num_layers: int):
  """Inverse of split_lm_variables for the params tree (used to hand the
  pipeline's gradients back to an optimizer built on the flax tree)."""
  out = dict(rest)
  for i in range(num_layers):
    out[f'block{i}'] = tree_index(blocks_p, i)
  return out


def pp_spec_trees(blocks_p, blocks_pk, n_model: int):
  """PartitionSpecs for the stacked block trees: every leaf shards its
  leading layer axis over 'pipe'; TP-stacked packed kernels (and their
  packing arrays), which carry a group axis right after the layer axis,
  shard that over 'model' too."""
  import flax.traverse_util as tv

  kernel_paths = set(tv.flatten_dict(blocks_pk))
  sp = tv.unflatten_dict({
      p: (P('pipe', 'model') if (n_model > 1 and p in kernel_paths)
          else P('pipe'))
      for p in tv.flatten_dict(blocks_p)})
  spk = jax.tree.map(
      lambda _: P('pipe', 'model') if n_model > 1 else P('pipe'), blocks_pk)
  return sp, spk


# --------------------------------------------------------- the schedule ----
def pipeline_blocks(block_apply, blocks_p, blocks_pk, x, n_micro: int,
                    axis_name: str = 'pipe'):
  """Run the stacked layer stack over `x`, pipelined over `axis_name`.

  Args:
    block_apply: (layer_params, layer_packings, h) -> h for ONE block.
    blocks_p / blocks_pk: this device's LOCAL stacked trees (leading axis
      = layers on this stage, i.e. num_layers / n_pipe after sharding).
    x: (B_local, S, D) activations, replicated over `axis_name`.
    n_micro: microbatch count; must divide B_local.

  Returns:
    (B_local, S, D): the full stack's outputs on the LAST stage; zeros on
    every other stage (mask the loss with `lax.axis_index(axis_name) ==
    lax.axis_size(axis_name) - 1` and psum it — see module docstring).
  """
  n_pipe = jax.lax.axis_size(axis_name)
  sid = jax.lax.axis_index(axis_name)
  b = x.shape[0]
  if b % n_micro:
    raise ValueError(f'local batch {b} must divide n_micro={n_micro}')
  mb = b // n_micro
  stream = x.reshape((n_micro, mb) + x.shape[1:])
  n_local = jax.tree.leaves(blocks_p)[0].shape[0]
  perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

  def stage(h):
    for l in range(n_local):
      h = block_apply(tree_index(blocks_p, l), tree_index(blocks_pk, l), h)
    return h

  def tick(carry, t):
    act_in, outs = carry
    # Stage 0 feeds from the microbatch stream; later stages from the ring.
    h = jnp.where(sid == 0, stream[jnp.minimum(t, n_micro - 1)], act_in)
    y = stage(h)
    # The value at the last stage at tick t is microbatch t-(n_pipe-1).
    oidx = jnp.clip(t - (n_pipe - 1), 0, n_micro - 1)
    take = jnp.logical_and(sid == n_pipe - 1, t >= n_pipe - 1)
    outs = outs.at[oidx].set(jnp.where(take, y, outs[oidx]))
    return (jax.lax.ppermute(y, axis_name, perm), outs), None

  carry0 = (jnp.zeros_like(stream[0]), jnp.zeros_like(stream))
  (_, outs), _ = jax.lax.scan(tick, carry0,
                              jnp.arange(n_micro + n_pipe - 1))
  return outs.reshape(x.shape)

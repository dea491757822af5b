"""Causal-LM training loop on PACKED block-sparse transformer storage.

The transformer-family product surface of the packed engine: every
parameter matmul of the model (fused QKV, attention out-proj, both FFN
matmuls) keeps weights, gradients, and optimizer slots as `(n_active, bk,
bn)` packed blocks — O(density) memory end to end — with RigL drop/grow
running on packed storage via transforms/packed_training.py's nested-tree
helper.  Embedding, LayerNorms, and the untied head stay dense (weight
sparsity on the matmuls, as everywhere in this package).

The reference has no transformer family; this extends its
architecture-agnostic RigL/SET semantics (sparse_optimizers_base.py) to
the model class where the packed compute win applies directly
(PERF.md round-2: packed matmul train steps run 2.3-2.9x dense at
s=0.8/0.9 on compute-bound shapes).

Used by drivers/packed_lm.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Tuple

import flax.traverse_util as traverse
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from rigl_tpu.models.packed_moe import (DenseMoETransformer,
                                        PackedMoETransformer)
from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)
from rigl_tpu.ops.pallas.block_sparse_packed import make_packing, unpack_dense
from rigl_tpu.parallel import packed_ep as ep
from rigl_tpu.parallel import packed_tp as tp
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.transforms import packed_training as pt


@dataclasses.dataclass
class PackedLMConfig:
  vocab_size: int = 256                  # byte-level by default
  num_layers: int = 2
  d_model: int = 256
  d_ff: int = 1024
  num_heads: int = 8
  seq_len: int = 128
  sparsity: float = 0.8
  # Per-layer sparsity distribution over the packed matmuls: 'uniform'
  # (every layer at `sparsity` — the historic float path, bit-identical),
  # 'erdos_renyi', or 'erdos_renyi_kernel' (the reference's flagship
  # recipe, sparse_utils.py:258-316 via sparsity/layer_sparsity.py —
  # per-layer static n_active, everything else unchanged).
  sparsity_distribution: str = 'uniform'
  erk_power_scale: float = 1.0
  block: Tuple[int, int] = (16, 16)
  bm: int = 128
  dtype: str = 'float32'                 # 'bfloat16' on TPU
  learning_rate: float = 1e-3
  warmup_steps: int = 50
  train_steps: int = 1000
  batch_size: int = 8
  maskupdate_begin_step: int = 0
  maskupdate_end_step: int = 750
  maskupdate_frequency: int = 100
  drop_fraction: float = 0.3
  drop_fraction_anneal: str = 'cosine'
  seed: int = 0
  # Drop/grow algorithm on packed storage: 'rigl' (grow |dense grad| via
  # the dense twin; gradient step SKIPPED on update iters —
  # sparse_optimizers_base.py:487-521), 'set' (grow uniform random, NO
  # dense backward needed — sparse_optimizers_base.py:260-274), or
  # 'snfs' (grow |EMA of pooled dense grads|, EMA advanced at update
  # steps — sparse_optimizers.py:126-214 at block granularity).  SET and
  # SNFS apply the gradient step AND the mask update on update iters
  # (reference ordering: apply, then cond_mask_update).
  algo: str = 'rigl'
  snfs_momentum: float = 0.9
  # SPMD: n_data data-parallel shards x n_model tensor-parallel column
  # groups over a (data, model) Mesh.  (1, 1) = single-device jit (no
  # shard_map).  n_model>1 stores every packed kernel as n_model balanced
  # column groups (PackedDense tp_shards) whether or not a mesh is live,
  # so the same checkpoint runs sharded or unsharded.
  n_data: int = 1
  n_model: int = 1
  # Pipeline parallelism (parallel/packed_pp.py): n_pipe>1 splits the
  # num_layers blocks into n_pipe stages over a 3-axis
  # ('data','pipe','model') mesh and runs the GPipe microbatch schedule
  # (n_micro microbatches per local batch; 0 = n_pipe).  Composes with
  # n_data and n_model.  State stays the canonical flax tree, so RigL
  # updates / eval / checkpointing are unchanged.
  n_pipe: int = 1
  n_micro: int = 0
  # Sequence (context) parallelism: n_seq>1 shards the sequence axis over
  # a 'seq' mesh axis — every tokenwise op (embed, LN, packed FFN/QKV/out
  # matmuls, head, loss) runs on the local token shard; attention gathers
  # k/v and masks by global position (models/packed_transformer._Attention).
  # Composes with n_data and n_model; not with n_pipe.
  n_seq: int = 1
  # Mixture of Experts: n_experts>0 replaces every block's FFN with a
  # Switch top-1 MoE whose expert kernels are expert-stacked packed
  # storage (models/packed_moe.py).  n_expert>1 shards the expert axis
  # over an 'expert' mesh axis (expert parallelism: tokens shard over
  # (data, expert), one all_to_all each way — parallel/packed_ep.py);
  # requires n_model == n_pipe == n_seq == 1.
  n_experts: int = 0
  capacity_factor: float = 2.0
  aux_loss_weight: float = 0.01
  n_expert: int = 1

  def model_kwargs(self) -> Dict[str, Any]:
    return dict(num_layers=self.num_layers, d_model=self.d_model,
                d_ff=self.d_ff, num_heads=self.num_heads,
                vocab_size=self.vocab_size,
                dtype=jnp.dtype(self.dtype))


def dense_twin_params(params, packings, block):
  """Packed params tree -> DenseTransformer params tree (packed kernels
  unpacked to dense with zeros at inactive blocks; other leaves shared).

  PackedDense stores its kernel at (..., 'kernel'); the dense twin's
  equivalent lives one module deeper at (..., 'd', 'kernel').  TP-stacked
  kernels (tp_shards>1) unpack group-by-group to the same global dense
  view."""
  flat_p = traverse.flatten_dict(params)
  flat_pk = traverse.flatten_dict(packings)
  out = {}
  for path, v in flat_p.items():
    if path in flat_pk:
      pk = flat_pk[path]
      if ep.is_expert_stacked(pk):
        dense = ep.unpack_dense_experts(v, pk, block)
      elif tp.is_stacked(pk):
        dense = tp.unpack_dense_tp(v, pk, block)
      else:
        dense = unpack_dense(v, pk, block)
      out[path[:-1] + ('d', 'kernel')] = dense
    else:
      out[path] = v
  return traverse.unflatten_dict(out)


class PackedLMTrainer:
  """Packed-transformer causal-LM training: init / step / update / eval /
  checkpoint.  All packed shapes are static for the whole run (drop/grow
  preserves n_active), so the jit step recompiles only when a mask update
  changes the packing constants."""

  def __init__(self, cfg: PackedLMConfig):
    if cfg.d_model % cfg.block[0] or cfg.d_model % cfg.block[1] \
        or cfg.d_ff % cfg.block[0] or cfg.d_ff % cfg.block[1]:
      raise ValueError(f'd_model={cfg.d_model} and d_ff={cfg.d_ff} must '
                       f'divide block {cfg.block}')
    if cfg.algo not in ('rigl', 'set', 'snfs'):
      raise ValueError(f'algo must be rigl/set/snfs, got {cfg.algo!r}')
    self.cfg = cfg
    # Per-layer sparsity spec (float for uniform; SparsityMap for ERK) —
    # one spec feeds every model instance (global, sharded, pp blocks,
    # decode twin) via suffix-matched canonical paths.
    from rigl_tpu.models.packed_moe import moe_layer_shapes
    from rigl_tpu.models.packed_transformer import transformer_layer_shapes
    from rigl_tpu.sparsity.layer_sparsity import spec_for_model
    shapes = (moe_layer_shapes(cfg.d_model, cfg.d_ff, cfg.n_experts)
              if cfg.n_experts > 0
              else transformer_layer_shapes(cfg.d_model, cfg.d_ff))
    self.sparsity_spec = spec_for_model(
        shapes, cfg.sparsity_distribution, cfg.sparsity,
        erk_power_scale=cfg.erk_power_scale)
    if cfg.n_experts > 0:
      if cfg.n_model > 1 or cfg.n_pipe > 1 or cfg.n_seq > 1:
        raise ValueError('n_experts>0 composes with n_data/n_expert only')
      if cfg.n_expert > 1 and cfg.n_experts % cfg.n_expert:
        raise ValueError(f'n_experts={cfg.n_experts} must divide '
                         f'n_expert={cfg.n_expert}')
      moe_kwargs = dict(num_experts=cfg.n_experts,
                        capacity_factor=cfg.capacity_factor,
                        **cfg.model_kwargs())
      self.model = PackedMoETransformer(sparsity=self.sparsity_spec,
                                        block=cfg.block, bm=cfg.bm,
                                        **moe_kwargs)
      self.dense_twin = DenseMoETransformer(**moe_kwargs)
    else:
      self.model = PackedTransformer(sparsity=self.sparsity_spec, block=cfg.block,
                                     bm=cfg.bm, tp_shards=cfg.n_model,
                                     **cfg.model_kwargs())
      self.dense_twin = DenseTransformer(**cfg.model_kwargs())
    self.mesh = None
    self.model_sharded = None
    if cfg.n_experts > 0 and (cfg.n_expert > 1 or cfg.n_data > 1):
      n_dev = cfg.n_data * cfg.n_expert
      devs = jax.devices()
      if len(devs) < n_dev:
        raise ValueError(f'need {n_dev} devices for mesh '
                         f'({cfg.n_data} data, {cfg.n_expert} expert); '
                         f'have {len(devs)}')
      # Tokens shard over BOTH axes (P(('data','expert')) on the batch):
      # the all_to_all over 'expert' routes them to their experts.
      if cfg.batch_size % n_dev:
        raise ValueError(f'batch_size={cfg.batch_size} must divide '
                         f'n_data*n_expert={n_dev}')
      self.mesh = Mesh(np.asarray(devs[:n_dev]).reshape(
          cfg.n_data, cfg.n_expert), ('data', 'expert'))
      # token_axes: the aux load-balance statistics pmean over the
      # token-sharding axes so the sharded aux equals the single-device
      # aux bit-for-bit (it is nonlinear in the token distribution).
      self.model_sharded = PackedMoETransformer(
          sparsity=self.sparsity_spec, block=cfg.block, bm=cfg.bm,
          ep_axis='expert', token_axes=('data', 'expert'),
          num_experts=cfg.n_experts,
          capacity_factor=cfg.capacity_factor, **cfg.model_kwargs())
    elif (cfg.n_data > 1 or cfg.n_model > 1 or cfg.n_pipe > 1
          or cfg.n_seq > 1):
      if cfg.batch_size % cfg.n_data:
        raise ValueError(f'batch_size={cfg.batch_size} must divide '
                         f'n_data={cfg.n_data}')
      if cfg.n_pipe > 1 and cfg.n_seq > 1:
        raise ValueError('n_pipe>1 with n_seq>1 is not supported')
      n_dev = cfg.n_data * cfg.n_model * cfg.n_pipe * cfg.n_seq
      devs = jax.devices()
      if len(devs) < n_dev:
        raise ValueError(f'need {n_dev} devices for mesh '
                         f'({cfg.n_data} data, {cfg.n_pipe} pipe, '
                         f'{cfg.n_seq} seq, {cfg.n_model} model); '
                         f'have {len(devs)}')
      if cfg.n_pipe > 1:
        if cfg.num_layers % cfg.n_pipe:
          raise ValueError(f'num_layers={cfg.num_layers} must divide '
                           f'n_pipe={cfg.n_pipe}')
        n_micro = cfg.n_micro or cfg.n_pipe
        if (cfg.batch_size // cfg.n_data) % n_micro:
          raise ValueError(f'local batch {cfg.batch_size // cfg.n_data} '
                           f'must divide n_micro={n_micro}')
        self.mesh = Mesh(np.asarray(devs[:n_dev]).reshape(
            cfg.n_data, cfg.n_pipe, cfg.n_model),
            ('data', 'pipe', 'model'))
      elif cfg.n_seq > 1:
        if cfg.seq_len % cfg.n_seq:
          raise ValueError(f'seq_len={cfg.seq_len} must divide '
                           f'n_seq={cfg.n_seq}')
        self.mesh = Mesh(np.asarray(devs[:n_dev]).reshape(
            cfg.n_data, cfg.n_seq, cfg.n_model), ('data', 'seq', 'model'))
      else:
        self.mesh = Mesh(np.asarray(devs[:n_dev]).reshape(
            cfg.n_data, cfg.n_model), ('data', 'model'))
      # Applied ONLY inside the shard_map'd step: same params/packings
      # trees, but each device computes its own column group + all_gather
      # (and, with n_seq>1, its own token shard + k/v gather).
      self.model_sharded = PackedTransformer(
          sparsity=self.sparsity_spec, block=cfg.block, bm=cfg.bm,
          tp_shards=cfg.n_model,
          tp_axis='model' if cfg.n_model > 1 else None,
          seq_axis='seq' if cfg.n_seq > 1 else None,
          **cfg.model_kwargs())
    sched = optax.linear_schedule(0.0, cfg.learning_rate,
                                  max(cfg.warmup_steps, 1))
    self.tx = optax.adam(sched)
    self.schedule = UpdateSchedule(
        cfg.maskupdate_begin_step, cfg.maskupdate_end_step,
        cfg.maskupdate_frequency, cfg.drop_fraction,
        cfg.drop_fraction_anneal)
    self.last_update_step = self.schedule.initial_last_update_step
    self.params = None
    self.packings = None
    self.opt_state = None
    self.ema_grids = None
    self.step = 0
    self.batches_seen = 0
    self._jit_step = None
    self._jit_update = None
    self._jit_scan = None

  # ------------------------------------------------------------- state ----
  def init_state(self):
    cfg = self.cfg
    dummy = jnp.zeros((1, cfg.seq_len), jnp.int32)
    variables = self.model.init(jax.random.key(cfg.seed), dummy)
    self.params = variables['params']
    self.packings = variables['packing']
    self.opt_state = self.tx.init(self.params)
    self.ema_grids = (pt.init_snfs_ema_grids(self.packings)
                      if cfg.algo == 'snfs' else None)
    self.step = 0
    self.batches_seen = 0
    self.last_update_step = self.schedule.initial_last_update_step
    self._jit_step = None
    self._jit_update = None
    self._jit_scan = None

  # -------------------------------------------------------------- loss ----
  def _loss_with(self, model, params, packings, x, y):
    aux = 0.0
    if self.cfg.n_experts > 0:
      lg, inter = model.apply({'params': params, 'packing': packings}, x,
                              mutable=['intermediates'])
      # Switch load-balance loss: sum of every layer's sown moe_aux.
      aux = sum(jax.tree.leaves(inter['intermediates']))
    else:
      lg = model.apply({'params': params, 'packing': packings}, x)
    lg = lg.astype(jnp.float32)
    b, s = y.shape
    ll = jax.nn.log_softmax(lg)[jnp.arange(b)[:, None],
                                jnp.arange(s)[None, :], y]
    return -jnp.mean(ll) + self.cfg.aux_loss_weight * aux

  def _loss(self, params, packings, x, y):
    return self._loss_with(self.model, params, packings, x, y)

  # -------------------------------------------------------------- steps ----
  def _make_jit_step(self):
    # Packings ride as TRACED args (Packing is a registered pytree whose
    # only static aux is the grid shape), so drop/grow — which changes
    # block coordinates but never array shapes — does NOT recompile the
    # step.  One compile per run, even over the slow remote-TPU tunnel.
    if self.mesh is None:
      @jax.jit
      def step_fn(params, packings, opt_state, x, y):
        loss, g = jax.value_and_grad(
            lambda p: self._loss(p, packings, x, y))(params)
        updates, opt_state = self.tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

      return step_fn
    if self.cfg.n_experts > 0:
      return self._make_ep_step()
    if self.cfg.n_pipe > 1:
      return self._make_pp_step()
    return self._make_sharded_step()

  def _make_pp_step(self):
    """One dp x pp x tp train step: the blocks run the GPipe microbatch
    schedule over 'pipe' (parallel/packed_pp.pipeline_blocks — per-layer
    params/packings stacked and stage-sharded inside the step), each
    block's packed kernels optionally column-group sharded over 'model'
    (the same Megatron f/g pattern as _make_sharded_step), and the batch
    sharded over 'data'.  The loss/grad is the pipelined part; the
    optimizer applies outside shard_map on the canonical flax tree, so
    drop/grow, eval, and checkpointing need no pp-specific code."""
    import flax.linen as nn
    from jax import shard_map

    from rigl_tpu.layers.packed_dense import PackedDense
    from rigl_tpu.models.packed_transformer import _Block
    from rigl_tpu.parallel import packed_pp as pp

    cfg = self.cfg
    L = cfg.num_layers
    n_micro = cfg.n_micro or cfg.n_pipe
    dtype = jnp.dtype(cfg.dtype)
    tp_axis = 'model' if cfg.n_model > 1 else None

    def proj(features, name):
      return PackedDense(features, sparsity=self.sparsity_spec, block=cfg.block,
                         bm=cfg.bm, use_bias=False, dtype=dtype,
                         tp_shards=cfg.n_model, tp_axis=tp_axis, name=name)

    block_mod = _Block(cfg.num_heads, cfg.d_ff, proj, dtype)
    emb_mod = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dtype)
    lnf_mod = nn.LayerNorm(dtype=dtype)
    head_mod = nn.Dense(cfg.vocab_size, use_bias=False, dtype=dtype)

    def block_apply(p, pk, h):
      return block_mod.apply({'params': p, 'packing': pk}, h)

    bp0, bpk0, _ = pp.split_lm_variables(self.params, self.packings, L)
    spec_bp, spec_bpk = pp.pp_spec_trees(bp0, bpk0, cfg.n_model)

    def local_grads(blocks_p, blocks_pk, rest, x, y):
      def loss_fn(blocks_p, rest):
        h = emb_mod.apply({'params': rest['embed']}, x)
        outs = pp.pipeline_blocks(block_apply, blocks_p, blocks_pk, h,
                                  n_micro, 'pipe')
        hf = lnf_mod.apply({'params': rest['ln_f']}, outs)
        lg = head_mod.apply({'params': rest['head']},
                            hf).astype(jnp.float32)
        b, s = y.shape
        ll = jax.nn.log_softmax(lg)[jnp.arange(b)[:, None],
                                    jnp.arange(s)[None, :], y]
        local = -jnp.mean(ll)
        # Real outputs live on the last stage only (zeros elsewhere):
        # return the LOCAL masked loss — do NOT psum inside the
        # differentiated function (psum transposes to psum, so each
        # device's unit seed would reach the last stage n_pipe times and
        # scale every gradient by n_pipe).  Differentiating the local
        # loss seeds ct=1 per device; the ppermute transposes route the
        # last stage's cotangent back through earlier stages, so each
        # device's grad is exactly d(sum of local losses)/d(its inputs).
        sid = jax.lax.axis_index('pipe')
        return jnp.where(sid == jax.lax.axis_size('pipe') - 1, local, 0.0)

      loss, (g_b, g_r) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
          blocks_p, rest)
      # Sum the masked local losses (only the last stage's is nonzero).
      loss = jax.lax.psum(loss, 'pipe')
      # Replicated (non-stage) params contribute on specific stages only
      # (embed on the first, ln_f/head on the last); summing over 'pipe'
      # reconstructs the exact global gradient on every device.
      g_r = jax.lax.psum(g_r, 'pipe')
      loss = jax.lax.pmean(loss, 'data')
      g_b = jax.lax.pmean(g_b, 'data')
      g_r = jax.lax.pmean(g_r, 'data')
      return loss, g_b, g_r

    sharded = shard_map(
        local_grads, mesh=self.mesh,
        in_specs=(spec_bp, spec_bpk, P(), P('data'), P('data')),
        out_specs=(P(), spec_bp, P()), check_vma=False)

    @jax.jit
    def step_fn(params, packings, opt_state, x, y):
      blocks_p, blocks_pk, rest = pp.split_lm_variables(params, packings, L)
      loss, g_b, g_r = sharded(blocks_p, blocks_pk, rest, x, y)
      g = pp.merge_lm_params(g_b, g_r, L)
      updates, opt_state = self.tx.update(g, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    return step_fn

  def _make_sharded_step(self):
    """One SPMD train step over the (data, model) mesh: batch sharded on
    'data' (grads pmean'd), packed kernels column-group sharded on
    'model' (dw/optimizer local; dx psum'd inside PackedDense via
    replicate_for_tp, outputs all-gathered).  Non-kernel grads come out
    replicated over 'model' because every cotangent entering the
    replicated compute passes a psum first — the Megatron f/g pair."""
    from jax import shard_map

    model = self.model_sharded
    n_seq = self.cfg.n_seq
    spec_p, spec_pk, spec_os = tp.mesh_spec_trees(
        self.tx, self.params, self.packings, self.opt_state,
        self.cfg.n_model)
    # With sequence parallelism the batch is sharded (batch, seq): every
    # device holds its data shard's contiguous token slice; the local CE
    # mean over equal-size slices pmean's to the global mean, and the
    # collective transposes (k/v all_gather -> reduce_scatter) route the
    # cross-shard attention cotangents, so pmean over 'seq' of the local
    # grads is the exact global gradient.
    data_spec = P('data', 'seq') if n_seq > 1 else P('data')

    def local_step(params, packings, opt_state, x, y):
      loss, g = jax.value_and_grad(
          lambda p: self._loss_with(model, p, packings, x, y))(params)
      loss = jax.lax.pmean(loss, 'data')
      g = jax.lax.pmean(g, 'data')
      if n_seq > 1:
        loss = jax.lax.pmean(loss, 'seq')
        g = jax.lax.pmean(g, 'seq')
      updates, opt_state = self.tx.update(g, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(shard_map(
        local_step, mesh=self.mesh,
        in_specs=(spec_p, spec_pk, spec_os, data_spec, data_spec),
        out_specs=(spec_p, spec_os, P()), check_vma=False))

  def _make_ep_step(self):
    """One expert-parallel train step over the ('data', 'expert') mesh:
    tokens shard over BOTH axes, expert-stacked kernels (and their
    optimizer slots) shard the expert axis, the MoE layer all_to_all's
    token slabs each way (parallel/packed_ep.py).  Expert dw is complete
    over 'expert' by construction (each device's experts see every row
    token destined for them), so it pmeans over 'data' only; all other
    grads and the loss pmean over both axes."""
    from jax import shard_map

    model = self.model_sharded
    spec_p, spec_pk, spec_os, expert_paths = ep.ep_spec_trees(
        self.tx, self.params, self.packings, self.opt_state)
    data_spec = P(('data', 'expert'))

    def local_step(params, packings, opt_state, x, y):
      loss, g = jax.value_and_grad(
          lambda p: self._loss_with(model, p, packings, x, y))(params)
      loss = jax.lax.pmean(loss, ('data', 'expert'))
      flat_g = traverse.flatten_dict(g)
      flat_g = {
          p: (jax.lax.pmean(v, 'data') if p in expert_paths
              else jax.lax.pmean(v, ('data', 'expert')))
          for p, v in flat_g.items()}
      g = traverse.unflatten_dict(flat_g)
      updates, opt_state = self.tx.update(g, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(shard_map(
        local_step, mesh=self.mesh,
        in_specs=(spec_p, spec_pk, spec_os, data_spec, data_spec),
        out_specs=(spec_p, spec_os, P()), check_vma=False))

  def train_step(self, x, y) -> float:
    if self._jit_step is None:
      self._jit_step = self._make_jit_step()
    self.params, self.opt_state, loss = self._jit_step(
        self.params, self.packings, self.opt_state, x, y)
    return float(loss)

  def is_update_step(self, step: int) -> bool:
    return bool(self.schedule.is_update_iter(step, self.last_update_step))

  def _make_jit_scan(self):
    """K consecutive train steps as ONE lax.scan inside one jit program.

    Removes the per-step host round-trip — the dominant cost over the
    remote-TPU tunnel at small model sizes (CLAUDE.md) — while computing
    bit-identically to K train_step calls: the scan body is the same
    loss/grad/adam update, and the optimizer count (which drives the LR
    warmup schedule) rides in opt_state, so warmup stays exact.  The
    TPU-loop analogue of the reference's iterations_per_loop
    (TPUEstimator; rigl/imagenet_resnet/imagenet_train_eval.py keeps the
    train loop on-device between host callbacks)."""
    @jax.jit
    def scan_fn(params, packings, opt_state, xs, ys):
      def body(carry, batch):
        params, opt_state = carry
        x, y = batch
        loss, g = jax.value_and_grad(
            lambda p: self._loss(p, packings, x, y))(params)
        updates, opt_state = self.tx.update(g, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss
      (params, opt_state), losses = jax.lax.scan(
          body, (params, opt_state), (xs, ys))
      return params, opt_state, losses
    return scan_fn

  def train_chunk(self, xs, ys) -> float:
    """xs/ys: (k, batch, seq) — k gradient steps in one device program.
    Single-device (mesh-None) fast path; counters advance in train()."""
    if self._jit_scan is None:
      self._jit_scan = self._make_jit_scan()
    self.params, self.opt_state, losses = self._jit_scan(
        self.params, self.packings, self.opt_state, xs, ys)
    return float(losses[-1])

  def _dense_twin_grads(self, params, packings, x, y):
    """Dense gradients (inactive blocks included) of the packed kernels via
    the dense twin — the grow-score input for RigL/SNFS.  jit-traceable."""
    dv = dense_twin_params(params, packings, self.cfg.block)

    def dense_loss(dv):
      lg = self.dense_twin.apply({'params': dv}, x).astype(jnp.float32)
      b, s = y.shape
      ll = jax.nn.log_softmax(lg)[jnp.arange(b)[:, None],
                                  jnp.arange(s)[None, :], y]
      return -jnp.mean(ll)

    gd = traverse.flatten_dict(jax.grad(dense_loss)(dv))
    flat_pk = traverse.flatten_dict(packings)
    return {p[:-2] + ('kernel',): v for p, v in gd.items()
            if p[:-2] + ('kernel',) in flat_pk}

  def _make_jit_update(self):
    """The WHOLE drop/grow update as one jitted program (dense-twin grads +
    flax_packed_drop_grow are jit-traceable with static shapes), with
    drop_fraction traced — one compile for the whole run even over the
    remote-TPU tunnel, instead of per-primitive eager dispatch.  The
    program's grow-score stage is algo-specific (cfg.algo); the drop/grow
    machinery (pt.flax_packed_drop_grow) is shared."""
    cfg = self.cfg

    if cfg.algo == 'set':
      @jax.jit
      def set_fn(params, packings, opt_state, key, df):
        grids = pt.flax_set_grow_grids(packings, key)
        out = pt.flax_packed_drop_grow(params, packings, opt_state,
                                       self.tx, grids, df)
        return out.params, out.packings, out.opt_state, out.occupancy

      return set_fn

    if cfg.algo == 'snfs':
      @jax.jit
      def snfs_fn(params, packings, opt_state, ema_grids, x, y, df):
        # Signed pooled grads -> EMA -> |EMA| grow score (the reference's
        # abs-AFTER-EMA ranking, sparse_optimizers.py:126-214; see
        # flax_snfs_inst_grids for the two packed-storage deviations).
        inst = pt.flax_snfs_inst_grids(
            self._dense_twin_grads(params, packings, x, y), packings,
            cfg.block)
        ema = pt.snfs_update_ema_grids(ema_grids, inst, cfg.snfs_momentum)
        out = pt.flax_packed_drop_grow(
            params, packings, opt_state, self.tx,
            {p: jnp.abs(v) for p, v in ema.items()}, df)
        return out.params, out.packings, out.opt_state, out.occupancy, ema

      return snfs_fn

    @jax.jit
    def rigl_fn(params, packings, opt_state, x, y, df):
      out = pt.flax_packed_rigl_update(
          params, packings, opt_state, self.tx,
          self._dense_twin_grads(params, packings, x, y), df, cfg.block)
      return out.params, out.packings, out.opt_state, out.occupancy

    return rigl_fn

  def mask_update(self, x, y):
    """Drop/grow on every packed kernel.  Drop scores are always the packed
    block |w| sums; grow scores are the algorithm's: RigL = block-pooled
    |dense grad| via the dense twin, SET = per-layer uniform random
    (stateless fold_in(seed, step) — identical draws on every replica),
    SNFS = |EMA of pooled dense grads| (EMA advanced here).  Slot
    permutation + grown-slot reset through optax.tree_map_params."""
    if self._jit_update is None:
      self._jit_update = self._make_jit_update()
    cfg = self.cfg
    df = jnp.float32(self.schedule.get_drop_fraction(self.step))
    if cfg.algo == 'set':
      key = jax.random.fold_in(jax.random.key(cfg.seed), self.step)
      self.params, self.packings, self.opt_state, occ = self._jit_update(
          self.params, self.packings, self.opt_state, key, df)
    elif cfg.algo == 'snfs':
      (self.params, self.packings, self.opt_state, occ,
       self.ema_grids) = self._jit_update(
          self.params, self.packings, self.opt_state, self.ema_grids,
          x, y, df)
    else:
      self.params, self.packings, self.opt_state, occ = self._jit_update(
          self.params, self.packings, self.opt_state, x, y, df)
    self.last_update_step = self.step
    # No jit-step reset: packings are traced args, shapes are static.
    return occ

  # --------------------------------------------------------------- eval ----
  def evaluate(self, tokens: np.ndarray, max_windows: int = 64) -> float:
    """Mean next-token cross-entropy (nats/token) over non-overlapping
    seq_len+1 windows of the eval stream."""
    cfg = self.cfg
    w = cfg.seq_len + 1
    n = min(len(tokens) // w, max_windows)
    if n == 0:
      return float('nan')
    params, packings = self.params, self.packings
    if self.mesh is not None:
      # Eval runs the global (tp_axis=None) model outside shard_map:
      # fetch the mesh-sharded state into ordinary single-device arrays.
      params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
      packings = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                              packings)
    wins = np.asarray(tokens[:n * w], np.int32).reshape(n, w)
    total, count = 0.0, 0
    for i in range(0, n, cfg.batch_size):
      chunk = jnp.asarray(wins[i:i + cfg.batch_size])
      x, y = chunk[:, :-1], chunk[:, 1:]
      total += float(self._loss(params, packings, x, y)) * x.shape[0]
      count += int(x.shape[0])
    return total / count

  def generate(self, prompt_tokens, steps: int, *,
               temperature: float = 0.0, top_k: int = 0,
               top_p: float = 1.0, prompt_lens=None, seed: int = 0,
               max_len: int = 0, kv_chunk: int = 0) -> np.ndarray:
    """Autoregressive generation from the current packed weights via the
    serving decode path (rigl_tpu/serve/decode.py: jitted prefill +
    lax.scan, KV cache; the decode twin shares this trainer's params and
    packing trees directly).  prompt_tokens: (P,) or (B, P) ints; returns
    (B, steps) int32.  Single-device.  MoE models decode DROP-FREE
    (capacity = step token count; _MoEFFN.decode) — the standard serving
    policy, and the one under which incremental == full forward."""
    from rigl_tpu.serve import decode_twin, make_generate_fn
    if self.opt_state is None:
      self.init_state()
    prompt = jnp.asarray(prompt_tokens, jnp.int32)
    if prompt.ndim == 1:
      prompt = prompt[None]
    params, packings = self.params, self.packings
    if self.mesh is not None:
      params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
      packings = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                              packings)
    # kv_chunk: chunked cache attention (per-step KV reads scale with the
    # live prefix — worthwhile when max_len over-allocates; see
    # serve/decode.decode_twin).  The cache length rounds UP to the next
    # chunk multiple (the chunking contract needs exact divisibility; the
    # extra tail chunks are skipped by lax.cond, costing nothing).
    L = max_len or (int(prompt.shape[1]) + steps)
    if kv_chunk > 0:
      L = -(-L // kv_chunk) * kv_chunk
    dm = decode_twin(self.model, L, kv_chunk)
    fn = make_generate_fn(dm, steps, temperature, top_k, top_p)
    return np.asarray(fn({'params': params, 'packing': packings}, prompt,
                         jax.random.key(seed),
                         None if prompt_lens is None
                         else jnp.asarray(prompt_lens, jnp.int32)))

  # ---------------------------------------------------------------- loop ----
  def sample_batch(self, tokens: np.ndarray):
    """Seeded random windows; replayable across resume (batches_seen is
    checkpointed, like packed_loop's sampler)."""
    cfg = self.cfg
    rs = np.random.RandomState(
        (cfg.seed * 1000003 + self.batches_seen) % (2 ** 31))
    starts = rs.randint(0, len(tokens) - cfg.seq_len - 1,
                        size=cfg.batch_size)
    self.batches_seen += 1
    wins = np.stack([tokens[s:s + cfg.seq_len + 1] for s in starts]
                    ).astype(np.int32)
    return jnp.asarray(wins[:, :-1]), jnp.asarray(wins[:, 1:])

  def train(self, train_tokens: np.ndarray, eval_tokens=None,
            progress_fn=None, log_every: int = 0,
            steps_per_loop: int = 1,
            eval_windows: int = 64) -> Dict[str, Any]:
    """steps_per_loop > 1 (single-device only): run up to that many
    consecutive gradient steps as one lax.scan program (train_chunk),
    breaking at mask-update iters so drop/grow semantics — and the
    batch stream, sampled host-side one batch at a time — are
    bit-identical to the per-step loop (tested)."""
    cfg = self.cfg
    if self.opt_state is None:
      self.init_state()
    use_scan = steps_per_loop > 1 and self.mesh is None
    n_updates = 0
    loss = float('nan')
    while self.step < cfg.train_steps:
      if cfg.algo == 'rigl' and self.is_update_step(self.step):
        # RigL: the mask update REPLACES the gradient step — it consumes a
        # batch without advancing the step counter (reference skip-apply
        # semantics, sparse_optimizers_base.py:487-521).
        x, y = self.sample_batch(train_tokens)
        self.mask_update(x, y)
        n_updates += 1
        continue
      # Length of the run of plain gradient steps starting here: stop at
      # train_steps, the chunk cap, or the next update iter (predicted
      # exactly — last_update_step cannot change inside the run).  The
      # stop condition serves both orderings: for RigL the next loop
      # iteration fires the replacing update; for SET/SNFS the run's LAST
      # step lands on the update iter and the update fires after it.
      k = 1
      while (use_scan and k < steps_per_loop
             and self.step + k < cfg.train_steps
             and not self.schedule.is_update_iter(self.step + k,
                                                  self.last_update_step)):
        k += 1
      if k == 1:
        x, y = self.sample_batch(train_tokens)
        loss = self.train_step(x, y)
      else:
        batches = [self.sample_batch(train_tokens) for _ in range(k)]
        loss = self.train_chunk(jnp.stack([b[0] for b in batches]),
                                jnp.stack([b[1] for b in batches]))
        x, y = batches[-1]
      crossed = (self.step + k) // log_every - self.step // log_every \
          if log_every else 0
      self.step += k
      if cfg.algo != 'rigl' and self.is_update_step(self.step):
        # SET/SNFS: gradient step applies, THEN the mask update fires on
        # the post-increment step (reference apply-then-cond ordering,
        # sparse_optimizers_base.py:118-146) — no extra batch consumed.
        # SNFS scores grow on the just-applied batch's dense-twin grads.
        self.mask_update(x, y)
        n_updates += 1
      if crossed and progress_fn:
        progress_fn({'step': self.step, 'loss': loss})
    flat_p = traverse.flatten_dict(self.params)
    flat_pk = traverse.flatten_dict(self.packings)
    n_packed = sum(int(np.prod(v.shape)) for p, v in flat_p.items()
                   if p in flat_pk)
    n_dense_equiv = sum(
        int(np.prod(flat_pk[p]['shape']))
        * (tp.n_groups(flat_pk[p]) if tp.is_stacked(flat_pk[p]) else 1)
        * cfg.block[0] * cfg.block[1]
        for p in flat_pk)
    result = {'train_steps': self.step, 'mask_updates': n_updates,
              'batches': self.batches_seen, 'final_loss': loss,
              'sparsity': cfg.sparsity,
              'n_params_packed': n_packed,
              'n_params_dense_equiv': n_dense_equiv}
    if eval_tokens is not None:
      ce = self.evaluate(np.asarray(eval_tokens), max_windows=eval_windows)
      result['eval_ce_nats'] = ce
      result['eval_ppl'] = float(np.exp(min(ce, 30.0)))
    return result

  # ----------------------------------------------------------------- ckpt ----
  def save(self, path: str):
    """Packed params + occupancy grids (packings rebuild deterministically
    from occupancy + static n_active) + optimizer state + counters."""
    os.makedirs(path, exist_ok=True)
    flat = {'step': np.asarray(self.step),
            'last_update': np.asarray(self.last_update_step),
            'batches_seen': np.asarray(self.batches_seen)}
    for p, pk in traverse.flatten_dict(self.packings).items():
      if ep.is_expert_stacked(pk):
        occ = ep.expert_occupancy_grid(pk)        # (E, nk, nn)
      elif tp.is_stacked(pk):
        occ = tp.tp_occupancy_grid(pk)
      else:
        occ = pt.occupancy_grid(pk)
      flat['occ_' + '/'.join(p)] = np.asarray(occ)
    for p, v in traverse.flatten_dict(self.params).items():
      flat['param_' + '/'.join(p)] = np.asarray(v)
    if self.ema_grids is not None:
      for p, v in self.ema_grids.items():
        flat['ema_' + '/'.join(p)] = np.asarray(v)
    leaves, _ = jax.tree.flatten(self.opt_state)
    for i, leaf in enumerate(leaves):
      flat[f'opt_{i}'] = np.asarray(leaf)
    np.savez(os.path.join(path, 'packed_lm_state.npz'), **flat)

  def restore(self, path: str) -> bool:
    f = os.path.join(path, 'packed_lm_state.npz')
    if not os.path.exists(f):
      return False
    if self.opt_state is None:
      self.init_state()
    z = np.load(f)
    self.step = int(z['step'])
    self.last_update_step = int(z['last_update'])
    self.batches_seen = int(z['batches_seen'])
    flat_pk = traverse.flatten_dict(self.packings)
    flat_p = traverse.flatten_dict(self.params)
    new_pk, new_p = {}, {}
    for p in flat_pk:
      occ = jnp.asarray(z['occ_' + '/'.join(p)])
      if ep.is_expert_stacked(flat_pk[p]):
        # (E, nk, nn) occupancy; per-expert cap is the static shard shape.
        new_pk[p] = ep.expert_packing_from_occ(occ, int(flat_p[p].shape[1]))
      elif tp.is_stacked(flat_pk[p]):
        # Stacked layout: per-group cap is the static shard shape.
        new_pk[p] = tp.stacked_packing_from_occ(
            occ, int(flat_p[p].shape[0]), int(flat_p[p].shape[1]))
      else:
        new_pk[p] = make_packing(occ, int(flat_p[p].shape[0]))
    for p in flat_p:
      new_p[p] = jnp.asarray(z['param_' + '/'.join(p)])
    self.packings = traverse.unflatten_dict(new_pk)
    self.params = traverse.unflatten_dict(new_p)
    if self.ema_grids is not None:
      self.ema_grids = {p: jnp.asarray(z['ema_' + '/'.join(p)])
                        for p in self.ema_grids}
    leaves, treedef = jax.tree.flatten(self.opt_state)
    self.opt_state = jax.tree.unflatten(
        treedef, [jnp.asarray(z[f'opt_{i}']) for i in range(len(leaves))])
    self._jit_step = None
    self._jit_update = None
    return True
